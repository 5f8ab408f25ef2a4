from .rouwenhorst import rouwenhorst, rouwenhorst_P, rouwenhorst_ladder, stationary_distribution
from .tauchen import tauchen, tauchen_P, tauchen_ladder
from .quadrature import gauss_hermite_normal, tensor_quadrature_normal
from .grids import build_grid_ssy, build_grid_gcy, flatten_mesh
from .interp import lin_interp, multilinear_interp, uniform_grid_coords

__all__ = [
    "rouwenhorst", "rouwenhorst_P", "rouwenhorst_ladder", "stationary_distribution",
    "tauchen", "tauchen_P", "tauchen_ladder",
    "gauss_hermite_normal", "tensor_quadrature_normal",
    "build_grid_ssy", "build_grid_gcy", "flatten_mesh",
    "lin_interp", "multilinear_interp", "uniform_grid_coords",
]
