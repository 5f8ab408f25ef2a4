from .discrete_ssy import SSYDiscretization, discretize_ssy, T_ssy_factory, dense_H_ssy
from .discrete_gcy import GCYDiscretization, discretize_gcy, T_gcy_factory, dense_H_gcy

__all__ = [
    "SSYDiscretization", "discretize_ssy", "T_ssy_factory", "dense_H_ssy",
    "GCYDiscretization", "discretize_gcy", "T_gcy_factory", "dense_H_gcy",
]
