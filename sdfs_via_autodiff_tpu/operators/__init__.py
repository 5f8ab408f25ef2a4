from .discrete_ssy import SSYDiscretization, discretize_ssy, T_ssy_factory, dense_H_ssy
from .discrete_gcy import GCYDiscretization, discretize_gcy, T_gcy_factory, dense_H_gcy
from .continuous_ssy import next_state_ssy, T_ssy_continuous_factory
from .continuous_gcy import next_state_gcy, T_gcy_continuous_factory
from .continuous_common import hat_basis, expectation_matrix, make_gather_T

__all__ = [
    "SSYDiscretization", "discretize_ssy", "T_ssy_factory", "dense_H_ssy",
    "GCYDiscretization", "discretize_gcy", "T_gcy_factory", "dense_H_gcy",
    "next_state_ssy", "T_ssy_continuous_factory",
    "next_state_gcy", "T_gcy_continuous_factory",
    "hat_basis", "expectation_matrix", "make_gather_T",
]

from .post_interp import (make_node_chain_T_ssy, node_basis_ssy,
                          ssy_quadrature_nodes)
__all__ += ["make_node_chain_T_ssy", "node_basis_ssy",
            "ssy_quadrature_nodes"]

from .degroot import (T_degroot_factory, T_degroot_continuous_factory,
                      existence_check_degroot)
__all__ += ["T_degroot_factory", "T_degroot_continuous_factory",
            "existence_check_degroot"]
