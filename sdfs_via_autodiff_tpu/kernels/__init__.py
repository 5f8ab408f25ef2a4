from .fused_discrete import (make_fused_T_log_ssy, kron_operands_ssy,
                             kron_operands_ssy_continuous,
                             make_fused_T_from_operands,
                             make_fused_T_log_ssy_continuous)
from .solver_kernel import make_fused_solver_ssy

__all__ = ["make_fused_T_log_ssy", "kron_operands_ssy",
           "kron_operands_ssy_continuous", "make_fused_T_from_operands",
           "make_fused_T_log_ssy_continuous", "make_fused_solver_ssy",
           "make_fused_solver_from_operands"]
