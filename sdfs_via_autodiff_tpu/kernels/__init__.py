from .fused_discrete import make_fused_T_log_ssy, kron_operands_ssy
from .solver_kernel import make_fused_solver_ssy

__all__ = ["make_fused_T_log_ssy", "kron_operands_ssy",
           "make_fused_solver_ssy"]
