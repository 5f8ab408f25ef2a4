from .fused_discrete import (make_fused_T_log_ssy, kron_operands_ssy,
                             kron_operands_ssy_continuous,
                             make_fused_T_from_operands,
                             make_fused_T_log_ssy_continuous,
                             kron_operands_gcy, make_fused_T_log_gcy,
                             make_xla_T_from_operands)
from .solver_kernel import (make_fused_solver_ssy,
                            make_fused_solver_from_operands,
                            make_fused_solver_ssy_continuous,
                            make_fused_solver_gcy)

__all__ = ["make_fused_T_log_ssy", "kron_operands_ssy",
           "kron_operands_ssy_continuous", "make_fused_T_from_operands",
           "make_fused_T_log_ssy_continuous", "make_fused_solver_ssy",
           "make_fused_solver_from_operands", "make_fused_solver_ssy_continuous",
           "kron_operands_gcy", "make_fused_T_log_gcy",
           "make_fused_solver_gcy", "make_xla_T_from_operands"]
from .anderson_kernel import (make_fused_anderson_from_operands,
                              make_fused_anderson_ssy,
                              make_fused_anderson_ssy_continuous)
__all__ += ["make_fused_anderson_from_operands", "make_fused_anderson_ssy",
            "make_fused_anderson_ssy_continuous"]
from .tiled_two_phase import (make_tiled_T_log, make_tiled_T_log_gcy,
                              make_tiled_T_log_ssy,
                              make_tiled_T_log_ssy_continuous)
__all__ += ["make_tiled_T_log", "make_tiled_T_log_ssy",
            "make_tiled_T_log_ssy_continuous", "make_tiled_T_log_gcy"]
from .fused_discrete import (kron_operands_gcy_continuous,
                             make_fused_T_log_gcy_continuous)
from .solver_kernel import make_fused_solver_gcy_continuous
from .anderson_kernel import make_fused_anderson_gcy_continuous
__all__ += ["kron_operands_gcy_continuous", "make_fused_T_log_gcy_continuous",
            "make_fused_solver_gcy_continuous",
            "make_fused_anderson_gcy_continuous"]
from .post_interp_kernel import make_post_interp_kernel_T_ssy
__all__ += ["make_post_interp_kernel_T_ssy"]
