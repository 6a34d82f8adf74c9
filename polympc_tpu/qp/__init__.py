from polympc_tpu.qp.types import (
    QPData, QPSolution, ADMMSettings, infer_dims,
)
from polympc_tpu.qp.box_admm import (
    box_admm_solve, admm_solve, classify_constraints, rho_vector,
)
from polympc_tpu.qp.ip import IPSettings, qp_ip_solve
from polympc_tpu.qp.ruiz import RuizScaling, ruiz_equilibrate, unscale_solution
from polympc_tpu.qp.active_set import qp_active_set_solve

__all__ = [
    "QPData", "QPSolution", "ADMMSettings", "infer_dims",
    "box_admm_solve", "admm_solve", "classify_constraints", "rho_vector",
    "IPSettings", "qp_ip_solve",
    "RuizScaling", "ruiz_equilibrate", "unscale_solution",
    "qp_active_set_solve",
]
