from polympc_tpu.qp.types import (
    QPData, QPSolution, ADMMSettings, infer_dims,
)
from polympc_tpu.qp.box_admm import (
    box_admm_solve, admm_solve, classify_constraints, rho_vector,
)
from polympc_tpu.qp.ruiz import RuizScaling, ruiz_equilibrate, unscale_solution

__all__ = [
    "QPData", "QPSolution", "ADMMSettings", "infer_dims",
    "box_admm_solve", "admm_solve", "classify_constraints", "rho_vector",
    "RuizScaling", "ruiz_equilibrate", "unscale_solution",
]
