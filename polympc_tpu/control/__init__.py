from polympc_tpu.control.lqr import lyapunov, care, lqr, pinv
from polympc_tpu.control.mpc import MPC
from polympc_tpu.control.nmpf import NMPF, augment_ocp

__all__ = ["lyapunov", "care", "lqr", "pinv", "MPC", "NMPF", "augment_ocp"]
