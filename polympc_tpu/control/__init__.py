from polympc_tpu.control.lqr import lyapunov, care, lqr, pinv
from polympc_tpu.control.mpc import MPC

__all__ = ["lyapunov", "care", "lqr", "pinv", "MPC"]
