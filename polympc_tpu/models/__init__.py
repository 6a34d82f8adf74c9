from polympc_tpu.models.mobile_robot import robot_ocp, parking_ocp
from polympc_tpu.models.cstr import (
    cstr_ocp, CSTR_XS, CSTR_US, CSTR_X0, CSTR_ULB, CSTR_UUB,
)
from polympc_tpu.models.kite import (
    kite_dynamics, kite_output, kite_path, kite_ocp,
)

__all__ = ["robot_ocp", "parking_ocp", "cstr_ocp",
           "CSTR_XS", "CSTR_US", "CSTR_X0", "CSTR_ULB", "CSTR_UUB",
           "kite_dynamics", "kite_output", "kite_path", "kite_ocp"]
