from polympc_tpu.models.mobile_robot import robot_ocp, parking_ocp

__all__ = ["robot_ocp", "parking_ocp"]
