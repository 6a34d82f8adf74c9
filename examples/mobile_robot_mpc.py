"""Mobile-robot tracking MPC (the reference's flagship example,
examples/mobile_robot.cpp + tests/control/mpc_wrapper_test.cpp:47-79).

Kinematic car (NX=3: x, y, heading; NU=2: speed, steering; wheelbase d as a
static parameter), quadratic tracking cost, horizon [0, 2] s, Chebyshev
order 5 x 2 segments. Demonstrates: bounds/IC management, warm-started
re-solve, and Lagrange solution interpolation at arbitrary t.

Run:  python examples/mobile_robot_mpc.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# fp64 examples run on CPU by default (TPU fp64 linear algebra is
# unsupported); set POLYMPC_EXAMPLES_PLATFORM=tpu to target the chip
jax.config.update("jax_platforms",
                  os.environ.get("POLYMPC_EXAMPLES_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import numpy as np

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.control import MPC
from polympc_tpu.models import robot_ocp
from polympc_tpu.utils import status as st, Timer


def main():
    mpc = MPC(robot_ocp(), SegmentedBasis(Chebyshev(5), 2), t0=0.0, tf=2.0)
    mpc.set_static_parameters([2.0])              # wheelbase d = 2 m
    mpc.control_bounds([-1.5, -0.75], [1.5, 0.75])
    mpc.initial_conditions([0.5, 0.5, 0.5])
    mpc.x_guess([0.5, 0.5, 0.5])

    with Timer() as t_cold:
        sol = t_cold.block_on(mpc.solve())
    print(f"cold solve : {st.status_name(int(sol.status))} "
          f"in {int(sol.iters)} SQP iters ({t_cold.elapsed * 1e3:.1f} ms, "
          f"includes compile)")

    # warm-started re-solve from a perturbed measurement — the real-time
    # MPC pattern (cstr_control_test.cpp:167-177)
    mpc.initial_conditions([0.52, 0.48, 0.5])
    with Timer() as t_warm:
        sol = t_warm.block_on(mpc.solve())
    print(f"warm solve : {st.status_name(int(sol.status))} "
          f"in {int(sol.iters)} SQP iters ({t_warm.elapsed * 1e3:.1f} ms)")

    X = np.asarray(mpc.solution_x())
    U = np.asarray(mpc.solution_u())
    print(f"x(t0) = {X[0].round(4)},  x(tf) = {X[-1].round(4)}")
    print(f"u(t0) = {U[0].round(4)}")
    # interpolated sample between collocation nodes (mpc_wrapper.hpp:245-281)
    print(f"x(0.3s) = {np.asarray(mpc.solution_x_at(0.3)).round(4)}")


if __name__ == "__main__":
    main()
