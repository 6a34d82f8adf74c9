"""Kite path-following NMPF (reference examples/kite.cpp +
examples/kite_control_test.cpp, src/nmpf.hpp).

Kinematic kite on a sphere (NX=3) follows a lemniscate-like figure
theta_p(s) = pi/6 + 0.2 sin(2s), phi_p(s) = 0.8 cos(s). The controller
augments the state with a virtual path state (s, s_dot), projects the
current output onto the path to initialise s, and tracks a reference
path velocity.

The reference example runs a single computeControl call and prints the
result (kite_control_test.cpp:50-53, no closed-loop assertion); this does
the same, asserts the *planned* trajectory approaches the path over the
horizon, then shows a short receding-horizon rollout for illustration.

Run:  python examples/kite_nmpf.py
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

import jax.numpy as jnp
import numpy as np

from polympc_tpu.control import NMPF
from polympc_tpu.models import kite_dynamics, kite_output, kite_path
from polympc_tpu.nlp import SQPSettings
from polympc_tpu.ocp import rk4_integrate
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st


def path_error(xa):
    y = np.asarray(kite_output(jnp.asarray(xa[:3])))
    p = np.asarray(kite_path(jnp.asarray(xa[3])))
    return float(np.linalg.norm(y - p))


def main():
    # heavier output-tracking weight Q than the identity default — with
    # Q = R = I the optimal policy barely steers
    ctrl = NMPF(lambda x, u: kite_dynamics(x, u), kite_output, kite_path,
                nx=3, nu=1, ny=2, tf=2.0,
                Q=np.diag([50.0, 50.0]), R=np.diag([0.1, 0.1]), W=5.0,
                settings=SQPSettings(
                    hessian="exact", max_iter=150,
                    qp=ADMMSettings(rho=1.0, eps_abs=1e-6, eps_rel=1e-6,
                                    max_epochs=60, equil_iters=4)))
    ctrl.set_reference_velocity(0.05)
    ctrl.control_bounds([-5.0, -10.0], [5.0, 10.0])
    ctrl.state_bounds([0.0, -np.pi / 2, -np.pi, -100.0, -100.0],
                      [np.pi / 2, np.pi / 2, np.pi, 100.0, 100.0])

    # one computeControl call, as the reference example does
    x0 = np.array([np.pi / 4, 0.0, 0.0])     # (theta, phi, gamma)
    u_aug, sol = ctrl.compute_control(x0)
    print(f"compute_control: {st.status_name(int(sol.status))} "
          f"in {int(sol.iters)} SQP iters, u = {u_aug.round(3)}")
    assert int(sol.status) == st.SOLVED

    X = np.asarray(ctrl.optimal_trajectory())
    errs = [path_error(xa) for xa in X]
    print("planned path error over the horizon:",
          np.array(errs).round(3))
    # the plan approaches the path by the end of the horizon
    assert errs[-1] < 0.5 * errs[0], "plan must approach the path"

    # short receding-horizon rollout (illustration — the reference asserts
    # nothing about closed-loop behaviour either)
    x = x0
    for k in range(6):
        u_aug, sol = ctrl.compute_control(x)
        u = u_aug[:1]
        traj = rk4_integrate(
            lambda xx, uu, tt: kite_dynamics(xx, jnp.asarray(u)),
            jnp.asarray(x), 0.0, 0.1, 8)
        x = np.asarray(traj[-1])
        y = np.asarray(kite_output(jnp.asarray(x)))
        s = ctrl.find_closest_point_on_path(y)
        err = float(np.linalg.norm(y - np.asarray(kite_path(jnp.asarray(s)))))
        print(f"rollout step {k}: {st.status_name(int(sol.status)):18s} "
              f"u = {u[0]:+.3f}  path error = {err:.3f}")
    print("kite NMPF example done")


if __name__ == "__main__":
    main()
