"""Closed-loop CSTR setpoint stabilisation (reference
tests/control/cstr_control_test.cpp:137-183, Klatt-Engell model).

NMPC drives the reactor from x0 = (1.0, 0.5, 100, 100) toward the setpoint
xs = (2.1402, 1.0903, 114.19, 112.91) over repeated solve -> apply ->
integrate steps (RK4 plant). The temperature states have time constants of
several hundred seconds, so over this 120 s run the fast concentration c_A
reaches its setpoint while the temperatures make steady progress — the same
behaviour the reference test exhibits (it asserts the optimal cost 12262.6
over the 100 s horizon, not setpoint attainment).

Run:  python examples/cstr_nmpc.py
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

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.control import MPC
from polympc_tpu.models import (
    cstr_ocp, CSTR_XS, CSTR_US, CSTR_X0, CSTR_ULB, CSTR_UUB,
)
from polympc_tpu.nlp import SQPSettings
from polympc_tpu.ocp import rk4_integrate
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st


def main():
    ocp = cstr_ocp()
    # configuration from cstr_control_test.cpp:137-183 (and
    # tests/test_control.py): state bounds keep the Arrhenius terms finite
    # during the line search; the control guess is the setpoint input us
    mpc = MPC(ocp, SegmentedBasis(Chebyshev(5), 2), t0=0.0, tf=100.0,
              settings=SQPSettings(
                  hessian="exact", max_iter=100,
                  qp=ADMMSettings(rho=1.0, eps_abs=1e-5, eps_rel=1e-5,
                                  max_epochs=40, equil_iters=4)),
              x_scale=[2.0, 1.0, 100.0, 100.0], u_scale=[15.0, 2000.0])
    mpc.control_bounds(CSTR_ULB, CSTR_UUB)
    mpc.state_bounds([0.0, 0.0, 50.0, 50.0], [6.0, 4.0, 150.0, 150.0])

    x = np.asarray(CSTR_X0, np.float64)
    prev_err = np.linalg.norm(x - np.asarray(CSTR_XS))
    dt_ctrl = 10.0         # control interval [s]
    for k in range(12):
        mpc.initial_conditions(x)
        if k == 0:
            mpc.x_guess(x)
            mpc.u_guess(CSTR_US)
        sol = mpc.solve()
        assert int(sol.status) == st.SOLVED, st.status_name(int(sol.status))
        u = np.asarray(mpc.solution_u())[0]
        # plant step: integrate the true dynamics under the applied control
        traj = rk4_integrate(
            lambda xx, uu, tt: ocp.dynamics(xx, jnp.asarray(u), None,
                                            jnp.zeros(0), tt),
            jnp.asarray(x), 0.0, dt_ctrl, 20)
        x = np.asarray(traj[-1])
        err = np.linalg.norm(x - np.asarray(CSTR_XS))
        print(f"t={k * dt_ctrl:5.1f}s  iters={int(sol.iters):2d} "
              f" u=({u[0]:7.2f}, {u[1]:9.2f})  |x - xs| = {err:.4f}")
        assert err < prev_err, "closed-loop error must decrease every step"
        prev_err = err

    # the fast state (concentration c_A) covers most of the distance to its
    # setpoint; the slow temperatures keep converging beyond this run
    print(f"final x = {x.round(3)}")
    assert x[0] > 0.5 * (float(CSTR_X0[0]) + float(CSTR_XS[0]))
    print("closed-loop CSTR: c_A well past halfway, temperatures converging")


if __name__ == "__main__":
    main()
