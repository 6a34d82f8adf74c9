"""Kite model + NMPF path-following tests.

Parity target: examples/kite_control_test.cpp runs ONE computeControl call on
the simple kinematic kite and prints the result (no convergence assertion);
we assert SOLVED status, bound satisfaction, and warm-start improvement, plus
unit-level checks of the dynamics and path projection.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.control import NMPF
from polympc_tpu.models import kite_dynamics, kite_output, kite_path
from polympc_tpu.utils import status as st


def test_kite_dynamics_shape_and_heading():
    x = jnp.array([np.pi / 4, 0.0, 0.0])
    xd = kite_dynamics(x, jnp.array([2.0]))
    assert xd.shape == (3,)
    assert float(xd[2]) == 2.0  # gamma_dot = u
    # heading reverses the elevation rate (steerability)
    xd_pi = kite_dynamics(jnp.array([np.pi / 4, 0.0, np.pi]), jnp.array([0.0]))
    assert float(xd[0]) * float(xd_pi[0]) < 0


def test_kite_path():
    p = np.asarray(kite_path(jnp.asarray(0.0)))
    np.testing.assert_allclose(p, [np.pi / 6, 0.8], atol=1e-12)


@pytest.fixture(scope="module")
def controller():
    ctrl = NMPF(lambda x, u: kite_dynamics(x, u), kite_output, kite_path,
                nx=3, nu=1, ny=2, tf=2.0)
    ctrl.control_bounds([-5, -10], [5, 10])
    ctrl.state_bounds([0, -np.pi / 2, -np.pi, -100, -100],
                      [np.pi / 2, np.pi / 2, np.pi, 100, 100])
    ctrl.set_reference_velocity(0.05)
    return ctrl


def test_path_projection(controller):
    # the projection must beat a dense grid scan
    point = np.array([0.6, 0.1])
    s = controller.find_closest_point_on_path(point)
    grid = np.linspace(0, 2 * np.pi, 2000)
    d = [np.linalg.norm(np.asarray(kite_path(jnp.asarray(g))) - point)
         for g in grid]
    s_grid = grid[int(np.argmin(d))]
    d_s = np.linalg.norm(np.asarray(kite_path(jnp.asarray(s))) - point)
    assert d_s <= min(d) + 1e-6


def test_nmpf_compute_control(controller):
    # kite_control_test.cpp:50-53: one step from (pi/4, 0, 0)
    u, sol = controller.compute_control(np.array([np.pi / 4, 0.0, 0.0]))
    assert int(sol.status) == st.SOLVED
    assert u.shape == (2,)
    assert -5 - 1e-6 <= u[0] <= 5 + 1e-6
    assert -10 - 1e-6 <= u[1] <= 10 + 1e-6
    X = np.asarray(controller.optimal_trajectory())
    assert X.shape[1] == 5  # augmented state
    # state bounds respected over the horizon
    assert np.all(X[:, 0] >= -1e-6) and np.all(X[:, 0] <= np.pi / 2 + 1e-6)


def test_nmpf_block_bfgs():
    # the kite NMPF with the sparsity-preserving block-BFGS Hessian
    # (continuous_ocp.hpp:2304-2431 analogue) — the benchmark model must
    # converge under quasi-Newton modes too, not just exact Hessians
    from polympc_tpu.nlp import SQPSettings
    from polympc_tpu.qp.types import ADMMSettings
    ctrl = NMPF(lambda x, u: kite_dynamics(x, u), kite_output, kite_path,
                nx=3, nu=1, ny=2, tf=2.0,
                settings=SQPSettings(
                    hessian="block_bfgs", max_iter=100,
                    qp=ADMMSettings(rho=1.0, eps_abs=1e-6, eps_rel=1e-6,
                                    max_epochs=40, equil_iters=4)))
    ctrl.control_bounds([-5, -10], [5, 10])
    ctrl.state_bounds([0, -np.pi / 2, -np.pi, -100, -100],
                      [np.pi / 2, np.pi / 2, np.pi, 100, 100])
    ctrl.set_reference_velocity(0.05)
    u, sol = ctrl.compute_control(np.array([np.pi / 4, 0.0, 0.0]))
    assert int(sol.status) == st.SOLVED
    assert -5 - 1e-6 <= u[0] <= 5 + 1e-6


def test_nmpf_warm_start(controller):
    u1, sol1 = controller.compute_control(np.array([np.pi / 4, 0.0, 0.0]))
    xa = np.asarray(controller.optimal_trajectory())[1]
    u2, sol2 = controller.compute_control(xa)
    assert int(sol2.status) == st.SOLVED
    # warm-started re-solves stay cheap (cold solve takes ~8 iterations)
    assert int(sol2.iters) <= 8
