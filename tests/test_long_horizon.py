"""Long-horizon partitioned OCP tests: sharded Newton vs single-chip oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import Chebyshev
from polympc_tpu.ocp.ocp import OCP
from polympc_tpu.parallel.horizon import horizon_mesh
from polympc_tpu.parallel.long_horizon import (
    LongHorizon, long_horizon_newton_step, solve_long_horizon,
)


def _lqr_ocp():
    # linear dynamics + quadratic cost: Newton converges in ~1 step, and the
    # solution is checkable against the unpartitioned dense KKT
    A = jnp.array([[0.0, 1.0], [-1.0, -0.5]])
    B = jnp.array([[0.0], [1.0]])

    def dyn(x, u, p, d, t):
        return A @ x + B @ u

    def lag(x, u, p, d, t):
        return x @ x + 0.1 * (u @ u)

    return OCP(nx=2, nu=1, dynamics=dyn, lagrange=lag)


def _pend_ocp():
    def dyn(x, u, p, d, t):
        return jnp.array([x[1], -jnp.sin(x[0]) - 0.2 * x[1] + u[0]])

    def lag(x, u, p, d, t):
        return x @ x + 0.1 * (u @ u)

    return OCP(nx=2, nu=1, dynamics=dyn, lagrange=lag)


def test_long_horizon_linear_converges():
    lh = LongHorizon(_lqr_ocp(), Chebyshev(4), S=4, t0=0.0, tf=4.0)
    Z, LAM, hist = solve_long_horizon(lh, x0=[1.0, 0.0], iters=6)
    assert hist[-1]["defect"] < 1e-7, hist
    assert hist[-1]["continuity"] < 1e-6, hist
    # head state pinned to x0
    X, _ = lh.split(Z)
    np.testing.assert_allclose(np.asarray(X[0, 0]), [1.0, 0.0], atol=1e-4)


def test_long_horizon_nonlinear_converges():
    lh = LongHorizon(_pend_ocp(), Chebyshev(4), S=8, t0=0.0, tf=4.0)
    Z, LAM, hist = solve_long_horizon(lh, x0=[2.0, 0.0], iters=12)
    assert hist[-1]["defect"] < 1e-6, hist[-3:]
    assert hist[-1]["continuity"] < 1e-5, hist[-3:]


def test_long_horizon_sharded_matches_local():
    lh = LongHorizon(_pend_ocp(), Chebyshev(4), S=8, t0=0.0, tf=4.0)
    x0 = jnp.array([1.5, 0.0])
    Z = lh.initial_guess(x0)
    LAM = jnp.zeros((lh.S, lh.ne))
    mesh = horizon_mesh(8)
    Z_l, L_l, c_l = long_horizon_newton_step(lh, Z, LAM, x0)
    Z_s, L_s, c_s = jax.jit(
        lambda Z, LAM: long_horizon_newton_step(lh, Z, LAM, x0, mesh=mesh)
    )(Z, LAM)
    np.testing.assert_allclose(np.asarray(Z_s), np.asarray(Z_l), atol=1e-7)
    np.testing.assert_allclose(np.asarray(L_s), np.asarray(L_l), atol=1e-6)


def test_long_horizon_matches_trajectory_oracle():
    # defect-free solution must integrate the dynamics: compare the state
    # trajectory against scipy's ODE solve under the recovered control
    from scipy.integrate import solve_ivp
    lh = LongHorizon(_pend_ocp(), Chebyshev(5), S=4, t0=0.0, tf=2.0)
    Z, _, hist = solve_long_horizon(lh, x0=[1.0, 0.0], iters=12)
    assert hist[-1]["defect"] < 1e-7
    X, U = lh.split(Z)
    # interpolate the control with the segment's Lagrange basis (the true
    # collocation polynomial), not linearly
    times = np.asarray(lh.times)
    Unp = np.asarray(U)

    def u_of_t(t):
        s = min(int((t - lh.t0) / ((lh.tf - lh.t0) / lh.S)), lh.S - 1)
        t0s, tfs = times[s, 0], times[s, -1]
        tau = 2.0 * (t - t0s) / (tfs - t0s) - 1.0
        P = lh.basis.interp_matrix([np.clip(tau, -1.0, 1.0)])
        return float((P @ Unp[s, :, 0]).item())

    def dyn(t, x):
        return [x[1], -np.sin(x[0]) - 0.2 * x[1] + u_of_t(t)]

    sol = solve_ivp(dyn, [0.0, 2.0], np.asarray(X[0, 0]), rtol=1e-9,
                    atol=1e-11, dense_output=True)
    xf_oracle = sol.y[:, -1]
    np.testing.assert_allclose(np.asarray(X[-1, -1]), xf_oracle, atol=5e-3)
