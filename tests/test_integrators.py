"""Integrator tests: RK4 / implicit trapezoidal / pseudospectral ODE solve.

Oracles: closed-form linear/exponential solutions and the stiff CSTR model
(the reference integrates with RK4 and CVODES, integrator.cpp:68-111).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.ocp import rk4_integrate, implicit_integrate, ps_integrate


def test_rk4_exponential():
    f = lambda x, u, t: -x
    traj = rk4_integrate(f, jnp.array([1.0]), 0.0, 2.0, 50)
    np.testing.assert_allclose(float(traj[-1, 0]), np.exp(-2.0), rtol=1e-7)


def test_rk4_controlled():
    f = lambda x, u, t: u
    U = jnp.ones((20, 1)) * 0.5
    traj = rk4_integrate(f, jnp.array([0.0]), 0.0, 2.0, 20, u=U)
    np.testing.assert_allclose(float(traj[-1, 0]), 1.0, rtol=1e-12)


def test_implicit_stiff():
    # stiff linear system: lambda = -1000; explicit RK4 with h=0.01 diverges,
    # trapezoidal stays stable and accurate
    lam = -1000.0
    f = lambda x, u, t: lam * x
    traj = implicit_integrate(f, jnp.array([1.0]), 0.0, 0.1, 10)
    # trapezoidal amplification |(1+lh/2)/(1-lh/2)| = 2/3 per step: bounded
    # decay (A-stable; not L-stable so not e^-100)
    np.testing.assert_allclose(float(jnp.abs(traj[-1, 0])), (2 / 3) ** 10,
                               rtol=1e-6)
    exp_rk4 = rk4_integrate(f, jnp.array([1.0]), 0.0, 0.1, 10)
    assert not np.isfinite(float(exp_rk4[-1, 0])) or \
        abs(float(exp_rk4[-1, 0])) > 1.0  # RK4 unstable at this step size


def test_implicit_matches_rk4_nonstiff():
    f = lambda x, u, t: jnp.array([x[1], -x[0]])  # harmonic oscillator
    x0 = jnp.array([1.0, 0.0])
    a = rk4_integrate(f, x0, 0.0, 3.0, 300)
    b = implicit_integrate(f, x0, 0.0, 3.0, 300)
    np.testing.assert_allclose(np.asarray(a[-1]), np.asarray(b[-1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a[-1]),
                               [np.cos(3.0), -np.sin(3.0)], atol=1e-5)


def test_ps_integrate_linear():
    # x' = -x: spectral accuracy on a modest grid
    f = lambda x, u, t: -x
    mesh = SegmentedBasis(Chebyshev(8), 2)
    X, t = ps_integrate(f, jnp.array([1.0]), 0.0, 2.0, mesh)
    np.testing.assert_allclose(np.asarray(X[:, 0]), np.exp(-np.asarray(t)),
                               atol=1e-8)


def test_ps_integrate_nonlinear():
    # logistic x' = x(1-x), x(0)=0.1: closed form
    f = lambda x, u, t: x * (1 - x)
    mesh = SegmentedBasis(Chebyshev(10), 3)
    X, t = ps_integrate(f, jnp.array([0.1]), 0.0, 4.0, mesh)
    tt = np.asarray(t)
    exact = 1.0 / (1.0 + 9.0 * np.exp(-tt))
    np.testing.assert_allclose(np.asarray(X[:, 0]), exact, atol=1e-7)


def test_integrators_differentiable():
    f = lambda x, u, t: -x * u[0]
    g = jax.grad(lambda k: rk4_integrate(
        f, jnp.array([1.0]), 0.0, 1.0, 20, u=jnp.array([k]))[-1, 0])(1.0)
    np.testing.assert_allclose(float(g), -np.exp(-1.0), rtol=1e-6)


# ---- adaptive TR-BDF2 (the CVODES analogue: error-controlled stiff) ----

def test_adaptive_exponential_accuracy():
    from polympc_tpu.ocp import adaptive_integrate
    f = lambda x, u, t: -x
    x, (n_acc, n_rej, ok) = adaptive_integrate(
        f, jnp.array([1.0]), 0.0, 2.0, rtol=1e-8, atol=1e-12)
    assert bool(ok)
    # global error of a 2nd-order method ~ tol^(2/3): ~2.6e-6 measured
    np.testing.assert_allclose(float(x[0]), np.exp(-2.0), rtol=1e-5)


def test_adaptive_save_grid_matches_closed_form():
    from polympc_tpu.ocp import adaptive_integrate
    # harmonic oscillator: x'' = -x
    f = lambda x, u, t: jnp.array([x[1], -x[0]])
    ts = np.linspace(0.5, 6.0, 7)
    xs, (_, _, ok) = adaptive_integrate(
        f, jnp.array([1.0, 0.0]), 0.0, 6.0, rtol=1e-8, atol=1e-10, ts=ts)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(xs[:, 0]), np.cos(ts), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xs[:, 1]), -np.sin(ts), atol=1e-5)


def test_adaptive_stiff_van_der_pol_vs_scipy():
    from scipy.integrate import solve_ivp
    from polympc_tpu.ocp import adaptive_integrate
    mu = 100.0  # stiff

    f = lambda x, u, t: jnp.array([x[1], mu * ((1 - x[0] ** 2) * x[1]) - x[0]])
    x, (n_acc, n_rej, ok) = adaptive_integrate(
        f, jnp.array([2.0, 0.0]), 0.0, 100.0, rtol=1e-7, atol=1e-9,
        max_steps=50_000)
    assert bool(ok)
    sol = solve_ivp(lambda t, y: [y[1], mu * ((1 - y[0] ** 2) * y[1]) - y[0]],
                    (0.0, 100.0), [2.0, 0.0], method="Radau",
                    rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x), sol.y[:, -1], atol=2e-4)


def test_adaptive_step_control_is_adaptive():
    from polympc_tpu.ocp import adaptive_integrate
    # fast transient then slow decay: adaptive must use far fewer steps than
    # the transient scale would demand globally
    A = np.diag([-1000.0, -0.1])
    f = lambda x, u, t: jnp.asarray(A, x.dtype) @ x
    x, (n_acc, n_rej, ok) = adaptive_integrate(
        f, jnp.array([1.0, 1.0]), 0.0, 50.0, rtol=1e-6, atol=1e-9)
    assert bool(ok)
    np.testing.assert_allclose(float(x[1]), np.exp(-0.1 * 50.0), rtol=1e-3)
    # fixed-step at the transient resolution would need >> 50000 steps
    assert int(n_acc) < 500, int(n_acc)


def test_adaptive_reports_failure_on_step_exhaustion():
    from polympc_tpu.ocp import adaptive_integrate
    f = lambda x, u, t: -x
    _, (_, _, ok) = adaptive_integrate(
        f, jnp.array([1.0]), 0.0, 1e6, rtol=1e-10, atol=1e-14, max_steps=5)
    assert not bool(ok)
