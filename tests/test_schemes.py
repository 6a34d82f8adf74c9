"""GAUSS / GAUSS_RADAU collocation schemes and polynomial utilities.

The reference enumerates three schemes (polynomial_math.hpp:25) but only
implements GAUSS_LOBATTO; here all three exist.  Oracles: quadrature
exactness degrees (LG: 2N+1, LGR: 2N, closed forms), spectral
differentiation exactness, the L-stability of Radau IIA on a stiff linear
ODE, and a stiff OCP where the Radau mesh beats the Lobatto mesh of the
same order/segments against a fine-mesh oracle.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import (
    Legendre, LegendreGauss, LegendreRadau, SegmentedBasis,
)
from polympc_tpu.basis.nodes import lg_nodes, lgr_nodes, poly_mul, poly_diff
from polympc_tpu.ocp import (
    OCP, transcribe, ocp_bounds, radau_integrate, implicit_integrate,
)
from polympc_tpu.nlp import SQPSettings, sqp_solve
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st


def _monomial_exact(k):
    return (1.0 - (-1.0) ** (k + 1)) / (k + 1)


@pytest.mark.parametrize("order", [2, 5, 8])
def test_gauss_quadrature_exactness(order):
    x, w = lg_nodes(order)
    assert len(x) == order + 1
    assert np.all((x > -1.0) & (x < 1.0))      # strictly interior
    for k in range(2 * order + 2):             # exact to degree 2N+1
        np.testing.assert_allclose(np.sum(w * x ** k), _monomial_exact(k),
                                   atol=1e-12)


@pytest.mark.parametrize("order", [2, 5, 8])
@pytest.mark.parametrize("flip", [False, True])
def test_radau_quadrature_exactness(order, flip):
    x, w = lgr_nodes(order, flip=flip)
    assert len(x) == order + 1
    if flip:
        assert np.isclose(x[-1], 1.0) and x[0] > -1.0
    else:
        assert np.isclose(x[0], -1.0) and x[-1] < 1.0
    for k in range(2 * order + 1):             # exact to degree 2N
        np.testing.assert_allclose(np.sum(w * x ** k), _monomial_exact(k),
                                   atol=1e-12)


@pytest.mark.parametrize("factory", [LegendreGauss, LegendreRadau])
def test_diff_matrix_exact_on_polynomials(factory):
    b = factory(6)
    c = np.random.default_rng(0).normal(size=7)    # degree-6 polynomial
    v = np.polyval(c, b.nodes)
    dv = np.polyval(np.polyder(c), b.nodes)
    np.testing.assert_allclose(b.D @ v, dv, atol=1e-9)


def test_poly_mul_diff():
    # (1 + 2x)(3 + x + x^2) = 3 + 7x + 3x^2 + 2x^3, truncated to 4 coeffs
    np.testing.assert_allclose(
        poly_mul(np.array([1.0, 2.0, 0.0, 0.0]),
                 np.array([3.0, 1.0, 1.0, 0.0])), [3, 7, 3, 2])
    # truncation drops the x^4 term: (x^2 + 1)(x^2 + 1) -> 1 + 2x^2 (+x^4)
    np.testing.assert_allclose(
        poly_mul(np.array([1.0, 0.0, 1.0]), np.array([1.0, 0.0, 1.0])),
        [1, 0, 2])
    np.testing.assert_allclose(
        poly_diff(np.array([5.0, 1.0, 2.0, 3.0])), [1, 4, 9, 0])


def test_radau_mesh_structure():
    m = SegmentedBasis(LegendreRadau(4), 3)
    assert not m.shares_boundary
    assert m.num_nodes == 15
    t = m.time_nodes(0.0, 3.0)
    assert np.all(np.diff(t) > 0) and t[0] == 0.0 and t[-1] < 3.0
    np.testing.assert_allclose(m.quadrature_weights(0.0, 3.0).sum(), 3.0,
                               rtol=1e-12)
    R = m.continuity_matrix()
    assert R.shape == (2, 15)
    # R applied to samples of a polynomial of degree <= order is exactly zero
    # (segment interpolants agree identically)
    c = np.array([0.3, -1.0, 0.5, 2.0, -0.2])      # degree 4
    np.testing.assert_allclose(R @ np.polyval(c, t), 0.0, atol=1e-10)


def test_gauss_transcription_rejected():
    ocp = OCP(dynamics=lambda x, u, p, d, t: u, nx=1, nu=1,
              lagrange=lambda x, u, p, d, t: x @ x)
    with pytest.raises(NotImplementedError):
        transcribe(ocp, SegmentedBasis(LegendreGauss(4), 1))


def _stiff_ocp_solve(basis, NS):
    """Stiff actuator tracking:  min int (x-1)^2 + 0.1 u^2,
    x' = lam (x - u), lam = -50, x(0) = 0."""
    lam = -50.0
    ocp = OCP(dynamics=lambda x, u, p, d, t: jnp.array([lam * (x[0] - u[0])]),
              nx=1, nu=1,
              lagrange=lambda x, u, p, d, t: (x[0] - 1.0) ** 2
              + 0.1 * u[0] ** 2)
    tr = transcribe(ocp, SegmentedBasis(basis, NS))
    prm = tr.params(t0=0.0, tf=1.0)
    bounds = ocp_bounds(tr, x0=[0.0])
    s = SQPSettings(hessian="exact", max_iter=60,
                    qp=ADMMSettings(eps_abs=1e-9, eps_rel=1e-9,
                                    max_epochs=80))
    sol = sqp_solve(tr.nlp, tr.initial_guess([0.0]), p=prm, bounds=bounds,
                    settings=s)
    return tr, sol


def test_stiff_ocp_radau_beats_lobatto():
    # fine-mesh oracle
    tro, solo = _stiff_ocp_solve(Legendre(8), 16)
    assert int(solo.status) == st.SOLVED
    tq = np.linspace(0.0, 1.0, 101)
    Xo = tro.mesh.interp_matrix(tq, 0.0, 1.0) @ np.asarray(
        solo.x[:tro.N]).reshape(-1)

    errs = {}
    for name, basis in [("lobatto", Legendre(3)), ("radau", LegendreRadau(3))]:
        tr, sol = _stiff_ocp_solve(basis, 4)
        assert int(sol.status) == st.SOLVED
        X = tr.mesh.interp_matrix(tq, 0.0, 1.0) @ np.asarray(
            sol.x[:tr.N]).reshape(-1)
        errs[name] = {"traj": np.abs(X - Xo).max(),
                      "cost": abs(float(sol.cost) - float(solo.cost))}
    assert errs["radau"]["traj"] < errs["lobatto"]["traj"]
    assert errs["radau"]["cost"] < errs["lobatto"]["cost"]


def test_radau_multisegment_matches_lobatto_solution():
    # non-stiff robot-style check: Radau and Lobatto transcriptions of the
    # same OCP agree on the interpolated solution (scheme-consistency)
    ocp = OCP(dynamics=lambda x, u, p, d, t: jnp.array(
        [x[1], -x[0] + u[0]]), nx=2, nu=1,
        lagrange=lambda x, u, p, d, t: x @ x + 0.1 * u @ u)
    sols = {}
    for name, basis in [("lobatto", Legendre(5)), ("radau", LegendreRadau(5))]:
        tr = transcribe(ocp, SegmentedBasis(basis, 2))
        prm = tr.params(t0=0.0, tf=2.0)
        bounds = ocp_bounds(tr, x0=[1.0, 0.0])
        s = SQPSettings(hessian="exact", max_iter=50,
                        qp=ADMMSettings(eps_abs=1e-9, eps_rel=1e-9,
                                        max_epochs=60))
        sol = sqp_solve(tr.nlp, tr.initial_guess([1.0, 0.0]), p=prm,
                        bounds=bounds, settings=s)
        assert int(sol.status) == st.SOLVED
        tq = np.linspace(0.0, 2.0, 41)
        P = tr.mesh.interp_matrix(tq, 0.0, 2.0)
        X = np.asarray(sol.x[:tr.N * 2]).reshape(tr.N, 2)
        sols[name] = P @ X
    # at this deliberately coarse mesh each scheme carries ~1e-2..4e-2
    # discretization error vs a fine oracle (verified: radau 0.016, lobatto
    # 0.039); scheme-consistency here means agreement at that level
    np.testing.assert_allclose(sols["radau"], sols["lobatto"], atol=6e-2)


def test_radau_integrator_l_stable():
    # x' = -1000 x, x(0) = 1 over [0, 1] with 10 steps (lam*h = -100):
    # exact solution ~ 0; trapezoidal (A-stable, R(inf) = -1) leaves a large
    # oscillatory residue, Radau IIA (L-stable, R(inf) = 0) damps it away
    f = lambda x, u, t: -1000.0 * x
    x0 = jnp.array([1.0])
    xr = radau_integrate(f, x0, 0.0, 1.0, num_steps=10, order=2)
    xt = implicit_integrate(f, x0, 0.0, 1.0, num_steps=10)
    assert abs(float(xr[-1, 0])) < 1e-8
    assert abs(float(xt[-1, 0])) > 1e-2          # trapezoid residue
    assert abs(float(xr[-1, 0])) < 1e-5 * abs(float(xt[-1, 0]))


def test_radau_integrator_accuracy_smooth():
    # nonstiff accuracy: x' = -x + sin(t), exact solution known
    f = lambda x, u, t: -x + jnp.sin(t)
    x0 = jnp.array([0.5])
    X = radau_integrate(f, x0, 0.0, 2.0, num_steps=8, order=3)
    t = 2.0
    exact = (0.5 - (-0.5)) * np.exp(-t) + 0.5 * (np.sin(t) - np.cos(t))
    np.testing.assert_allclose(float(X[-1, 0]), exact, atol=1e-9)
