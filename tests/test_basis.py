"""Basis-layer parity tests.

Oracles follow the reference's polynomial tests
(tests/polynomials/ebyshev_test.cpp, legendre_test.cpp, splines_test.cpp):
quadrature of known integrals, differentiation of polynomials, projection
round-trips.
"""
import numpy as np
import pytest

from polympc_tpu.basis import (
    Chebyshev, Legendre, SegmentedBasis, fit_cubic_spline, cubic_spline_eval,
    lagrange_interp, project,
)


@pytest.mark.parametrize("make", [Chebyshev, Legendre])
@pytest.mark.parametrize("order", [4, 5, 8, 12])
def test_nodes_and_weights(make, order):
    b = make(order)
    assert b.nodes.shape == (order + 1,)
    assert b.nodes[0] == -1.0 and b.nodes[-1] == 1.0
    assert np.all(np.diff(b.nodes) > 0)
    # weights integrate 1 over [-1,1] to 2
    np.testing.assert_allclose(np.sum(b.quad_weights), 2.0, atol=1e-13)
    # exact for polynomials up to the scheme's degree
    for deg in range(order if make is Chebyshev else 2 * order - 1):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        got = np.dot(b.quad_weights, b.nodes ** deg)
        np.testing.assert_allclose(got, exact, atol=1e-11,
                                   err_msg=f"deg={deg}")


@pytest.mark.parametrize("make", [Chebyshev, Legendre])
def test_quadrature_gaussian(make):
    # ebyshev_test.cpp:13-48 — integrate a Gaussian over [-1, 1]
    from math import erf, sqrt, pi
    b = make(20)
    got = b.integrate(lambda t: np.exp(-t * t))
    exact = sqrt(pi) * erf(1.0)
    np.testing.assert_allclose(got, exact, rtol=1e-10)


@pytest.mark.parametrize("make", [Chebyshev, Legendre])
@pytest.mark.parametrize("order", [5, 9])
def test_diff_matrix(make, order):
    b = make(order)
    # constants -> 0
    np.testing.assert_allclose(b.D @ np.ones(order + 1), 0.0, atol=1e-12)
    # exact differentiation of polynomials of degree <= order
    for deg in range(1, order + 1):
        y = b.nodes ** deg
        dy = deg * b.nodes ** (deg - 1)
        np.testing.assert_allclose(b.D @ y, dy, atol=1e-9)


def test_lgl_known_nodes():
    # classical LGL order-4 nodes: 0, ±sqrt(3/7), ±1
    b = Legendre(4)
    np.testing.assert_allclose(
        b.nodes, [-1.0, -np.sqrt(3 / 7), 0.0, np.sqrt(3 / 7), 1.0], atol=1e-12)
    np.testing.assert_allclose(
        b.quad_weights, [1 / 10, 49 / 90, 32 / 45, 49 / 90, 1 / 10], atol=1e-12)


def test_segmented_basis():
    sb = SegmentedBasis(Chebyshev(5), 2)
    assert sb.num_nodes == 11
    t = sb.time_nodes(0.0, 2.0)
    assert t[0] == 0.0 and t[-1] == 2.0 and abs(t[5] - 1.0) < 1e-14
    assert np.all(np.diff(t) > 0)
    # composite quadrature integrates exactly over [0,2]
    w = sb.quadrature_weights(0.0, 2.0)
    np.testing.assert_allclose(np.sum(w), 2.0, atol=1e-13)
    np.testing.assert_allclose(np.dot(w, t ** 3), 4.0, atol=1e-10)
    # composite D differentiates t^3 exactly (within segments)
    Dg = sb.composite_diff_matrix(0.0, 2.0)
    np.testing.assert_allclose(Dg @ t ** 3, 3 * t ** 2, atol=1e-9)


def test_interp_matrix():
    sb = SegmentedBasis(Chebyshev(5), 2)
    t = sb.time_nodes(0.0, 2.0)
    y = np.sin(t)
    tq = np.linspace(0.0, 2.0, 17)
    P = sb.interp_matrix(tq, 0.0, 2.0)
    np.testing.assert_allclose(P @ y, np.sin(tq), atol=1e-5)
    # exact at nodes
    Pn = sb.interp_matrix(t, 0.0, 2.0)
    np.testing.assert_allclose(Pn @ y, y, atol=1e-13)


def test_cubic_spline():
    xs = np.linspace(0, 2 * np.pi, 41)
    sp = fit_cubic_spline(0.0, xs[1] - xs[0], np.sin(xs))
    xq = np.linspace(0.1, 2 * np.pi - 0.1, 57)
    got = np.asarray(cubic_spline_eval(sp, xq))
    np.testing.assert_allclose(got, np.sin(xq), atol=2e-4)


def test_cubic_spline_grad():
    import jax
    xs = np.linspace(0, 1, 11)
    sp = fit_cubic_spline(0.0, 0.1, xs ** 2)  # y = x^2 sampled
    g = jax.grad(lambda x: cubic_spline_eval(sp, x))(0.55)
    np.testing.assert_allclose(g, 1.1, atol=1e-3)


def test_lagrange_interp_jax():
    b = Chebyshev(7)
    vals = np.cos(b.nodes)
    got = lagrange_interp(b.nodes, b.bary_w, vals, 0.3)
    np.testing.assert_allclose(got, np.cos(0.3), atol=1e-6)
    # exact at a node
    got = lagrange_interp(b.nodes, b.bary_w, vals, float(b.nodes[2]))
    np.testing.assert_allclose(got, vals[2], atol=1e-13)


@pytest.mark.parametrize("make", [Chebyshev, Legendre])
def test_projection(make):
    b = make(12)
    f = lambda t: np.exp(-t) * np.sin(3 * t)
    p = project(f, b, a=0.0, b=2.0)
    tq = np.linspace(0.0, 2.0, 33)
    np.testing.assert_allclose(p(tq), [f(t) for t in tq], atol=1e-6)


def test_legendre_galerkin_tensor():
    # reference legendre.hpp:266-285 (left disabled there at :122):
    # G[i,j,k] = integral of L_i L_j L_k over [-1, 1]
    from polympc_tpu.basis.nodes import legendre_galerkin_tensor
    G = legendre_galerkin_tensor(5)
    # orthogonality slice: G[0,j,k] = 2/(2j+1) delta_jk
    for j in range(6):
        for k in range(6):
            expect = 2.0 / (2 * j + 1) if j == k else 0.0
            assert abs(G[0, j, k] - expect) < 1e-13
    # fully symmetric tensor
    assert np.allclose(G, G.transpose(1, 0, 2))
    assert np.allclose(G, G.transpose(2, 1, 0))
    # Galerkin product: L_1 * L_1 = 1/3 L_0 + 2/3 L_2
    c = G[1, 1, :] / (2.0 / (2 * np.arange(6) + 1))
    np.testing.assert_allclose(c, [1 / 3, 0, 2 / 3, 0, 0, 0], atol=1e-14)
