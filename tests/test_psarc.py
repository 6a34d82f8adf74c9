"""Pseudo-arc-length continuation tests (ref: src/experimental/psarc.hpp).

Oracles: roots of polynomial systems where the homotopy path is nontrivial
(lambda over/undershoots before landing), checked by residual, plus a
bounded-variable variant.
"""
import jax.numpy as jnp
import numpy as np

from polympc_tpu.nlp import PsarcSettings, psarc_solve


def test_cubic_continuation():
    # x0^3 - 3 x0 = 2 has roots x0 = 2 and x0 = -1 (double); starting at 0.5
    # plain Newton on F stalls near the singular double root region, the
    # homotopy path walks around it
    def F(x):
        return jnp.array([x[0] ** 3 - 3 * x[0] - x[1], x[1] - 2.0])

    res = psarc_solve(F, jnp.array([0.5, 0.0]))
    assert res.converged
    assert float(jnp.max(jnp.abs(F(res.x)))) < 1e-6
    # the lambda log must trace a path from 1 down through 0
    assert res.lambda_log[0] == 1.0 and res.lambda_log[-1] == 0.0


def test_linear_system_one_step():
    A = np.array([[3.0, 1.0], [1.0, 2.0]])
    b = np.array([1.0, -1.0])

    def F(x):
        return jnp.asarray(A) @ x - jnp.asarray(b)

    res = psarc_solve(F, jnp.zeros(2))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               atol=1e-7)


def test_bounded_correction():
    # keep x inside [0, 10]^2 along the whole path
    def F(x):
        return jnp.array([x[0] ** 2 - 4.0, x[1] - 1.0])

    res = psarc_solve(F, jnp.array([1.0, 0.5]),
                      settings=PsarcSettings(h0=0.5),
                      lbx=jnp.zeros(2), ubx=jnp.full(2, 10.0))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), [2.0, 1.0], atol=1e-6)
