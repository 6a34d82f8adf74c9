"""Horizon-partitioning (Schur condensation) parity tests on the fake mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.parallel.horizon import (
    assemble_dense_horizon, horizon_mesh, schur_horizon_solve,
)


def _random_problem(S, k, p, seed):
    rng = np.random.default_rng(seed)
    Kh = rng.normal(size=(S, k, k))
    K = Kh @ np.swapaxes(Kh, 1, 2) + 0.5 * np.eye(k)  # SPD local blocks
    b = rng.normal(size=(S, k))
    E = np.zeros((p, k))
    F = np.zeros((p, k))
    E[:, k - p:] = np.eye(p)      # tail states of segment i
    F[:, :p] = -np.eye(p)         # minus head states of segment i+1
    c = rng.normal(size=(S - 1, p)) * 0.1
    return (jnp.asarray(K), jnp.asarray(b), jnp.asarray(E),
            jnp.asarray(F), jnp.asarray(c))


@pytest.mark.parametrize("S,k,p", [(4, 10, 3), (8, 17, 4), (2, 6, 2)])
def test_schur_matches_dense(S, k, p):
    K, b, E, F, c = _random_problem(S, k, p, seed=S * k)
    w, mu = schur_horizon_solve(K, b, E, F, c)
    w_ref, mu_ref = assemble_dense_horizon(K, b, E, F, c)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-8)


def test_schur_sharded_matches_local():
    S, k, p = 8, 12, 3
    K, b, E, F, c = _random_problem(S, k, p, seed=1)
    mesh = horizon_mesh(8)
    w_sh, mu_sh = jax.jit(
        lambda K, b, c: schur_horizon_solve(K, b, E, F, c, mesh=mesh))(K, b, c)
    w, mu = schur_horizon_solve(K, b, E, F, c)
    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(w), atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu_sh), np.asarray(mu), atol=1e-8)


def _random_border(S, k, a, seed):
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(S, k, a)) * 0.3
    Dh = rng.normal(size=(a, a))
    Dg = Dh @ Dh.T + 0.5 * np.eye(a)
    bg = rng.normal(size=(a,))
    return jnp.asarray(C), jnp.asarray(Dg), jnp.asarray(bg)


@pytest.mark.parametrize("S,k,p,a", [(4, 10, 3, 2), (8, 17, 4, 1)])
def test_schur_border_matches_dense(S, k, p, a):
    """Global border (optimised-parameter arrow) through the condensation."""
    K, b, E, F, c = _random_problem(S, k, p, seed=7 * S)
    C, Dg, bg = _random_border(S, k, a, seed=S)
    w, mu, g = schur_horizon_solve(K, b, E, F, c, C=C, Dg=Dg, bg=bg)
    w_ref, mu_ref, g_ref = assemble_dense_horizon(K, b, E, F, c,
                                                  C=C, Dg=Dg, bg=bg)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g), g_ref, atol=1e-8)


def test_schur_interface_diagonal_matches_dense():
    """ADMM-relaxed continuity rows: E w_i + F w_{i+1} + G_i mu_i = c_i."""
    S, k, p = 5, 8, 3
    K, b, E, F, c = _random_problem(S, k, p, seed=11)
    G = jnp.asarray(np.tile(-0.1 * np.eye(p)[None], (S - 1, 1, 1)))
    w, mu = schur_horizon_solve(K, b, E, F, c, G=G)
    w_ref, mu_ref = assemble_dense_horizon(K, b, E, F, c, G=G)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-8)


def test_schur_border_sharded_matches_local():
    S, k, p, a = 8, 12, 3, 2
    K, b, E, F, c = _random_problem(S, k, p, seed=2)
    C, Dg, bg = _random_border(S, k, a, seed=9)
    G = jnp.asarray(np.tile(-0.05 * np.eye(p)[None], (S - 1, 1, 1)))
    mesh = horizon_mesh(8)
    w_sh, mu_sh, g_sh = jax.jit(
        lambda K, b, c, C, bg: schur_horizon_solve(
            K, b, E, F, c, mesh=mesh, G=G, C=C, Dg=Dg, bg=bg))(K, b, c, C, bg)
    w, mu, g = schur_horizon_solve(K, b, E, F, c, G=G, C=C, Dg=Dg, bg=bg)
    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(w), atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu_sh), np.asarray(mu), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g), atol=1e-8)


def test_schur_continuity_satisfied():
    # the solution must satisfy the continuity rows exactly
    S, k, p = 6, 9, 3
    K, b, E, F, c = _random_problem(S, k, p, seed=3)
    w, _ = schur_horizon_solve(K, b, E, F, c)
    res = jnp.einsum("pk,ik->ip", E, w[:-1]) \
        + jnp.einsum("pk,ik->ip", F, w[1:]) - c
    assert float(jnp.max(jnp.abs(res))) < 1e-8


def test_single_segment_no_interface():
    # S=1: nothing to condense — schur_horizon_solve must reduce to K w = b
    # (regression: the interface accumulator used to index diag[0,0,0] on a
    # zero-size array at trace time)
    S, k, p = 1, 7, 3
    rng = np.random.default_rng(5)
    Kh = rng.normal(size=(S, k, k))
    K = jnp.asarray(Kh @ np.swapaxes(Kh, 1, 2) + 0.5 * np.eye(k))
    b = jnp.asarray(rng.normal(size=(S, k)))
    E = np.zeros((p, k)); E[:, k - p:] = np.eye(p)
    F = np.zeros((p, k)); F[:, :p] = -np.eye(p)
    c = jnp.zeros((0, p))
    w, mu = schur_horizon_solve(K, b, jnp.asarray(E), jnp.asarray(F), c)
    assert mu.shape == (0, p)
    np.testing.assert_allclose(np.asarray(w[0]),
                               np.linalg.solve(np.asarray(K[0]),
                                               np.asarray(b[0])), atol=1e-9)


def test_single_segment_with_border():
    # S=1 with a global border: only the border system remains
    S, k, p, a = 1, 6, 2, 2
    rng = np.random.default_rng(6)
    Kh = rng.normal(size=(S, k, k))
    K = jnp.asarray(Kh @ np.swapaxes(Kh, 1, 2) + 0.5 * np.eye(k))
    b = jnp.asarray(rng.normal(size=(S, k)))
    E = np.zeros((p, k)); E[:, k - p:] = np.eye(p)
    F = np.zeros((p, k)); F[:, :p] = -np.eye(p)
    c = jnp.zeros((0, p))
    C = jnp.asarray(rng.normal(size=(S, k, a)) * 0.1)
    Dg = jnp.asarray(rng.normal(size=(a, a)))
    Dg = Dg @ Dg.T + 0.5 * jnp.eye(a)
    bg = jnp.asarray(rng.normal(size=(a,)))
    w, mu, g = schur_horizon_solve(K, b, jnp.asarray(E), jnp.asarray(F), c,
                                   C=C, Dg=Dg, bg=bg)
    # oracle: dense bordered system [[K, C],[C', Dg]]
    M = np.zeros((k + a, k + a))
    M[:k, :k] = np.asarray(K[0]); M[:k, k:] = np.asarray(C[0])
    M[k:, :k] = np.asarray(C[0]).T; M[k:, k:] = np.asarray(Dg)
    sol = np.linalg.solve(M, np.concatenate([np.asarray(b[0]),
                                             np.asarray(bg)]))
    np.testing.assert_allclose(np.asarray(w[0]), sol[:k], atol=1e-9)
    np.testing.assert_allclose(np.asarray(g), sol[k:], atol=1e-9)
