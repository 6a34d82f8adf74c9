"""Pallas kernel parity tests (interpret mode on CPU).

The analogue of the reference's dense_sparse_compare.cpp consistency trick
(SURVEY.md §4): the Pallas path must match the plain jnp/linalg path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.ops import ldlt_factor, ldlt_solve, ldlt_factor_solve


def _random_kkt_batch(B, n, m, seed, dtype=jnp.float64):
    """Symmetric quasi-definite ADMM-style KKT matrices
    [[H + sigma I, A'], [A, -diag(1/rho)]] (box_admm.hpp:207-310)."""
    rng = np.random.default_rng(seed)
    Hh = rng.normal(size=(B, n, n))
    H = Hh @ np.swapaxes(Hh, 1, 2) + 0.1 * np.eye(n)
    A = rng.normal(size=(B, m, n))
    rho = rng.uniform(0.5, 5.0, size=(B, m))
    K = np.zeros((B, n + m, n + m))
    K[:, :n, :n] = H + 1e-6 * np.eye(n)
    K[:, :n, n:] = np.swapaxes(A, 1, 2)
    K[:, n:, :n] = A
    K[:, n:, n:] = -np.eye(m) / rho[:, None, :] * np.eye(m)
    for b in range(B):
        K[b, n:, n:] = -np.diag(1.0 / rho[b])
    return jnp.asarray(K, dtype)


@pytest.mark.parametrize("B,n,m", [(3, 5, 4), (130, 11, 7), (1, 16, 0)])
def test_ldlt_factor_solve_matches_dense(B, n, m):
    K = _random_kkt_batch(B, n, m, seed=B + n)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(B, n + m)))
    x, F, d = ldlt_factor_solve(K, b)
    x_ref = jnp.linalg.solve(K, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-9, atol=1e-9)
    # re-solve with the returned factor (the ADMM per-iteration path)
    b2 = jnp.asarray(rng.normal(size=(B, n + m)))
    x2 = ldlt_solve(F, d, b2)
    x2_ref = jnp.linalg.solve(K, b2[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x2_ref),
                               rtol=1e-9, atol=1e-9)


def test_ldlt_factor_reconstructs():
    # unpack the packed (L^T-in-upper, d-separate) storage and check L D L' = M
    B, n, m = 4, 6, 3
    Kmat = _random_kkt_batch(B, n, m, seed=7)
    F, d = ldlt_factor(Kmat)
    Kdim = n + m
    for b in range(B):
        Fb = np.asarray(F[b])[:Kdim, :Kdim]
        db = np.asarray(d[b])[:Kdim]
        L = np.eye(Kdim)
        for i in range(Kdim):
            L[i + 1:, i] = Fb[i, i + 1:]
        np.testing.assert_allclose(L @ np.diag(db) @ L.T,
                                   np.asarray(Kmat[b]), atol=1e-9)


def test_ldlt_indefinite_diagonal():
    # quasi-definite KKT has negative D entries in the dual block — the
    # unpivoted factorization must handle them (no abs(), no Cholesky)
    Kmat = _random_kkt_batch(2, 4, 3, seed=3)
    F, d = ldlt_factor(Kmat)
    d = np.asarray(d)[:, :7]
    assert (d > 0).sum() >= 2 * 4  # primal block positive
    assert (d < 0).sum() >= 2 * 3  # dual block negative


def _random_qp_batch(B, n, m, seed):
    """Batch of feasible box QPs with general rows."""
    rng = np.random.default_rng(seed)
    Hh = rng.normal(size=(B, n, n))
    H = Hh @ np.swapaxes(Hh, 1, 2) + 0.5 * np.eye(n)
    h = rng.normal(size=(B, n))
    A = rng.normal(size=(B, m, n))
    mid = rng.normal(size=(B, m)) * 0.3
    al, au = mid - 1.0, mid + 1.0
    xl = np.full((B, n), -2.0)
    xu = np.full((B, n), 2.0)
    return H, h, A, al, au, xl, xu


def test_fused_epoch_matches_lu_path():
    # the new dense_sparse_compare: vmapped solves with the fused Pallas
    # epoch (kkt_solver="pallas") must match the per-instance LU path
    from polympc_tpu.qp import box_admm_solve, QPData
    from polympc_tpu.qp.types import ADMMSettings

    B, n, m = 7, 6, 4
    H, h, A, al, au, xl, xu = _random_qp_batch(B, n, m, seed=2)
    qps = QPData(H=jnp.asarray(H), h=jnp.asarray(h), A=jnp.asarray(A),
                 al=jnp.asarray(al), au=jnp.asarray(au),
                 xl=jnp.asarray(xl), xu=jnp.asarray(xu))

    def solve_with(kkt_solver):
        s = ADMMSettings(kkt_solver=kkt_solver, max_epochs=20,
                         eps_abs=1e-8, eps_rel=1e-8)
        return jax.vmap(lambda qp: box_admm_solve(qp, settings=s))(qps)

    sol_pl = solve_with("pallas")
    sol_lu = solve_with("lu")
    assert np.all(np.asarray(sol_pl.status) == np.asarray(sol_lu.status))
    np.testing.assert_allclose(np.asarray(sol_pl.x), np.asarray(sol_lu.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol_pl.y), np.asarray(sol_lu.y),
                               atol=1e-5)


def test_fused_epoch_solo_falls_back_to_lu():
    # unvmapped call with kkt_solver="pallas" must run the LU primal path
    from polympc_tpu.qp import box_admm_solve, QPData
    from polympc_tpu.qp.types import ADMMSettings
    qp = QPData(H=jnp.array([[4., 1.], [1., 2.]]), h=jnp.array([1., 1.]),
                A=jnp.array([[1., 1.]]), al=jnp.array([1.]),
                au=jnp.array([1.]), xl=jnp.array([0., 0.]),
                xu=jnp.array([0.7, 0.7]))
    sol = box_admm_solve(qp, settings=ADMMSettings(kkt_solver="pallas"))
    np.testing.assert_allclose(np.asarray(sol.x), [0.3, 0.7], atol=1e-3)


def test_fused_epoch_no_general_rows():
    # m = 0: box-only QP exercises the no-m kernel variant
    from polympc_tpu.qp import box_admm_solve, QPData
    from polympc_tpu.qp.types import ADMMSettings
    B, n = 5, 4
    rng = np.random.default_rng(5)
    Hh = rng.normal(size=(B, n, n))
    H = jnp.asarray(Hh @ np.swapaxes(Hh, 1, 2) + 0.5 * np.eye(n))
    h = jnp.asarray(rng.normal(size=(B, n)))
    qps = QPData(H=H, h=h, A=jnp.zeros((B, 0, n)), al=jnp.zeros((B, 0)),
                 au=jnp.zeros((B, 0)), xl=jnp.full((B, n), -1.0),
                 xu=jnp.full((B, n), 1.0))
    s = ADMMSettings(kkt_solver="pallas", max_epochs=20,
                     eps_abs=1e-8, eps_rel=1e-8)
    sol = jax.vmap(lambda qp: box_admm_solve(qp, settings=s))(qps)
    # oracle: projected unconstrained minimiser must satisfy KKT
    for b in range(B):
        x = np.asarray(sol.x[b])
        g = np.asarray(H[b]) @ x + np.asarray(h[b]) + np.asarray(sol.y_box[b])
        assert np.max(np.abs(g)) < 1e-5, (b, g)


def test_ldlt_jit_and_grad_shapes():
    # kernels must compose with jit (already jitted) and accept fp32
    Kmat = _random_kkt_batch(5, 8, 2, seed=1, dtype=jnp.float32)
    b = jnp.ones((5, 10), jnp.float32)
    x, F, d = ldlt_factor_solve(Kmat, b)
    assert x.dtype == jnp.float32 and x.shape == (5, 10)
    r = jnp.einsum("bij,bj->bi", Kmat, x) - b
    assert float(jnp.max(jnp.abs(r))) < 1e-3


def test_vmem_fit_predicates():
    """The VMEM fit predicates gate the Pallas dispatch (box_admm falls
    back to the LU epoch when False).  Pin their planning arithmetic:
    monotone in problem size, known-true at the benchmark shapes, and
    known-false beyond the 88 MB per-kernel budget (round-3 weak #8: the
    budget constants were asserted, never tested)."""
    from polympc_tpu.ops.ldlt import pallas_fits
    from polympc_tpu.ops.admm_epoch import epoch_kernel_fits
    from polympc_tpu.ops.bbt_kernel import bbt_kernel_fits
    from polympc_tpu.ops.structure import bbt_structure

    # dense LDLT: (4 K^2 + 48 K) * 4 B * 128 lanes <= 88 MB  =>  K* ~ 208
    assert pallas_fits(165)          # race-car KKT (n=99, m=66)
    assert pallas_fits(206)
    assert not pallas_fits(207)
    # exact boundary: first K where the working set exceeds the budget
    K = 1
    while pallas_fits(K + 1):
        K += 1
    per_lane = (4 * (K + 1) ** 2 + 48 * (K + 1)) * 4
    assert per_lane * 128 > 88 * 1024 * 1024
    # monotonicity of the epoch predicate in n and m
    assert epoch_kernel_fits(99, 66)
    assert not epoch_kernel_fits(200, 66)

    # BBT: scales ~ S k^2, so horizons far beyond the dense limit fit
    st8 = bbt_structure(41, 5, 1, 0, 0, 0, 5, 8)     # kite, S=8 (K=451)
    assert bbt_kernel_fits(st8)
    st64 = bbt_structure(321, 5, 1, 0, 0, 0, 5, 64)  # S=64 (K~3.5k)
    assert not bbt_kernel_fits(st64)
