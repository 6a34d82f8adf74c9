"""Compiled (Mosaic) Pallas-kernel parity on real TPU hardware.

Under the normal CI conftest the backend is CPU, so every Pallas kernel
runs in interpret mode and a Mosaic *lowering* regression would pass CI
and only surface at bench time (VERDICT r3 weak #5).  This suite runs the
same kernel-vs-jnp-oracle parity checks with the kernels actually
compiled; it is skipped unless the session backend is TPU.

Run it in the bench environment with:

    POLYMPC_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -v

(the env var stops conftest.py from pinning the CPU platform).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs a real TPU backend "
                              "(set POLYMPC_TPU_TESTS=1)"),
]


def _random_qd_kkt(rng, n, m, dtype=np.float32):
    """A symmetric quasi-definite boxADMM-shaped KKT + rhs."""
    A = rng.standard_normal((n, n))
    H = A @ A.T / n + np.eye(n)
    J = rng.standard_normal((m, n))
    rho = rng.uniform(0.5, 2.0, m)
    K = np.block([[H, J.T], [J, -np.diag(1.0 / rho)]])
    b = rng.standard_normal(n + m)
    return K.astype(dtype), b.astype(dtype)


def test_ldlt_factor_solve_compiled():
    from polympc_tpu.ops.ldlt import ldlt_factor_solve
    rng = np.random.default_rng(0)
    Ks, bs = zip(*[_random_qd_kkt(rng, 24, 10) for _ in range(5)])
    K = jnp.asarray(np.stack(Ks))
    b = jnp.asarray(np.stack(bs))
    x, F, d = ldlt_factor_solve(K, b, interpret=False)
    x_ref = jnp.linalg.solve(K, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=5e-4, rtol=1e-3)


def test_ldlt_inverse_compiled():
    from polympc_tpu.ops.ldlt import ldlt_inverse
    rng = np.random.default_rng(1)
    Ks, _ = zip(*[_random_qd_kkt(rng, 20, 8) for _ in range(3)])
    K = jnp.asarray(np.stack(Ks))
    inv = ldlt_inverse(K, interpret=False)
    err = np.max(np.abs(np.einsum("bij,bjk->bik", np.asarray(K),
                                  np.asarray(inv)) - np.eye(28)))
    assert err < 5e-3, err


def _kite_structure():
    from polympc_tpu.basis import Chebyshev, SegmentedBasis
    from polympc_tpu.control.nmpf import augment_ocp
    from polympc_tpu.models import kite_dynamics, kite_output, kite_path
    from polympc_tpu.ocp import transcribe
    ocp = augment_ocp(lambda x, u: kite_dynamics(x, u), kite_output,
                      kite_path, nx=3, nu=1, ny=2)
    tr = transcribe(ocp, SegmentedBasis(Chebyshev(5), 2))
    return tr, tr.bbt_structure()


def _kkt_of(tr, seed=0, dtype=np.float32):
    """Structured boxADMM KKT of the transcription at a random point — the
    BBT kernels assume the collocation sparsity, so the (1,1) block must be
    the real (block-structured) Lagrangian Hessian, PSD-shifted via
    Gershgorin (eig-free: runs eagerly on the TPU backend)."""
    nlp = tr.nlp
    n, m = nlp.n, nlp.m
    rng = np.random.default_rng(seed)
    prm = tr.params(d=[0.05], t0=0.0, tf=2.0, dtype=jnp.float32)
    z = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
    lam = jnp.asarray(rng.standard_normal(m) * 0.1, jnp.float32)
    H = np.asarray(nlp.lag_hessian(z, lam, prm), np.float64)
    H = 0.5 * (H + H.T)
    d = np.diag(H)
    radii = np.sum(np.abs(H), axis=1) - np.abs(d)
    H = H + (max(0.0, -np.min(d - radii)) + 0.1) * np.eye(n)
    J = np.asarray(nlp.eq_jac(z, prm), np.float64)
    rho = rng.uniform(0.5, 2.0, m)
    rb = rng.uniform(0.05, 0.2, n)
    K = np.block([[H + 1e-6 * np.eye(n) + np.diag(rb), J.T],
                  [J, -np.diag(1.0 / rho)]])
    return (jnp.asarray(K, dtype), jnp.asarray(rng.standard_normal(n + m),
                                               dtype),
            jnp.asarray(rho, dtype), jnp.asarray(rb, dtype))


def test_bbt_solve_batched_compiled():
    """Compiled bordered-block-tridiagonal solve vs dense fp32 LU."""
    from polympc_tpu.ops.bbt_kernel import bbt_solve_batched
    tr, st = _kite_structure()
    Ks, bs = [], []
    for seed in range(3):
        K, b, _, _ = _kkt_of(tr, seed=seed)
        Ks.append(K)
        bs.append(b)
    Kb, bb = jnp.stack(Ks), jnp.stack(bs)
    x = bbt_solve_batched(Kb, bb, st=st, interpret=False)
    x_ref = jnp.linalg.solve(Kb, bb[..., None])[..., 0]
    scale = float(jnp.max(jnp.abs(x_ref)))
    err = float(jnp.max(jnp.abs(x - x_ref)))
    assert err <= 1e-3 * max(scale, 1.0), (err, scale)


def test_bbt_epoch_batched_compiled():
    """Compiled fused BBT ADMM epoch vs the dense LU reference epoch."""
    from polympc_tpu.ops.bbt_kernel import bbt_admm_epoch_batched
    from jax.scipy.linalg import lu_factor, lu_solve
    tr, st = _kite_structure()
    n, m = tr.nlp.n, tr.nlp.m
    K, h_full, rho, rb = _kkt_of(tr, seed=5)
    rng = np.random.default_rng(6)
    dt = jnp.float32
    sigma, alpha, iters = 1e-6, 1.6, 5
    h = h_full[:n]
    al = jnp.asarray(rng.normal(size=m) - 2.0, dt)
    au = al + jnp.asarray(rng.uniform(0.5, 3.0, size=m), dt)
    xl = jnp.full(n, -0.8, dt)
    xu = jnp.full(n, 0.8, dt)
    x = jnp.asarray(rng.normal(size=n) * 0.1, dt)
    z = jnp.asarray(rng.normal(size=m) * 0.1, dt)
    q = x + 0.01
    y = jnp.asarray(rng.normal(size=m) * 0.1, dt)
    yb = jnp.asarray(rng.normal(size=n) * 0.1, dt)

    fac = lu_factor(K)

    def it(state, _):
        x, z, q, y, yb = state
        rhs = jnp.concatenate([sigma * x + rb * q - yb - h, z - y / rho])
        sol = lu_solve(fac, rhs)
        xt, nu = sol[:n], sol[n:]
        zt = z + (nu - y) / rho
        x_new = alpha * xt + (1 - alpha) * x
        q_u = alpha * xt + (1 - alpha) * q
        q_new = jnp.clip(q_u + yb / rb, xl, xu)
        yb_new = yb + rb * (q_u - q_new)
        z_u = alpha * zt + (1 - alpha) * z
        z_new = jnp.clip(z_u + y / rho, al, au)
        y_new = y + rho * (z_u - z_new)
        return (x_new, z_new, q_new, y_new, yb_new), None

    (xr, zr, qr, yr, ybr), _ = jax.lax.scan(it, (x, z, q, y, yb),
                                            None, length=iters)
    B = 2
    tile = lambda v: jnp.tile(v[None], (B,) + (1,) * v.ndim)
    xo, zo, qo, yo, ybo = bbt_admm_epoch_batched(
        tile(K), tile(h), tile(al), tile(au), tile(xl), tile(xu),
        tile(rho), tile(rb), tile(x), tile(z), tile(q), tile(y), tile(yb),
        st=st, sigma=sigma, alpha=alpha, iters=iters, interpret=False)
    for got, want, name in ((xo, xr, "x"), (zo, zr, "z"), (qo, qr, "q"),
                            (yo, yr, "y"), (ybo, ybr, "yb")):
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                                   atol=2e-3, rtol=2e-3, err_msg=name)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(got[0]),
                                   atol=0, err_msg=f"{name}: lanes differ")


def test_dense_admm_epoch_compiled():
    """Compiled dense lane-batched LDL^T ADMM epoch vs the LU reference."""
    from polympc_tpu.ops.admm_epoch import admm_epoch_batched
    from jax.scipy.linalg import lu_factor, lu_solve
    rng = np.random.default_rng(2)
    n, m = 30, 12
    K, _ = _random_qd_kkt(rng, n, m)
    dt = jnp.float32
    K = jnp.asarray(K)
    sigma, alpha, iters = 1e-6, 1.6, 6
    rho = jnp.asarray(rng.uniform(0.5, 2.0, m), dt)
    rb = jnp.asarray(rng.uniform(0.05, 0.2, n), dt)
    # rebuild K consistent with rho/rb
    A = rng.standard_normal((n, n))
    H = (A @ A.T / n + np.eye(n)).astype(np.float32)
    J = rng.standard_normal((m, n)).astype(np.float32)
    K = jnp.asarray(np.block([
        [H + 1e-6 * np.eye(n, dtype=np.float32) + np.diag(np.asarray(rb)),
         J.T], [J, -np.diag(1.0 / np.asarray(rho))]]), dt)
    h = jnp.asarray(rng.standard_normal(n), dt)
    al = jnp.asarray(rng.normal(size=m) - 2.0, dt)
    au = al + jnp.asarray(rng.uniform(0.5, 3.0, size=m), dt)
    xl = jnp.full(n, -0.8, dt)
    xu = jnp.full(n, 0.8, dt)
    x = jnp.asarray(rng.normal(size=n) * 0.1, dt)
    z = jnp.asarray(rng.normal(size=m) * 0.1, dt)
    q = x + 0.01
    y = jnp.asarray(rng.normal(size=m) * 0.1, dt)
    yb = jnp.asarray(rng.normal(size=n) * 0.1, dt)

    fac = lu_factor(K)

    def it(state, _):
        x, z, q, y, yb = state
        rhs = jnp.concatenate([sigma * x + rb * q - yb - h, z - y / rho])
        sol = lu_solve(fac, rhs)
        xt, nu = sol[:n], sol[n:]
        zt = z + (nu - y) / rho
        x_new = alpha * xt + (1 - alpha) * x
        q_u = alpha * xt + (1 - alpha) * q
        q_new = jnp.clip(q_u + yb / rb, xl, xu)
        yb_new = yb + rb * (q_u - q_new)
        z_u = alpha * zt + (1 - alpha) * z
        z_new = jnp.clip(z_u + y / rho, al, au)
        y_new = y + rho * (z_u - z_new)
        return (x_new, z_new, q_new, y_new, yb_new), None

    (xr, zr, qr, yr, ybr), _ = jax.lax.scan(it, (x, z, q, y, yb),
                                            None, length=iters)
    B = 2
    tile = lambda v: jnp.tile(v[None], (B,) + (1,) * v.ndim)
    xo, zo, qo, yo, ybo = admm_epoch_batched(
        tile(K), tile(h), tile(al), tile(au), tile(xl), tile(xu),
        tile(rho), tile(rb), tile(x), tile(z), tile(q), tile(y), tile(yb),
        sigma=sigma, alpha=alpha, iters=iters, interpret=False)
    for got, want, name in ((xo, xr, "x"), (zo, zr, "z"), (qo, qr, "q"),
                            (yo, yr, "y"), (ybo, ybr, "yb")):
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                                   atol=2e-3, rtol=2e-3, err_msg=name)
