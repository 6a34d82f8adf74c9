"""Bordered-block-tridiagonal (BBT) KKT kernel parity.

The structured factor/solve (ops/structure.py + ops/bbt_kernel.py) must
reproduce the dense solve on real collocation KKT matrices — the TPU
analogue of the reference's dense_sparse_compare test
(tests/control/dense_sparse_compare.cpp): same problem through the
structure-exploiting path and the dense oracle must agree.

Covers: kite (a=0, no border), parking with parameter + nonlinear
constraint (a=1 arrow), long meshes (S=8), the single-shot Pallas solve,
and the fused Pallas ADMM epoch vs the dense LU epoch.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.control.nmpf import augment_ocp
from polympc_tpu.models import (
    kite_dynamics, kite_output, kite_path, parking_ocp, robot_ocp,
)
from polympc_tpu.ocp import transcribe
from polympc_tpu.ops.structure import (
    bbt_structure, gather_blocks, scatter_solution, bbt_solve_jnp,
)
from polympc_tpu.qp.box_admm import _build_kkt
from polympc_tpu.qp.types import ADMMSettings, QPData


def _kite_tr(segments=2):
    ocp = augment_ocp(lambda x, u: kite_dynamics(x, u), kite_output,
                      kite_path, nx=3, nu=1, ny=2)
    return transcribe(ocp, SegmentedBasis(Chebyshev(5), segments))


def _parking_tr(segments=2):
    return transcribe(parking_ocp(nonlinear_constraint=True),
                      SegmentedBasis(Chebyshev(5), segments))


def _structure_of(tr):
    ocp = tr.ocp
    return bbt_structure(tr.N, ocp.nx, ocp.nu, ocp.ng, ocp.np_, ocp.ntg,
                         tr.mesh.order, tr.mesh.num_segments)


def _kkt_of(tr, seed=0, sigma=1e-6, dtype=jnp.float64):
    """Assemble the boxADMM KKT of the transcription at a random point."""
    nlp = tr.nlp
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.normal(size=nlp.n) * 0.3, dtype)
    lam = jnp.asarray(rng.normal(size=nlp.m), dtype)
    prm = tr.params(d=[1.0] if tr.ocp.nd else None, t0=0.0, tf=2.0,
                    dtype=dtype)
    H = nlp.lag_hessian(z, lam, prm)
    # diagonal-shift regularisation (structure-preserving): the boxADMM KKT
    # is only quasi-definite — the regime licensing unpivoted LDL^T
    # (box_admm.hpp:336-349) — when the (1,1) block is PSD, which is what
    # the SQP's Hessian regularisation guarantees in production
    lam_min = jnp.min(jnp.linalg.eigvalsh(H))
    H = H + (jnp.maximum(-lam_min, 0.0) + 0.1) * jnp.eye(nlp.n, dtype=dtype)
    rows = [nlp.eq_jac(z, prm)]
    if nlp.ni:
        rows.append(nlp.ineq_jac(z, prm))
    A = jnp.concatenate(rows, axis=0)
    n, m = nlp.n, nlp.m
    rho = jnp.asarray(rng.uniform(0.5, 2.0, size=m), dtype)
    rho_box = jnp.asarray(rng.uniform(0.05, 0.2, size=n), dtype)
    qp = QPData(H=H, h=jnp.zeros(n, dtype), A=A,
                al=jnp.zeros(m, dtype), au=jnp.zeros(m, dtype),
                xl=jnp.full(n, -1.0, dtype), xu=jnp.full(n, 1.0, dtype))
    K = _build_kkt(qp, rho, rho_box, sigma)
    b = jnp.asarray(rng.normal(size=n + m), dtype)
    return K, b


def test_structure_permutation_covers_kkt():
    """Every KKT row lands in exactly one block (or the border)."""
    for tr in (_kite_tr(), _parking_tr(), _kite_tr(8)):
        st = _structure_of(tr)
        seen = [i for blk in st.perm for i in blk if i != st.K]
        seen += list(st.border)
        assert sorted(seen) == list(range(st.K))
        assert st.n == tr.nlp.n and st.m == tr.nlp.m


@pytest.mark.parametrize("mk,segments", [
    (_kite_tr, 2), (_kite_tr, 8), (_parking_tr, 2), (_parking_tr, 4)])
def test_gather_captures_all_nonzeros(mk, segments):
    """The BBT storage must capture every nonzero of the permuted KKT —
    i.e. reconstructing the dense matrix from (Td, Oh, C, Dp) is exact.
    This is the sparsity-pattern claim of continuous_ocp.hpp:341-376 in
    test form."""
    tr = mk(segments)
    st = _structure_of(tr)
    K, _ = _kkt_of(tr)
    Td, Oh, C, Dp, _, _ = gather_blocks(K, jnp.zeros(st.K), st)
    # rebuild the permuted dense matrix
    S, k, a, nx = st.S, st.k, st.a, st.nx
    full = np.zeros((S * k + a, S * k + a))
    for s in range(S):
        full[s * k:(s + 1) * k, s * k:(s + 1) * k] = np.asarray(Td[s])
        if s > 0:
            O = np.asarray(Oh[s - 1])
            bxp = st.bx[s - 1]
            full[s * k:(s + 1) * k,
                 (s - 1) * k + bxp:(s - 1) * k + bxp + nx] = O
            full[(s - 1) * k + bxp:(s - 1) * k + bxp + nx,
                 s * k:(s + 1) * k] = O.T
        if a:
            full[s * k:(s + 1) * k, S * k:] = np.asarray(C[s])
            full[S * k:, s * k:(s + 1) * k] = np.asarray(C[s]).T
    if a:
        full[S * k:, S * k:] = np.asarray(Dp)
    # permuted oracle (padding slots -> identity)
    Kx = np.zeros((st.K + 1, st.K + 1))
    Kx[:st.K, :st.K] = np.asarray(K)
    Kx[-1, -1] = 1.0
    idx = np.concatenate([np.asarray(st.perm).reshape(-1),
                          np.asarray(st.border, np.int64)]).astype(np.int64)
    P = Kx[np.ix_(idx, idx)]
    pad = idx == st.K
    P[np.ix_(pad, pad)] = np.eye(int(pad.sum()))
    np.testing.assert_allclose(full, P, atol=1e-12)


@pytest.mark.parametrize("mk,segments", [
    (_kite_tr, 2), (_kite_tr, 8), (_parking_tr, 2), (_parking_tr, 4)])
def test_bbt_jnp_oracle_matches_dense(mk, segments):
    tr = mk(segments)
    st = _structure_of(tr)
    K, b = _kkt_of(tr)
    Td, Oh, C, Dp, bb, bp = gather_blocks(K, b, st)
    xb, xp = bbt_solve_jnp(Td, Oh, C, Dp, bb, bp, st)
    x = scatter_solution(xb, xp, st)
    x_ref = jnp.linalg.solve(K, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=1e-9, rtol=1e-9)


@pytest.mark.parametrize("mk,segments", [
    (_kite_tr, 2), (_kite_tr, 8), (_parking_tr, 2)])
def test_bbt_pallas_solve_matches_dense(mk, segments):
    """The Pallas kernel (interpret mode on CPU) against the dense solve,
    batched with distinct instances per lane."""
    from polympc_tpu.ops.bbt_kernel import bbt_solve_batched
    tr = mk(segments)
    st = _structure_of(tr)
    Ks, bs = [], []
    for seed in range(3):
        K, b = _kkt_of(tr, seed=seed)
        Ks.append(K)
        bs.append(b)
    Kb = jnp.stack(Ks).astype(jnp.float32)
    bb = jnp.stack(bs).astype(jnp.float32)
    x = bbt_solve_batched(Kb, bb, st=st)
    x64 = jnp.linalg.solve(jnp.stack(Ks), jnp.stack(bs)[..., None])[..., 0]
    # same-precision baseline: what a dense fp32 LU loses to roundoff on
    # these (moderately conditioned) random KKTs
    x32 = jnp.linalg.solve(Kb, bb[..., None])[..., 0].astype(jnp.float64)
    err_bbt = float(jnp.max(jnp.abs(x.astype(jnp.float64) - x64)))
    err_lu = float(jnp.max(jnp.abs(x32 - x64)))
    scale = float(jnp.max(jnp.abs(x64)))
    assert err_bbt <= max(10.0 * err_lu, 1e-5 * scale), (err_bbt, err_lu)


def test_bbt_pallas_solve_f64():
    """fp64 path (CPU tests run x64): tight parity."""
    from polympc_tpu.ops.bbt_kernel import bbt_solve_batched
    tr = _parking_tr(2)
    st = _structure_of(tr)
    K, b = _kkt_of(tr, seed=7)
    x = bbt_solve_batched(K[None], b[None], st=st)[0]
    x_ref = jnp.linalg.solve(K, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=1e-9, rtol=1e-9)


def test_bbt_end_to_end_sqp_matches_lu():
    """Batched robot NMPC through SQP with the structured KKT path
    (kkt_solver="pallas" + structure, interpret mode on CPU) must match the
    plain LU path — the full-stack dense_sparse_compare analogue."""
    from polympc_tpu.models import robot_ocp
    from polympc_tpu.nlp import SQPSettings
    from polympc_tpu.ocp import ocp_bounds
    from polympc_tpu.parallel import make_batch_solver
    from polympc_tpu.utils import status as status_mod

    tr = transcribe(robot_ocp(), SegmentedBasis(Chebyshev(5), 2))
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75])
    st = tr.bbt_structure()
    assert st is not None and st.n == tr.nlp.n and st.m == tr.nlp.m

    qp_bbt = dataclasses.replace(
        ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_epochs=30),
        kkt_solver="pallas", structure=st)
    qp_lu = dataclasses.replace(qp_bbt, kkt_solver="lu", structure=None)
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 3)))

    sols = {}
    for name, qp in (("bbt", qp_bbt), ("lu", qp_lu)):
        settings = SQPSettings(hessian="exact", max_iter=40, qp=qp)
        solve = make_batch_solver(tr, bounds, prm, settings)
        sols[name] = solve(x0s)
    assert np.all(np.asarray(sols["bbt"].status) == status_mod.SOLVED)
    np.testing.assert_allclose(np.asarray(sols["bbt"].x),
                               np.asarray(sols["lu"].x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sols["bbt"].cost),
                               np.asarray(sols["lu"].cost), rtol=1e-6)


@pytest.mark.parametrize("mk,segments", [(_kite_tr, 2), (_parking_tr, 2)])
def test_bbt_epoch_matches_dense_epoch(mk, segments):
    """The fused BBT ADMM epoch must produce the same iterates as the dense
    LU reference epoch (same splitting, same projections)."""
    from polympc_tpu.ops.bbt_kernel import bbt_admm_epoch_batched
    tr = mk(segments)
    st = _structure_of(tr)
    nlp = tr.nlp
    n, m = nlp.n, nlp.m
    rng = np.random.default_rng(3)
    K, _ = _kkt_of(tr, seed=3)
    dt = jnp.float64
    sigma, alpha, iters = 1e-6, 1.6, 7
    h = jnp.asarray(rng.normal(size=n), dt)
    al = jnp.asarray(rng.normal(size=m) - 2.0, dt)
    au = al + jnp.asarray(rng.uniform(0.5, 3.0, size=m), dt)
    xl = jnp.full(n, -0.8, dt)
    xu = jnp.full(n, 0.8, dt)
    # rho/rb must match what K was built with (seed=3 kkt_of draws)
    rng2 = np.random.default_rng(3)
    _ = rng2.normal(size=n)
    _ = rng2.normal(size=m)
    rho = jnp.asarray(rng2.uniform(0.5, 2.0, size=m), dt)
    rb = jnp.asarray(rng2.uniform(0.05, 0.2, size=n), dt)
    x = jnp.asarray(rng.normal(size=n) * 0.1, dt)
    z = jnp.asarray(rng.normal(size=m) * 0.1, dt)
    q = x + 0.01
    y = jnp.asarray(rng.normal(size=m) * 0.1, dt)
    yb = jnp.asarray(rng.normal(size=n) * 0.1, dt)

    # dense reference epoch (the LU impl from box_admm, inlined)
    from jax.scipy.linalg import lu_factor, lu_solve
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

    B = 2   # two identical lanes: also checks lane independence
    tile = lambda v: jnp.tile(v[None], (B,) + (1,) * v.ndim)
    xo, zo, qo, yo, ybo = bbt_admm_epoch_batched(
        tile(K), tile(h), tile(al), tile(au), tile(xl), tile(xu),
        tile(rho), tile(rb), tile(x), tile(z), tile(q), tile(y), tile(yb),
        st=st, sigma=sigma, alpha=alpha, iters=iters)
    for got, want, name in ((xo, xr, "x"), (zo, zr, "z"), (qo, qr, "q"),
                            (yo, yr, "y"), (ybo, ybr, "yb")):
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                                   atol=1e-8, rtol=1e-8, err_msg=name)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(got[0]),
                                   atol=0, err_msg=f"{name}: lanes differ")


def test_structure_consistency_check():
    # structure_is_consistent: accepts a real bbt_structure, rejects a
    # corrupted permutation (duplicate / missing indices) of the same shape
    from polympc_tpu.ops.structure import structure_is_consistent
    st = _structure_of(_kite_tr())
    assert structure_is_consistent(st)
    perm = [list(row) for row in st.perm]
    # duplicate the first real index into the second slot
    perm[0][1] = perm[0][0]
    bad = dataclasses.replace(st, perm=tuple(tuple(r) for r in perm))
    assert not structure_is_consistent(bad)
    # wrong block count
    bad2 = dataclasses.replace(st, perm=st.perm[:-1], bx=st.bx[:-1])
    assert not structure_is_consistent(bad2)
