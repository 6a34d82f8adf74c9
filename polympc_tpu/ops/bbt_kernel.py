"""Bordered-block-tridiagonal (BBT) KKT Pallas kernels: the structured
replacement for the dense lane-batched LDL^T (ops/ldlt.py).

The collocation boxADMM KKT, permuted by segment (ops/structure.py), is
block-tridiagonal with *thin* couplings (nx boundary states) plus a dense
border for optimised parameters.  Exploiting it drops

  * factor FLOPs from K^3 to ~K^3/S^2 (each block's scalar LDL^T recurrence
    runs on (k,k,128) tiles, k ~ K/S),
  * per-iteration solve FLOPs from K^2 to ~K^2/S,
  * VMEM from K^2 (quadratic in horizon length) to S*k^2 (linear) — at
    N=41 the dense (492,492,128) factor cannot fit VMEM at all, while the
    BBT storage does,

which is the reference's sparse-KKT story (continuous_ocp.hpp:341-376 nnz
estimators + Eigen SimplicialLDLT in box_admm.hpp:336-349) re-played in
TPU-native form: no sparse formats, just static block structure.

Like ops/admm_epoch.py, the fused epoch kernel keeps the factor VMEM-
resident for a whole ADMM epoch (factor once + ``iters`` iterations).  All
segment loops are unrolled in Python (S is static), so every ref slice is
static.

Layouts (B = 128-lane tile; k sublane-rounded; nxr/ar = nx/a rounded to 8):
  Td     (S*k, k, B)   diagonal blocks, rows on the major axis
  Oh_maj (S*k, nxr, B) couplings, block rows on the major axis
  Oh_sub (S*nxr, k, B) the same couplings, block rows on the sublane axis
  Ct     (S*ar, k, B)  border columns, transposed (border index on major)
  Dp     (ar, ar, B)   border block
  vectors (S*k, B); border vectors (ar, B)

The ADMM iteration runs on *permutation-unified* vectors: primal and dual
rows are interleaved by block, so the x/q/yb (primal) and z/y (dual)
updates are expressed as one elementwise formula gated by a per-row primal
mask — see ``bbt_admm_epoch_batched``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polympc_tpu.ops.ldlt import (
    LANES, _COMPILER_PARAMS, _auto_interpret, _round_up,
)
from polympc_tpu.ops.structure import CollocStructure

__all__ = ["bbt_admm_epoch_batched", "bbt_kernel_fits", "bbt_solve_batched"]


def _ar(st: CollocStructure) -> int:
    return _round_up(st.a, 8) if st.a else 0


def bbt_kernel_fits(st: CollocStructure, bytes_per: int = 4,
                    budget: int = 88 * 1024 * 1024) -> bool:
    """VMEM feasibility of the fused BBT epoch kernel.

    The batch is processed in single-tile (128-lane, grid-free) kernel
    calls — no pipelining, so the working set is exactly one copy of each
    buffer: Td in + the aliased factor out, both Oh layouts, Ct/Dp, the
    W/V/Gp/d/u scratch, and the 22 lane vectors.
    """
    S, k = st.S, st.k
    nxr = st.nxr
    ar = _ar(st) if st.a else 8                  # kernel pads ar_eff to 8
    per_lane = (2 * S * k * k                    # Td in + factor alias out
                + 3 * S * k * nxr                # Oh both layouts + W scratch
                + 2 * S * ar * k + 2 * ar * ar   # Ct + V scratch, Dp + Gp
                + 14 * S * k + 12 * ar) * bytes_per
    return per_lane * LANES <= budget


# ---------------------------------------------------------------------------
# in-kernel primitives (static offsets; all loops over S unrolled in Python)
# ---------------------------------------------------------------------------

def _factor_block(f_ref, d_ref, off: int, k: int):
    """Scalar LDL^T recurrence on rows [off, off+k) of f_ref, in place.
    Rows end packed as L^T (cols > i) with d split out into d_ref."""
    ks = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    def step(i, _):
        row = f_ref[pl.ds(off + i, 1), :, :][0]               # (k, B)
        d = jnp.sum(jnp.where(ks == i, row, 0.0), axis=0, keepdims=True)
        w = jnp.where(ks > i, row, 0.0)
        dinv = 1.0 / d
        blk = f_ref[pl.ds(off, k), :, :]
        f_ref[pl.ds(off, k), :, :] = blk - w[:, None, :] * (w * dinv)[None]
        f_ref[pl.ds(off + i, 1), :, :] = jnp.where(
            ks > i, row * dinv, row)[None]
        d_ref[pl.ds(off + i, 1), :] = d
        return 0

    jax.lax.fori_loop(0, k, step, 0)


def _solve_block(f_ref, d_ref, off: int, k: int, b):
    """Solve (L D L^T) x = b for one factored block; b (k, B) value."""
    ks = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    def fwd(j, y):
        yj = jnp.sum(jnp.where(ks == j, y, 0.0), axis=0, keepdims=True)
        lrow = f_ref[pl.ds(off + j, 1), :, :][0]
        return y - jnp.where(ks > j, lrow, 0.0) * yj

    y = jax.lax.fori_loop(0, k, fwd, b)
    y = y / d_ref[pl.ds(off, k), :]

    def bwd(t, x):
        i = k - 1 - t
        lrow = f_ref[pl.ds(off + i, 1), :, :][0]
        s = jnp.sum(jnp.where(ks > i, lrow * x, 0.0), axis=0, keepdims=True)
        yi = jnp.sum(jnp.where(ks == i, y, 0.0), axis=0, keepdims=True)
        return jnp.where(ks == i, yi - s, x)

    return jax.lax.fori_loop(0, k, bwd, y)


def _solve_block_multi(f_ref, d_ref, off: int, k: int, Bm):
    """Multi-RHS block solve: Bm (r, k, B) value (RHS index on the major
    axis, block rows on sublanes) -> X (r, k, B).  One sweep serves all r
    right-hand sides (r-fold parallel VPU FMAs)."""
    ks = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)

    def fwd(j, y):
        yj = jnp.sum(jnp.where(ks == j, y, 0.0), axis=1, keepdims=True)
        lrow = f_ref[pl.ds(off + j, 1), :, :]                 # (1, k, B)
        return y - jnp.where(ks > j, lrow, 0.0) * yj

    y = jax.lax.fori_loop(0, k, fwd, Bm)
    y = y / d_ref[pl.ds(off, k), :][None]

    def bwd(t, x):
        i = k - 1 - t
        lrow = f_ref[pl.ds(off + i, 1), :, :]
        s = jnp.sum(jnp.where(ks > i, lrow * x, 0.0), axis=1, keepdims=True)
        yi = jnp.sum(jnp.where(ks == i, y, 0.0), axis=1, keepdims=True)
        return jnp.where(ks == i, yi - s, x)

    return jax.lax.fori_loop(0, k, bwd, y)


def _invert_small(Sp, ar: int):
    """Gauss-Jordan inverse of an (ar, ar, B) value (unpivoted — the border
    Schur complement of a quasi-definite KKT is strongly factorisable;
    padding rows are exact identity)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (ar, ar, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (ar, ar, 1), 1)
    eye = jnp.where(ri == ci, jnp.ones((), Sp.dtype),
                    jnp.zeros((), Sp.dtype))
    Inv = jnp.broadcast_to(eye, Sp.shape)

    def step(i, carry):
        A, Inv = carry
        piv = jnp.sum(jnp.where(ri == i, A, 0.0), axis=0, keepdims=True)
        pivI = jnp.sum(jnp.where(ri == i, Inv, 0.0), axis=0, keepdims=True)
        d = jnp.sum(jnp.where(ci == i, piv, 0.0), axis=1, keepdims=True)
        piv = piv / d
        pivI = pivI / d
        colf = jnp.sum(jnp.where(ci == i, A, 0.0), axis=1, keepdims=True)
        colf = jnp.where(ri == i, 0.0, colf)
        A = A - colf * piv
        Inv = Inv - colf * pivI
        A = jnp.where(ri == i, piv, A)
        Inv = jnp.where(ri == i, pivI, Inv)
        return A, Inv

    _, Inv = jax.lax.fori_loop(0, ar, step, (Sp, Inv))
    return Inv


def _bbt_factor(st: CollocStructure, f_ref, d_ref, ohm_ref, ohs_ref,
                ct_ref, dp_ref, w_ref, v_ref, gp_ref):
    """Factor the BBT system in place.

    After this call: f_ref/d_ref hold the per-block packed factors of the
    Schur-updated diagonals, w_ref = T~^{-1} E per block (transposed),
    v_ref = T~^{-1} C~ (transposed), ct_ref = updated border columns C~,
    gp_ref = the INVERSE of the border Schur complement.
    """
    S, k, nx, a = st.S, st.k, st.nx, st.a
    nxr, ar = st.nxr, _ar(st)
    dt = d_ref.dtype

    sp = dp_ref[...] if a else None            # (ar, ar, B) accumulator

    for s in range(S):
        off = s * k
        if s > 0:
            bxp = st.bx[s - 1]
            # T_s -= O_s (E' T~^{-1} E) O_s'   as nx^2 rank-1 terms
            for e in range(nx):
                for f in range(nx):
                    g_ef = w_ref[pl.ds((s - 1) * nxr + f, 1),
                                 pl.ds(bxp + e, 1), :]        # (1, 1, B)
                    col_e = ohm_ref[pl.ds(off, k), pl.ds(e, 1), :]  # (k,1,B)
                    row_f = ohs_ref[pl.ds(s * nxr + f, 1), :, :]    # (1,k,B)
                    f_ref[pl.ds(off, k), :, :] = (
                        f_ref[pl.ds(off, k), :, :] - g_ef * col_e * row_f)
            if a:
                # C~_s -= O_s (E' T~^{-1} C~_{s-1})
                for c in range(a):
                    for e in range(nx):
                        ev = v_ref[pl.ds((s - 1) * ar + c, 1),
                                   pl.ds(bxp + e, 1), :]      # (1, 1, B)
                        row_e = ohs_ref[pl.ds(s * nxr + e, 1), :, :]
                        ct_ref[pl.ds(s * ar + c, 1), :, :] = (
                            ct_ref[pl.ds(s * ar + c, 1), :, :] - ev * row_e)

        _factor_block(f_ref, d_ref, off, k)

        # W_s = T~^{-1} E  (unit RHS rows at the boundary-x positions)
        er = jax.lax.broadcasted_iota(jnp.int32, (nxr, k, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (nxr, k, 1), 1)
        E = jnp.where((cols == st.bx[s] + er) & (er < nx),
                      jnp.ones((), dt), jnp.zeros((), dt))
        E = jnp.broadcast_to(E, (nxr, k, f_ref.shape[-1]))
        w_ref[pl.ds(s * nxr, nxr), :, :] = _solve_block_multi(
            f_ref, d_ref, off, k, E)

        if a:
            v_ref[pl.ds(s * ar, ar), :, :] = _solve_block_multi(
                f_ref, d_ref, off, k, ct_ref[pl.ds(s * ar, ar), :, :])
            # Sp -= C~_s' T~^{-1} C~_s = C~_s' V_s
            for c in range(a):
                row_c = jnp.concatenate([
                    jnp.sum(ct_ref[pl.ds(s * ar + c, 1), :, :]
                            * v_ref[pl.ds(s * ar + dd, 1), :, :],
                            axis=1, keepdims=True)            # (1, 1, B)
                    for dd in range(a)], axis=1)              # (1, a, B)
                if ar > a:
                    row_c = jnp.concatenate(
                        [row_c, jnp.zeros((1, ar - a, row_c.shape[-1]), dt)],
                        axis=1)
                ri = jax.lax.broadcasted_iota(
                    jnp.int32, (ar, 1, 1), 0)
                sp = sp - jnp.where(ri == c, row_c, 0.0)

    if a:
        # identity padding beyond a, then invert
        ri = jax.lax.broadcasted_iota(jnp.int32, (ar, ar, 1), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (ar, ar, 1), 1)
        eye = jnp.where(ri == ci, jnp.ones((), dt), jnp.zeros((), dt))
        pad = (ri >= a) | (ci >= a)
        sp = jnp.where(pad, jnp.broadcast_to(eye, sp.shape), sp)
        gp_ref[...] = _invert_small(sp, ar)


def _bbt_solve(st: CollocStructure, f_ref, d_ref, ohs_ref, ct_ref,
               w_ref, v_ref, gp_ref, u_ref, b, bp):
    """Solve the factored BBT system: b (S*k, B), bp (ar, B) values.
    Returns (x (S*k, B) read back from u_ref, xp (ar, B))."""
    S, k, nx, a = st.S, st.k, st.nx, st.a
    nxr, ar = st.nxr, _ar(st)

    bph = bp
    for s in range(S):
        off = s * k
        y = b[off:off + k]
        if s > 0:
            poff = (s - 1) * k
            bxp = st.bx[s - 1]
            for e in range(nx):
                u_e = u_ref[pl.ds(poff + bxp + e, 1), :]      # (1, B)
                row_e = ohs_ref[pl.ds(s * nxr + e, 1), :, :][0]
                y = y - u_e * row_e
        u_ref[pl.ds(off, k), :] = _solve_block(f_ref, d_ref, off, k, y)
        if a:
            rows = jax.lax.broadcasted_iota(jnp.int32, (ar, 1), 0)
            for c in range(a):
                acc = jnp.sum(
                    ct_ref[pl.ds(s * ar + c, 1), :, :][0]
                    * u_ref[pl.ds(off, k), :],
                    axis=0, keepdims=True)                    # (1, B)
                bph = bph - jnp.where(rows == c, acc, 0.0)

    if a:
        rows = jax.lax.broadcasted_iota(jnp.int32, (ar, 1), 0)
        xp = jnp.zeros_like(bp)
        for c in range(a):
            acc = jnp.zeros_like(bp[:1])
            for dd in range(a):
                acc = acc + gp_ref[pl.ds(c, 1), pl.ds(dd, 1), :][0] \
                    * bph[dd:dd + 1, :]
            xp = xp + jnp.where(rows == c, acc, 0.0)
    else:
        xp = bp

    for s in reversed(range(S)):
        off = s * k
        x = u_ref[pl.ds(off, k), :]
        if a:
            for c in range(a):
                x = x - xp[c:c + 1, :] * v_ref[pl.ds(s * ar + c, 1), :, :][0]
        if s < S - 1:
            noff = (s + 1) * k
            for e in range(nx):
                t_e = jnp.sum(
                    ohs_ref[pl.ds((s + 1) * nxr + e, 1), :, :][0]
                    * u_ref[pl.ds(noff, k), :],
                    axis=0, keepdims=True)                    # (1, B)
                x = x - t_e * w_ref[pl.ds(s * nxr + e, 1), :, :][0]
        u_ref[pl.ds(off, k), :] = x
    return xp


# ---------------------------------------------------------------------------
# fused ADMM epoch kernel
# ---------------------------------------------------------------------------

def _epoch_body(st: CollocStructure, sigma, alpha, iters,
                td_ref, ohm_ref, ohs_ref, ct_ref, dp_ref,
                h_ref, lo_ref, hi_ref, rv_ref, pm_ref,
                x_ref, v_ref, yv_ref,
                hp_ref, lop_ref, hip_ref, rvp_ref, pmp_ref,
                xp_ref, vp_ref, yvp_ref,
                xo_ref, vo_ref, yvo_ref,
                xpo_ref, vpo_ref, yvpo_ref, f_alias_ref,
                d_scr, w_scr, vv_scr, gp_scr, u_scr):
    # f_alias_ref aliases td_ref (input_output_aliases): factor in place
    _bbt_factor(st, f_alias_ref, d_scr, ohm_ref, ohs_ref, ct_ref, dp_ref,
                w_scr, vv_scr, gp_scr)

    h, lo, hi = h_ref[...], lo_ref[...], hi_ref[...]
    rv, pm = rv_ref[...], pm_ref[...]
    hp, lop, hip = hp_ref[...], lop_ref[...], hip_ref[...]
    rvp, pmp = rvp_ref[...], pmp_ref[...]
    rv_inv = 1.0 / rv
    rvp_inv = 1.0 / rvp

    def it(_, state):
        x, v, yv, xb, vb, yvb = state
        rhs = pm * (sigma * x + rv * v - yv - h) \
            + (1.0 - pm) * (v - yv * rv_inv)
        rhsp = pmp * (sigma * xb + rvp * vb - yvb - hp) \
            + (1.0 - pmp) * (vb - yvb * rvp_inv)
        solp = _bbt_solve(st, f_alias_ref, d_scr, ohs_ref, ct_ref,
                          w_scr, vv_scr, gp_scr, u_scr, rhs, rhsp)
        sol = u_scr[...]

        def upd(sol, x, v, yv, pm, rv, rv_inv, lo, hi):
            t = pm * sol + (1.0 - pm) * (v + (sol - yv) * rv_inv)
            x_new = pm * (alpha * sol + (1.0 - alpha) * x) \
                + (1.0 - pm) * x
            v_u = alpha * t + (1.0 - alpha) * v
            v_new = jnp.clip(v_u + yv * rv_inv, lo, hi)
            yv_new = yv + rv * (v_u - v_new)
            return x_new, v_new, yv_new

        x, v, yv = upd(sol, x, v, yv, pm, rv, rv_inv, lo, hi)
        xb, vb, yvb = upd(solp, xb, vb, yvb, pmp, rvp, rvp_inv, lop, hip)
        return x, v, yv, xb, vb, yvb

    out = jax.lax.fori_loop(
        0, iters, it,
        (x_ref[...], v_ref[...], yv_ref[...],
         xp_ref[...], vp_ref[...], yvp_ref[...]))
    xo_ref[...], vo_ref[...], yvo_ref[...] = out[0], out[1], out[2]
    xpo_ref[...], vpo_ref[...], yvpo_ref[...] = out[3], out[4], out[5]


def _solve_only_body(st: CollocStructure,
                     td_ref, ohm_ref, ohs_ref, ct_ref, dp_ref,
                     b_ref, bp_ref, xo_ref, xpo_ref, f_alias_ref,
                     d_scr, w_scr, vv_scr, gp_scr, u_scr):
    """Factor + single solve (for parity tests and one-shot solves)."""
    _bbt_factor(st, f_alias_ref, d_scr, ohm_ref, ohs_ref, ct_ref, dp_ref,
                w_scr, vv_scr, gp_scr)
    xp = _bbt_solve(st, f_alias_ref, d_scr, ohs_ref, ct_ref,
                    w_scr, vv_scr, gp_scr, u_scr, b_ref[...], bp_ref[...])
    xo_ref[...] = u_scr[...]
    xpo_ref[...] = xp


# ---------------------------------------------------------------------------
# host-side gather/permute helpers (batch-major in, lane-layout out)
# ---------------------------------------------------------------------------

def _gather_mats(kkt, st: CollocStructure):
    """(B, K, K) -> lane-layout BBT block storage (zero-padded sentinel)."""
    B = kkt.shape[0]
    dt = kkt.dtype
    S, k, nx, a = st.S, st.k, st.nx, st.a
    nxr, ar = st.nxr, _ar(st)
    Kx = jnp.pad(kkt, ((0, 0), (0, 1), (0, 1)))   # sentinel row/col = 0
    perm = jnp.asarray(st.perm, jnp.int32)

    Td = Kx[:, perm[:, :, None], perm[:, None, :]]            # (B, S, k, k)
    pad = perm == st.K
    pad2 = pad[:, :, None] | pad[:, None, :]
    Td = jnp.where(pad2[None], jnp.eye(k, dtype=dt)[None, None], Td)
    Td = Td.reshape(B, S * k, k)

    # coupling column indices: boundary x of block s-1 (padded cols -> 0)
    sent = jnp.full((1,), st.K, jnp.int32)
    if S > 1:
        bxg = jnp.stack([
            jnp.concatenate([perm[s, st.bx[s]:st.bx[s] + nx],
                             jnp.tile(sent, (nxr - nx,))])
            for s in range(S - 1)])                            # (S-1, nxr)
        bxg = jnp.concatenate([jnp.tile(sent, (1, nxr)).reshape(1, nxr)
                               if False else
                               jnp.full((1, nxr), st.K, jnp.int32), bxg])
    else:
        bxg = jnp.full((1, nxr), st.K, jnp.int32)
    # ohm[s, i, e] = K[perm[s, i], bxg[s, e]]  (block 0 slice reads zeros)
    ohm = Kx[:, perm[:, :, None], bxg[:, None, :]].reshape(B, S * k, nxr)
    # ohs[s, e, i] = same, transposed layout
    ohs = Kx[:, bxg[:, :, None], perm[:, None, :]].reshape(B, S * nxr, k)

    if a:
        bd = jnp.concatenate([jnp.asarray(st.border, jnp.int32),
                              jnp.tile(sent, (ar - a,))])
        ct = Kx[:, bd[None, :, None], perm[:, None, :]].reshape(B, S * ar, k)
        Dp = Kx[:, bd[:, None], bd[None, :]]
        ri = jnp.arange(ar)
        padb = (ri >= a)
        pad2b = padb[:, None] | padb[None, :]
        Dp = jnp.where(pad2b[None], jnp.eye(ar, dtype=dt)[None], Dp)
    else:
        ar1 = 8     # minimal tile so the kernel signature stays uniform
        ct = jnp.zeros((B, S * ar1, k), dt)
        Dp = jnp.broadcast_to(jnp.eye(ar1, dtype=dt)[None], (B, ar1, ar1))
    return Td, ohm, ohs, ct, Dp


def _perm_vec_idx(st: CollocStructure):
    """Static (S*k,) gather indices for row vectors (sentinel = K)."""
    return np.asarray(st.perm, np.int64).reshape(-1)


def _lanes(v):
    return jnp.moveaxis(v, 0, -1)


def _unlanes(v):
    return jnp.moveaxis(v, -1, 0)


def _map_lane_chunks(one_tile, n_chunks: int, args):
    """Run a single-tile (128-lane) kernel over the batch in chunks.

    Lane-layout arrays (..., n_chunks*LANES) are split along the trailing
    lane axis and the kernel runs once per chunk via ``lax.map`` — each
    call is grid-free, so Mosaic allocates exactly one VMEM window per
    buffer (no double-buffered pipelining, which at S >= 8 would blow the
    scoped-VMEM budget).  Outputs are re-joined along the lane axis.
    """
    if n_chunks == 1:
        return one_tile(args)

    def split(v):
        # (..., C*LANES) -> (C, ..., LANES)
        vc = v.reshape(v.shape[:-1] + (n_chunks, LANES))
        return jnp.moveaxis(vc, -2, 0)

    outs = jax.lax.map(one_tile, tuple(split(v) for v in args))

    def join(v):
        # (C, ..., LANES) -> (..., C*LANES)
        return jnp.moveaxis(v, 0, -2).reshape(v.shape[1:-1] + (-1,))

    return tuple(join(o) for o in outs)


@functools.partial(
    jax.jit, static_argnames=("st", "sigma", "alpha", "iters", "interpret"))
def bbt_admm_epoch_batched(kkt, h, al, au, xl, xu, rho, rb, x, z, q, y, yb,
                           *, st: CollocStructure, sigma, alpha, iters,
                           interpret=None):
    """Fused BBT ADMM epoch on a batch (same contract as
    ops/admm_epoch.py:admm_epoch_batched, structured KKT path).

    kkt (B, n+m, n+m) for the current rho; vectors batch-major.
    Returns the new (x, z, q, y, yb).
    """
    if interpret is None:
        interpret = _auto_interpret()
    B, n = h.shape
    m = al.shape[1]
    dt = kkt.dtype
    S, k, a = st.S, st.k, st.a
    nxr, ar = st.nxr, _ar(st)
    ar_eff = ar if a else 8
    Bp = _round_up(max(B, LANES), LANES)
    inf = jnp.asarray(jnp.inf, dt)

    # ---- permutation-unified row vectors (primal rows then dual rows) ----
    ones_n = jnp.ones((B, n), dt)
    zeros_m = jnp.zeros((B, m), dt)
    hc = jnp.concatenate([h, zeros_m], axis=1)
    lo = jnp.concatenate([xl, al], axis=1)
    hi = jnp.concatenate([xu, au], axis=1)
    rv = jnp.concatenate([rb, rho], axis=1)
    pm = jnp.concatenate([ones_n, zeros_m], axis=1)
    xc = jnp.concatenate([x, zeros_m], axis=1)
    vc = jnp.concatenate([q, z], axis=1)
    yvc = jnp.concatenate([yb, y], axis=1)

    pidx = _perm_vec_idx(st)
    bd = np.asarray(st.border, np.int64)

    def permute(vec, fill):
        vx = jnp.concatenate(
            [vec, jnp.full((B, 1), fill, dt)], axis=1)
        main = vx[:, pidx]                                    # (B, S*k)
        if a:
            bord = vec[:, bd]
            bord = jnp.concatenate(
                [bord, jnp.full((B, ar - a), fill, dt)], axis=1)
        else:
            bord = jnp.full((B, ar_eff), fill, dt)
        return main, bord

    # padding-row config: inert primal rows (identity KKT row, free bounds)
    hm, hb = permute(hc, 0.0)
    lom, lob = permute(lo, -inf)
    him, hib = permute(hi, inf)
    rvm, rvb = permute(rv, 1.0)
    pmm, pmb = permute(pm, 1.0)
    xm, xb = permute(xc, 0.0)
    vm, vb = permute(vc, 0.0)
    yvm, yvb = permute(yvc, 0.0)

    Td, ohm, ohs, ct, Dp = _gather_mats(kkt, st)

    def lane_pad(vmat, fill=0.0):
        if Bp != B:
            vmat = jnp.concatenate(
                [vmat, jnp.full((Bp - B,) + vmat.shape[1:], fill, dt)],
                axis=0)
        return _lanes(vmat)

    # padded lanes get identity blocks (Td eye) so the factor stays finite
    if Bp != B:
        eyeTd = jnp.broadcast_to(
            jnp.tile(jnp.eye(k, dtype=dt), (S, 1))[None],
            (Bp - B, S * k, k))
        Td = jnp.concatenate([Td, eyeTd], axis=0)
        ohm = jnp.concatenate(
            [ohm, jnp.zeros((Bp - B, S * k, nxr), dt)], axis=0)
        ohs = jnp.concatenate(
            [ohs, jnp.zeros((Bp - B, S * nxr, k), dt)], axis=0)
        ct = jnp.concatenate(
            [ct, jnp.zeros((Bp - B,) + ct.shape[1:], dt)], axis=0)
        Dp = jnp.concatenate(
            [Dp, jnp.broadcast_to(jnp.eye(ar_eff, dtype=dt)[None],
                                  (Bp - B, ar_eff, ar_eff))], axis=0)
        lom_p, lob_p = -inf, -inf
    Tdl, ohml, ohsl = _lanes(Td), _lanes(ohm), _lanes(ohs)
    ctl, Dpl = _lanes(ct), _lanes(Dp)

    hml = lane_pad(hm)
    loml = lane_pad(lom, -jnp.inf)
    himl = lane_pad(him, jnp.inf)
    rvml = lane_pad(rvm, 1.0)
    pmml = lane_pad(pmm, 1.0)
    xml, vml, yvml = lane_pad(xm), lane_pad(vm), lane_pad(yvm)
    hbl = lane_pad(hb)
    lobl = lane_pad(lob, -jnp.inf)
    hibl = lane_pad(hib, jnp.inf)
    rvbl = lane_pad(rvb, 1.0)
    pmbl = lane_pad(pmb, 1.0)
    xbl, vbl, yvbl = lane_pad(xb), lane_pad(vb), lane_pad(yvb)

    lanes = LANES
    Sk = S * k

    def mat_spec(rows, cols):
        return pl.BlockSpec((rows, cols, lanes), lambda: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def vec_spec(rows):
        return pl.BlockSpec((rows, lanes), lambda: (0, 0),
                            memory_space=pltpu.VMEM)

    body = functools.partial(_epoch_body, st, float(sigma), float(alpha),
                             int(iters))

    def one_tile(args):
        """Single 128-lane tile (no grid => no double-buffered windows:
        the VMEM working set is exactly one copy of each buffer)."""
        return pl.pallas_call(
            body,
            in_specs=[mat_spec(Sk, k), mat_spec(Sk, nxr),
                      mat_spec(S * nxr, k), mat_spec(S * ar_eff, k),
                      mat_spec(ar_eff, ar_eff)]
            + [vec_spec(Sk)] * 8 + [vec_spec(ar_eff)] * 8,
            out_specs=(vec_spec(Sk),) * 3 + (vec_spec(ar_eff),) * 3
            + (mat_spec(Sk, k),),
            out_shape=(jax.ShapeDtypeStruct((Sk, lanes), dt),) * 3
            + (jax.ShapeDtypeStruct((ar_eff, lanes), dt),) * 3
            + (jax.ShapeDtypeStruct((Sk, k, lanes), dt),),
            input_output_aliases={0: 6},   # Td buffer reused as the factor
            scratch_shapes=[
                pltpu.VMEM((Sk, lanes), dt),                # d
                pltpu.VMEM((S * nxr, k, lanes), dt),        # W
                pltpu.VMEM((S * ar_eff, k, lanes), dt),     # V
                pltpu.VMEM((ar_eff, ar_eff, lanes), dt),    # Gp
                pltpu.VMEM((Sk, lanes), dt),                # u
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(*args)

    outs = _map_lane_chunks(
        one_tile, Bp // lanes,
        (Tdl, ohml, ohsl, ctl, Dpl,
         hml, loml, himl, rvml, pmml, xml, vml, yvml,
         hbl, lobl, hibl, rvbl, pmbl, xbl, vbl, yvbl))
    xo, vo, yvo, xbo, vbo, yvbo, _ = outs

    # ---- un-permute back to (x, z, q, y, yb) batch-major ----
    def unpermute(main_l, bord_l, fill=0.0):
        main = _unlanes(main_l)[:B]                           # (B, S*k)
        out = jnp.full((B, st.K + 1), fill, dt)
        out = out.at[:, pidx].set(main)
        if a:
            bord = _unlanes(bord_l)[:B][:, :a]
            out = out.at[:, bd].set(bord)
        return out[:, :st.K]

    xc2 = unpermute(xo, xbo)
    vc2 = unpermute(vo, vbo)
    yvc2 = unpermute(yvo, yvbo)
    return (xc2[:, :n], vc2[:, n:], vc2[:, :n], yvc2[:, n:], yvc2[:, :n])


@functools.partial(jax.jit, static_argnames=("st", "interpret"))
def bbt_solve_batched(kkt, b, *, st: CollocStructure, interpret=None):
    """Factor + single solve of batched BBT KKT systems: (B, K, K), (B, K)
    -> (B, K).  The parity/primitive entry point (the fused epoch above is
    the production path)."""
    if interpret is None:
        interpret = _auto_interpret()
    B, K = b.shape
    dt = kkt.dtype
    S, k, a = st.S, st.k, st.a
    nxr, ar = st.nxr, _ar(st)
    ar_eff = ar if a else 8
    Bp = _round_up(max(B, LANES), LANES)
    Sk = S * k

    pidx = _perm_vec_idx(st)
    bd = np.asarray(st.border, np.int64)
    bxv = jnp.pad(b, ((0, 0), (0, 1)))
    bm = bxv[:, pidx]
    bb = (jnp.concatenate([b[:, bd], jnp.zeros((B, ar - a), dt)], axis=1)
          if a else jnp.zeros((B, ar_eff), dt))

    Td, ohm, ohs, ct, Dp = _gather_mats(kkt, st)

    def lane_pad(vmat, eye_blocks=False):
        if Bp != B:
            if eye_blocks:
                fillv = jnp.broadcast_to(
                    jnp.tile(jnp.eye(vmat.shape[-1], dtype=dt),
                             (vmat.shape[1] // vmat.shape[-1], 1))[None],
                    (Bp - B,) + vmat.shape[1:])
            else:
                fillv = jnp.zeros((Bp - B,) + vmat.shape[1:], dt)
            vmat = jnp.concatenate([vmat, fillv], axis=0)
        return _lanes(vmat)

    body = functools.partial(_solve_only_body, st)
    lanes = LANES

    def mat_spec(rows, cols):
        return pl.BlockSpec((rows, cols, lanes), lambda: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def vec_spec(rows):
        return pl.BlockSpec((rows, lanes), lambda: (0, 0),
                            memory_space=pltpu.VMEM)

    def one_tile(args):
        return pl.pallas_call(
            body,
            in_specs=[mat_spec(Sk, k), mat_spec(Sk, nxr),
                      mat_spec(S * nxr, k), mat_spec(S * ar_eff, k),
                      mat_spec(ar_eff, ar_eff),
                      vec_spec(Sk), vec_spec(ar_eff)],
            out_specs=(vec_spec(Sk), vec_spec(ar_eff), mat_spec(Sk, k)),
            out_shape=(jax.ShapeDtypeStruct((Sk, lanes), dt),
                       jax.ShapeDtypeStruct((ar_eff, lanes), dt),
                       jax.ShapeDtypeStruct((Sk, k, lanes), dt)),
            input_output_aliases={0: 2},
            scratch_shapes=[
                pltpu.VMEM((Sk, lanes), dt),
                pltpu.VMEM((S * nxr, k, lanes), dt),
                pltpu.VMEM((S * ar_eff, k, lanes), dt),
                pltpu.VMEM((ar_eff, ar_eff, lanes), dt),
                pltpu.VMEM((Sk, lanes), dt),
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(*args)

    xo, xpo, _ = _map_lane_chunks(
        one_tile, Bp // lanes,
        (lane_pad(Td, eye_blocks=True), lane_pad(ohm), lane_pad(ohs),
         lane_pad(ct), lane_pad(Dp, eye_blocks=True),
         lane_pad(bm.reshape(B, Sk)), lane_pad(bb)))

    xm = _unlanes(xo)[:B]
    out = jnp.zeros((B, st.K + 1), dt)
    out = out.at[:, pidx].set(xm)
    if a:
        out = out.at[:, bd].set(_unlanes(xpo)[:B][:, :a])
    return out[:, :st.K]
