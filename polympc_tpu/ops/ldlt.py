"""Batched LDL^T factor/solve Pallas kernels for ADMM KKT systems.

The boxADMM KKT matrix  [[H + sigma*I + diag(rho_box), A'], [A, -diag(1/rho)]]
(ref: box_admm.hpp:207-310) is symmetric *quasi-definite* by construction
(sigma*I and -1/rho blocks), which licenses unpivoted LDL^T (Vanderbei 1995)
— exactly why the reference can use Eigen's unpivoted SimplicialLDLT
(box_admm.hpp:336-349).

The TPU regime is the opposite of the reference's: not one sparse KKT per
process but *thousands of small dense* KKT systems, one per vmapped MPC
instance.  These kernels lay the batch along the TPU's 128-wide lane axis:

  - matrices live as (K, K, B) tiles — element (i, j) of 128 instances is one
    VPU vector — so the O(K^3) scalar factorization recurrence becomes K
    symmetric rank-1 updates on (K, K, 128) VMEM-resident tiles, and every
    lane factors a different problem instance;
  - forward/backward substitution is column-oriented, sweeping rows of the
    packed L^T storage, again one VPU vector per 128 instances;
  - the factor never leaves VMEM between the factor and solve sweeps of one
    ``ldlt_factor_solve`` call.

Storage convention (packed, one square + one diagonal per instance):
  F[i, k] = L[k, i]   for k > i     (L^T in the upper triangle)
  d[i]    = D[i, i]                 (separate (K,) diagonal)
  lower triangle of F = unspecified (never read)

Public entry points take standard batch-major layout (B, K, K)/(B, K) and
handle lane/sublane padding; the ``*_lanes`` variants take pre-transposed
(K, K, B) tiles for callers (the fused ADMM kernel) that keep lane layout
end-to-end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ldlt_factor", "ldlt_solve", "ldlt_factor_solve", "ldlt_inverse"]

LANES = 128

# Per-kernel VMEM ceiling requested from the Mosaic compiler.  The default
# scoped-VMEM limit is 16 MB, which a (K,K,128) KKT tile already exceeds for
# K ~ 136 (kite NMPF); v5e has 128 MB of VMEM per core, so requesting 100 MB
# for these single-grid-dimension kernels is safe and lets the factor stay
# resident.
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)

# conservative planning budget for pallas_fits: the Mosaic accounting charges
# input AND output matrix blocks (aliasing does not merge the VMEM windows)
# and double-buffers across grid steps -> ~4 matrix blocks in flight
_VMEM_BUDGET_BYTES = 88 * 1024 * 1024


def _auto_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_fits(K: int, n_mats: int = 4, n_vecs: int = 48,
                bytes_per: int = 4) -> bool:
    """True if a kernel whose in-flight working set is n_mats (K,K,128)
    blocks + n_vecs (K,128) vectors fits the requested VMEM ceiling.  Pallas
    TPU requires 128-wide lane blocks, so when this is False callers must
    fall back to the XLA (LU) path — there is no narrower-tile escape hatch."""
    per_lane = (n_mats * K * K + n_vecs * K) * bytes_per
    return per_lane * LANES <= _VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# kernel bodies (operate on (K, K, B) refs, B = lane-tile)
# ---------------------------------------------------------------------------

def _factor_body(m_ref, f_ref, d_ref):
    K = m_ref.shape[0]
    f_ref[...] = m_ref[...]
    ks = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    def step(i, _):
        row = f_ref[pl.ds(i, 1), :, :][0]                     # (K, B)
        # masked reduction instead of dynamic_slice on a value: Pallas TPU
        # lowering supports pl.ds on refs but not lax.dynamic_slice on values
        d = jnp.sum(jnp.where(ks == i, row, 0.0), axis=0, keepdims=True)
        w = jnp.where(ks > i, row, 0.0)                       # trailing col
        dinv = 1.0 / d
        # symmetric trailing rank-1 update: F[j,k] -= w[j] w[k] / d  (j,k > i;
        # w is zero at j <= i so the masked outer product is exact)
        f_ref[...] = f_ref[...] - w[:, None, :] * (w * dinv)[None, :, :]
        # pack L^T into row i: F[i,k] = M[i,k]/d for k > i
        f_ref[pl.ds(i, 1), :, :] = jnp.where(ks > i, row * dinv, row)[None]
        d_ref[pl.ds(i, 1), :] = d
        return 0

    jax.lax.fori_loop(0, K, step, 0)


def _solve_sweeps(f_ref, d_ref, b):
    """Forward + diagonal + backward substitution on one lane tile.

    b: (K, B) value.  Returns x solving (L D L^T) x = b.
    """
    K = f_ref.shape[0]
    ks = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    # L y = b, column-oriented: after step j, y[:j+1] is final.
    # (masked row-select/insert throughout: lax.dynamic_slice/_update_slice
    # on values have no Pallas TPU lowering)
    def fwd(j, y):
        yj = jnp.sum(jnp.where(ks == j, y, 0.0), axis=0, keepdims=True)
        lrow = f_ref[pl.ds(j, 1), :, :][0]          # L[k,j] at entries k > j
        return y - jnp.where(ks > j, lrow, 0.0) * yj

    y = jax.lax.fori_loop(0, K, fwd, b)
    y = y / d_ref[...]

    # L^T x = y, row-oriented from the bottom: x[i] = y[i] - sum_{j>i} L[j,i] x[j]
    def bwd(t, x):
        i = K - 1 - t
        lrow = f_ref[pl.ds(i, 1), :, :][0]
        s = jnp.sum(jnp.where(ks > i, lrow * x, 0.0), axis=0, keepdims=True)
        yi = jnp.sum(jnp.where(ks == i, y, 0.0), axis=0, keepdims=True)
        return jnp.where(ks == i, yi - s, x)

    return jax.lax.fori_loop(0, K, bwd, y)


def _inverse_sweeps(f_ref, d_ref, inv_ref):
    """Explicit inverse of (L D L^T) into inv_ref (K, K, B): block-RHS
    forward/backward substitution on the identity, all K columns at once.

    Each sweep step is a (K, K, lanes) fused multiply-add — dense VPU work —
    instead of the (K, lanes) vector ops of :func:`_solve_sweeps`; callers
    that apply the factor many times (the fused ADMM epoch) turn their
    per-iteration triangular sweeps (2K latency-bound steps) into a single
    matvec against this inverse.
    """
    K = f_ref.shape[0]
    ks = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
    B = inv_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K, B), 1)
    inv_ref[...] = jnp.where(rows == cols, 1.0, 0.0).astype(
        inv_ref.dtype)  # identity per lane

    def fwd(j, _):
        y = inv_ref[...]
        yj = jnp.sum(jnp.where(ks == j, y, 0.0), axis=0, keepdims=True)
        lcol = f_ref[pl.ds(j, 1), :, :][0]            # (K, B): L[k,j], k > j
        mask = jnp.where(ks[:, 0, :] > j, lcol, 0.0)  # (K, B)
        inv_ref[...] = y - mask[:, None, :] * yj
        return 0

    jax.lax.fori_loop(0, K, fwd, 0)
    inv_ref[...] = inv_ref[...] / d_ref[...][:, None, :]

    def bwd(t, _):
        i = K - 1 - t
        x = inv_ref[...]
        lcol = f_ref[pl.ds(i, 1), :, :][0]
        contrib = jnp.sum(
            jnp.where(ks > i, lcol[:, None, :] * x, 0.0), axis=0,
            keepdims=True)
        xi = jnp.sum(jnp.where(ks == i, x, 0.0), axis=0, keepdims=True) \
            - contrib
        inv_ref[...] = jnp.where(ks == i, xi, x)
        return 0

    jax.lax.fori_loop(0, K, bwd, 0)


def _solve_body(f_ref, d_ref, b_ref, x_ref):
    x_ref[...] = _solve_sweeps(f_ref, d_ref, b_ref[...])


def _factor_inverse_body(m_ref, inv_ref, f_ref, d_ref):
    _factor_body(m_ref, f_ref, d_ref)
    _inverse_sweeps(f_ref, d_ref, inv_ref)


def _factor_solve_body(m_ref, b_ref, x_ref, f_ref, d_ref):
    _factor_body(m_ref, f_ref, d_ref)
    x_ref[...] = _solve_sweeps(f_ref, d_ref, b_ref[...])


# ---------------------------------------------------------------------------
# lane-layout pallas_call wrappers: (K, K, B) / (K, B), K % 8 == 0, B % 128 == 0
# ---------------------------------------------------------------------------

def _spec_mat(K, lanes=LANES):
    return pl.BlockSpec((K, K, lanes), lambda b: (0, 0, b),
                        memory_space=pltpu.VMEM)


def _spec_vec(K, lanes=LANES):
    return pl.BlockSpec((K, lanes), lambda b: (0, b),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ldlt_factor_lanes(M, *, interpret=False):
    """(K, K, B) -> packed factor F (K, K, B), diagonal d (K, B).
    The factor output aliases the input buffer (in-place in VMEM)."""
    K, _, B = M.shape
    lanes = LANES
    return pl.pallas_call(
        _factor_body,
        grid=(B // lanes,),
        in_specs=[_spec_mat(K, lanes)],
        out_specs=(_spec_mat(K, lanes), _spec_vec(K, lanes)),
        out_shape=(jax.ShapeDtypeStruct((K, K, B), M.dtype),
                   jax.ShapeDtypeStruct((K, B), M.dtype)),
        input_output_aliases={0: 0},
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(M)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ldlt_solve_lanes(F, d, b, *, interpret=False):
    """Packed factor (K, K, B), (K, B) + rhs (K, B) -> solution (K, B)."""
    K, _, B = F.shape
    lanes = LANES
    return pl.pallas_call(
        _solve_body,
        grid=(B // lanes,),
        in_specs=[_spec_mat(K, lanes), _spec_vec(K, lanes),
                  _spec_vec(K, lanes)],
        out_specs=_spec_vec(K, lanes),
        out_shape=jax.ShapeDtypeStruct((K, B), F.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(F, d, b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ldlt_factor_solve_lanes(M, b, *, interpret=False):
    """Fused factor + solve; also returns the factor for later re-solves.
    The factor output aliases the input buffer (in-place in VMEM)."""
    K, _, B = M.shape
    lanes = LANES
    x, F, d = pl.pallas_call(
        _factor_solve_body,
        grid=(B // lanes,),
        in_specs=[_spec_mat(K, lanes), _spec_vec(K, lanes)],
        out_specs=(_spec_vec(K, lanes), _spec_mat(K, lanes),
                   _spec_vec(K, lanes)),
        out_shape=(jax.ShapeDtypeStruct((K, B), M.dtype),
                   jax.ShapeDtypeStruct((K, K, B), M.dtype),
                   jax.ShapeDtypeStruct((K, B), M.dtype)),
        input_output_aliases={0: 1},
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(M, b)
    return x, F, d


@functools.partial(jax.jit, static_argnames=("interpret",))
def ldlt_inverse_lanes(M, *, interpret=False):
    """(K, K, B) -> explicit inverse (K, K, B) via LDL^T factor + block-RHS
    sweeps (one kernel; the factor never leaves VMEM).  For callers that
    apply K^{-1} many times per factorisation (the distributed Schur
    elimination reuses one factor across a whole ADMM epoch), the inverse
    turns every later solve into a batched matvec on the MXU."""
    K, _, B = M.shape
    lanes = LANES
    inv, _, _ = pl.pallas_call(
        _factor_inverse_body,
        grid=(B // lanes,),
        in_specs=[_spec_mat(K, lanes)],
        out_specs=(_spec_mat(K, lanes), _spec_mat(K, lanes),
                   _spec_vec(K, lanes)),
        out_shape=(jax.ShapeDtypeStruct((K, K, B), M.dtype),
                   jax.ShapeDtypeStruct((K, K, B), M.dtype),
                   jax.ShapeDtypeStruct((K, B), M.dtype)),
        input_output_aliases={0: 1},
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(M)
    return inv


# ---------------------------------------------------------------------------
# batch-major public API: (B, K, K) / (B, K), arbitrary B and K
# ---------------------------------------------------------------------------

def _pad_lanes(M):
    """(B, K, K) -> ((K', K', B'), K, B) lane layout with identity padding so
    padded instances/rows factor cleanly (d = 1, no Inf/NaN in live lanes)."""
    B, K, _ = M.shape
    Kp, Bp = _round_up(K, 8), _round_up(B, LANES)
    if Kp != K:
        M = jnp.pad(M, ((0, 0), (0, Kp - K), (0, Kp - K)))
        eye_tail = jnp.eye(Kp, dtype=M.dtype)[K:]
        M = M.at[:, K:, :].set(eye_tail)
    if Bp != B:
        M = jnp.concatenate(
            [M, jnp.broadcast_to(jnp.eye(Kp, dtype=M.dtype),
                                 (Bp - B, Kp, Kp))], axis=0)
    return jnp.moveaxis(M, 0, -1)


def _pad_vec(v, Kp, Bp):
    B, K = v.shape
    v = jnp.pad(v, ((0, Bp - B), (0, Kp - K)))
    return jnp.moveaxis(v, 0, -1)


def ldlt_factor(M, *, interpret=None):
    """Batched packed LDL^T of symmetric quasi-definite (B, K, K) matrices.

    Returns (F, d): F (B, K', K') packed factor (K' = K rounded up to the
    sublane multiple), d (B, K') diagonal — pass both to :func:`ldlt_solve`.
    """
    if interpret is None:
        interpret = _auto_interpret()
    B = M.shape[0]
    F, d = ldlt_factor_lanes(_pad_lanes(M), interpret=interpret)
    return jnp.moveaxis(F, -1, 0)[:B], jnp.moveaxis(d, -1, 0)[:B]


def ldlt_solve(F, d, b, *, interpret=None):
    """Solve (L D L^T) x = b for a batch: F,d from :func:`ldlt_factor`,
    b (B, K) -> x (B, K)."""
    if interpret is None:
        interpret = _auto_interpret()
    B, K = b.shape
    Kp, Bp = F.shape[1], _round_up(B, LANES)
    Fl = jnp.moveaxis(jnp.pad(F, ((0, Bp - B), (0, 0), (0, 0))), 0, -1)
    # padded instances got F=0, d=0 -> guard d to avoid 0/0 NaN debug-trips
    dl = jnp.moveaxis(
        jnp.pad(d, ((0, Bp - B), (0, 0)), constant_values=1.0), 0, -1)
    bl = _pad_vec(b, Kp, Bp)
    x = ldlt_solve_lanes(Fl, dl, bl, interpret=interpret)
    return jnp.moveaxis(x, -1, 0)[:B, :K]


def ldlt_inverse(M, *, interpret=None):
    """Batched explicit inverse of symmetric quasi-definite (B, K, K)
    matrices via unpivoted LDL^T (factor + block-RHS sweeps in one Pallas
    kernel).  Returns (B, K, K)."""
    if interpret is None:
        interpret = _auto_interpret()
    B, K = M.shape[0], M.shape[1]
    inv = ldlt_inverse_lanes(_pad_lanes(M), interpret=interpret)
    return jnp.moveaxis(inv, -1, 0)[:B, :K, :K]


def ldlt_factor_solve(M, b, *, interpret=None):
    """Fused batched factor+solve: (B, K, K), (B, K) -> (x, F, d)."""
    if interpret is None:
        interpret = _auto_interpret()
    B, K = b.shape
    Ml = _pad_lanes(M)
    Kp = Ml.shape[0]
    bl = _pad_vec(b, Kp, _round_up(B, LANES))
    x, F, d = ldlt_factor_solve_lanes(Ml, bl, interpret=interpret)
    return (jnp.moveaxis(x, -1, 0)[:B, :K],
            jnp.moveaxis(F, -1, 0)[:B], jnp.moveaxis(d, -1, 0)[:B])
