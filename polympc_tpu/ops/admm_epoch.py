"""Fused ADMM epoch Pallas kernel: KKT LDL^T factor + ``iters`` iterations
entirely in VMEM, lane-batched over problem instances.

One boxADMM epoch (ref: box_admm.hpp:88-205) is "factor the KKT for the
current rho, then run check_every operator-splitting iterations".  The
iterations read nothing but the factor and a handful of (K,)-vectors, so on
TPU the speed-of-light design keeps the factor VMEM-resident for the whole
epoch: HBM traffic is one KKT read + one state read/write per epoch, instead
of re-streaming the factor from HBM on every iteration (for the kite NMPF
batch that is ~130 MB/iteration of avoided HBM reads).

Batch layout: the batch rides the 128-wide lane axis, one instance per VPU
lane, matching :mod:`polympc_tpu.ops.ldlt` (whose factor/solve bodies this
kernel reuses on its VMEM scratch).

Dimension padding: the primal block is padded n -> n8 and the dual block
m -> m8 (sublane multiples) *independently*, with identity KKT rows, unit
rho, zero state, and infinite bounds in the padding — padded entries stay
exactly zero through every iteration.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polympc_tpu.ops.ldlt import (
    LANES, _COMPILER_PARAMS, _auto_interpret, _factor_body, _round_up,
    _solve_sweeps, pallas_fits,
)

__all__ = ["admm_epoch_batched", "epoch_kernel_fits"]


def epoch_kernel_fits(n: int, m: int) -> bool:
    """True if the fused epoch kernel's VMEM working set fits for this
    problem size (one aliased (K,K,128) block + state vectors)."""
    n8 = _round_up(max(n, 8), 8)
    m8 = _round_up(m, 8) if m else 0
    # in-flight blocks: kkt in + factor out, double-buffered across grid steps
    return pallas_fits(n8 + m8, n_mats=4)


def _epoch_body_with_m(n8, m8, sigma, alpha, iters,
                       kkt_ref, h_ref, al_ref, au_ref, xl_ref, xu_ref,
                       rho_ref, rb_ref, x_ref, z_ref, q_ref, y_ref, yb_ref,
                       xo_ref, zo_ref, qo_ref, yo_ref, ybo_ref,
                       f_scr, d_scr):
    # f_scr is an OUTPUT ref aliased onto the kkt input buffer
    # (input_output_aliases): the factor overwrites the KKT in place.
    # (an explicit-inverse variant was measured SLOWER: the O(K) block-FMA
    # inverse costs more FLOPs than the latency-bound sweeps it replaces)
    _factor_body(kkt_ref, f_scr, d_scr)
    h, rb = h_ref[...], rb_ref[...]
    xl, xu = xl_ref[...], xu_ref[...]
    al, au, rho = al_ref[...], au_ref[...], rho_ref[...]
    rho_inv = 1.0 / rho
    rb_inv = 1.0 / rb

    def it(_, state):
        x, z, q, y, yb = state
        rhs = jnp.concatenate(
            [sigma * x + rb * q - yb - h, z - y * rho_inv], axis=0)
        sol = _solve_sweeps(f_scr, d_scr, rhs)
        xt = sol[:n8]
        nu = sol[n8:]
        zt = z + (nu - y) * rho_inv
        x_new = alpha * xt + (1.0 - alpha) * x
        q_u = alpha * xt + (1.0 - alpha) * q
        q_new = jnp.clip(q_u + yb * rb_inv, xl, xu)
        yb_new = yb + rb * (q_u - q_new)
        z_u = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_u + y * rho_inv, al, au)
        y_new = y + rho * (z_u - z_new)
        return x_new, z_new, q_new, y_new, yb_new

    x, z, q, y, yb = jax.lax.fori_loop(
        0, iters, it,
        (x_ref[...], z_ref[...], q_ref[...], y_ref[...], yb_ref[...]))
    xo_ref[...], zo_ref[...], qo_ref[...] = x, z, q
    yo_ref[...], ybo_ref[...] = y, yb


def _epoch_body_no_m(sigma, alpha, iters,
                     kkt_ref, h_ref, xl_ref, xu_ref, rb_ref,
                     x_ref, q_ref, yb_ref,
                     xo_ref, qo_ref, ybo_ref, f_scr, d_scr):
    # f_scr: output ref aliased onto kkt (see _epoch_body_with_m)
    _factor_body(kkt_ref, f_scr, d_scr)
    h, rb = h_ref[...], rb_ref[...]
    xl, xu = xl_ref[...], xu_ref[...]
    rb_inv = 1.0 / rb

    def it(_, state):
        x, q, yb = state
        xt = _solve_sweeps(f_scr, d_scr, sigma * x + rb * q - yb - h)
        x_new = alpha * xt + (1.0 - alpha) * x
        q_u = alpha * xt + (1.0 - alpha) * q
        q_new = jnp.clip(q_u + yb * rb_inv, xl, xu)
        yb_new = yb + rb * (q_u - q_new)
        return x_new, q_new, yb_new

    x, q, yb = jax.lax.fori_loop(
        0, iters, it, (x_ref[...], q_ref[...], yb_ref[...]))
    xo_ref[...], qo_ref[...], ybo_ref[...] = x, q, yb


def _mat_spec(K, lanes):
    return pl.BlockSpec((K, K, lanes), lambda b: (0, 0, b),
                        memory_space=pltpu.VMEM)


def _vec_spec(K, lanes):
    return pl.BlockSpec((K, lanes), lambda b: (0, b),
                        memory_space=pltpu.VMEM)


def _pad_kkt(kkt, n, m, n8, m8):
    """(B, n+m, n+m) -> (B, n8+m8, n8+m8) with identity padding rows placed
    *between* the primal and dual blocks so in-kernel block splits stay
    static slices."""
    B = kkt.shape[0]
    Kp = n8 + m8
    out = jnp.zeros((B, Kp, Kp), kkt.dtype)
    out = out.at[:, :n, :n].set(kkt[:, :n, :n])
    if m:
        out = out.at[:, :n, n8:n8 + m].set(kkt[:, :n, n:])
        out = out.at[:, n8:n8 + m, :n].set(kkt[:, n:, :n])
        out = out.at[:, n8:n8 + m, n8:n8 + m].set(kkt[:, n:, n:])
    pad_idx = jnp.concatenate(
        [jnp.arange(n, n8), jnp.arange(n8 + m, Kp)]).astype(jnp.int32)
    if pad_idx.size:
        out = out.at[:, pad_idx, pad_idx].set(1.0)
    return out


def _pad_tail(v, size, value, B):
    pad = v.shape[1]
    if size == pad:
        return v
    fill = jnp.full((B, size - pad), value, v.dtype)
    return jnp.concatenate([v, fill], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "alpha", "iters", "interpret"))
def admm_epoch_batched(kkt, h, al, au, xl, xu, rho, rb, x, z, q, y, yb,
                       *, sigma, alpha, iters, interpret=None):
    """Run one fused (factor + ``iters`` iterations) ADMM epoch on a batch.

    kkt: (B, n+m, n+m) assembled KKT matrices for the current rho.
    h (B,n); al,au,rho (B,m); xl,xu,rb (B,n); state x,z,q,y,yb batched.
    Returns the new (x, z, q, y, yb).
    """
    if interpret is None:
        interpret = _auto_interpret()
    B, n = h.shape
    m = al.shape[1]
    n8, m8 = _round_up(max(n, 8), 8), _round_up(m, 8) if m else 0
    Bp = _round_up(max(B, LANES), LANES)
    Kp = n8 + m8
    dt = kkt.dtype

    inf = jnp.asarray(jnp.inf, dt)

    def prep_n(v, fill):
        return jnp.moveaxis(
            _pad_tail(jnp.pad(v, ((0, Bp - B), (0, 0))), n8, fill, Bp), 0, -1)

    def prep_m(v, fill):
        return jnp.moveaxis(
            _pad_tail(jnp.pad(v, ((0, Bp - B), (0, 0))), m8, fill, Bp), 0, -1)

    kkt_p = _pad_kkt(kkt, n, m, n8, m8)
    if Bp != B:
        kkt_p = jnp.concatenate(
            [kkt_p, jnp.broadcast_to(jnp.eye(Kp, dtype=dt),
                                     (Bp - B, Kp, Kp))], axis=0)
    kkt_l = jnp.moveaxis(kkt_p, 0, -1)

    hl = prep_n(h, 0.0)
    xll, xul = prep_n(xl, -inf), prep_n(xu, inf)
    rbl = prep_n(rb, 1.0)
    xl_, ql_, ybl = prep_n(x, 0.0), prep_n(q, 0.0), prep_n(yb, 0.0)

    lanes = LANES
    scratch = [pltpu.VMEM((Kp, lanes), dt)]

    if m:
        all_, aul = prep_m(al, -inf), prep_m(au, inf)
        rhol = prep_m(rho, 1.0)
        zl, yl = prep_m(z, 0.0), prep_m(y, 0.0)
        body = functools.partial(
            _epoch_body_with_m, n8, m8, sigma, alpha, iters)
        outs = pl.pallas_call(
            body,
            grid=(Bp // lanes,),
            in_specs=[_mat_spec(Kp, lanes),
                      _vec_spec(n8, lanes),                          # h
                      _vec_spec(m8, lanes), _vec_spec(m8, lanes),    # al, au
                      _vec_spec(n8, lanes), _vec_spec(n8, lanes),    # xl, xu
                      _vec_spec(m8, lanes), _vec_spec(n8, lanes),    # rho, rb
                      _vec_spec(n8, lanes), _vec_spec(m8, lanes),    # x, z
                      _vec_spec(n8, lanes), _vec_spec(m8, lanes),    # q, y
                      _vec_spec(n8, lanes)],                         # yb
            out_specs=(_vec_spec(n8, lanes), _vec_spec(m8, lanes),
                       _vec_spec(n8, lanes), _vec_spec(m8, lanes),
                       _vec_spec(n8, lanes), _mat_spec(Kp, lanes)),
            out_shape=(jax.ShapeDtypeStruct((n8, Bp), dt),
                       jax.ShapeDtypeStruct((m8, Bp), dt),
                       jax.ShapeDtypeStruct((n8, Bp), dt),
                       jax.ShapeDtypeStruct((m8, Bp), dt),
                       jax.ShapeDtypeStruct((n8, Bp), dt),
                       jax.ShapeDtypeStruct((Kp, Kp, Bp), dt)),
            input_output_aliases={0: 5},   # kkt buffer reused as the factor
            scratch_shapes=scratch,
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(kkt_l, hl, all_, aul, xll, xul, rhol, rbl,
          xl_, zl, ql_, yl, ybl)
        xo, zo, qo, yo, ybo, _ = outs
        unvec_n = lambda v: jnp.moveaxis(v, -1, 0)[:B, :n]
        unvec_m = lambda v: jnp.moveaxis(v, -1, 0)[:B, :m]
        return (unvec_n(xo), unvec_m(zo), unvec_n(qo),
                unvec_m(yo), unvec_n(ybo))

    body = functools.partial(_epoch_body_no_m, sigma, alpha, iters)
    xo, qo, ybo, _ = pl.pallas_call(
        body,
        grid=(Bp // lanes,),
        in_specs=[_mat_spec(Kp, lanes)] + [_vec_spec(n8, lanes)] * 7,
        out_specs=(_vec_spec(n8, lanes),) * 3 + (_mat_spec(Kp, lanes),),
        out_shape=(jax.ShapeDtypeStruct((n8, Bp), dt),) * 3
        + (jax.ShapeDtypeStruct((Kp, Kp, Bp), dt),),
        input_output_aliases={0: 3},
        scratch_shapes=scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(kkt_l, hl, xll, xul, rbl, xl_, ql_, ybl)
    unvec_n = lambda v: jnp.moveaxis(v, -1, 0)[:B, :n]
    return (unvec_n(xo), z, unvec_n(qo), y, unvec_n(ybo))
