"""Ruiz equilibration preconditioner for QPs, pure JAX.

TPU-native replacement for ``RuizEquilibration``
(qp_preconditioners.hpp:114-552): iterative sqrt-inf-norm row/column scaling
of the KKT matrix [H A'; A 0] plus cost scaling, as in the OSQP paper §5.1.

Scaled problem: H' = c*D H D, h' = c*D h, A' = E A D, bounds al' = E al,
au' = E au, xl' = inv(D) xl, xu' = inv(D) xu.  Recover: x = D x',
y = E y' / c, y_box = inv(D) y' / c.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from polympc_tpu.qp.types import QPData

__all__ = ["RuizScaling", "ruiz_equilibrate", "unscale_solution"]


class RuizScaling(NamedTuple):
    d: jnp.ndarray  # (n,) primal scaling
    e: jnp.ndarray  # (m,) dual scaling
    c: jnp.ndarray  # () cost scaling


def ruiz_equilibrate(qp: QPData, iters: int = 4):
    """Equilibrate the QP; returns (scaled_qp, RuizScaling).

    Static ``iters`` sweeps (the reference caps at 4,
    qp_preconditioners.hpp:153-235); fully unrolled at trace time.
    """
    n = qp.H.shape[-1]
    m = qp.A.shape[-2]
    dt = qp.H.dtype
    H, h, A = qp.H, qp.h, qp.A
    d = jnp.ones(n, dt)
    e = jnp.ones(m, dt)
    c = jnp.ones((), dt)

    def col_norms_H(H, A):
        nH = jnp.max(jnp.abs(H), axis=0)
        if m:
            nA = jnp.max(jnp.abs(A), axis=0)
            return jnp.maximum(nH, nA)
        return nH

    for _ in range(iters):
        # column norms of [H; A] -> d update; row norms of A -> e update
        cn = col_norms_H(H, A)
        delta_d = 1.0 / jnp.sqrt(jnp.maximum(cn, 1e-12))
        if m:
            rn = jnp.max(jnp.abs(A), axis=1)
            delta_e = 1.0 / jnp.sqrt(jnp.maximum(rn, 1e-12))
        H = H * delta_d[:, None] * delta_d[None, :]
        h = h * delta_d
        if m:
            A = A * delta_e[:, None] * delta_d[None, :]
            e = e * delta_e
        d = d * delta_d
        # cost scaling (OSQP §5.1: gamma = 1/max(mean col-norm of H, ||h||))
        mean_col = jnp.mean(jnp.max(jnp.abs(H), axis=0))
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(mean_col, jnp.max(jnp.abs(h)) if h.size else 0.0),
            1e-12)
        H = H * gamma
        h = h * gamma
        c = c * gamma

    scaled = QPData(
        H=H, h=h, A=A,
        al=e * qp.al if m else qp.al,
        au=e * qp.au if m else qp.au,
        xl=qp.xl / d, xu=qp.xu / d,
    )
    return scaled, RuizScaling(d=d, e=e, c=c)


def unscale_solution(x, y, y_box, s: RuizScaling):
    """Map a scaled-problem solution back to the original problem
    (ref: qp_preconditioners.hpp:316-352)."""
    return s.d * x, s.e * y / s.c, y_box / (s.d * s.c)
