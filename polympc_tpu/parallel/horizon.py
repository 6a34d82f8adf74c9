"""Horizon (sequence) partitioning: Schur-complement condensation of the
block-banded collocation KKT across a device mesh.

The reference scales the horizon only via compile-time segment count inside
one process; its composite differentiation matrix (continuous_ocp.hpp:313-339)
and nnz estimators (:341-376) document that segments couple *only* through
their shared boundary state nodes.  That structure is what licenses the
TPU-native long-horizon design (SURVEY.md §2.3 P3 / §5):

  - duplicate each interface state so every segment owns a private variable
    block w_i, and add continuity constraints  E w_i + F w_{i+1} = c_i
    (E picks the segment's tail state, F = -head of the next segment);
  - the KKT becomes block-diagonal in w with a thin coupling band: eliminate
    every w_i locally (dense LDL^T per chip, the expensive part — fully
    parallel), leaving a block-tridiagonal *interface system* in the
    continuity multipliers mu of size (S-1)*p, p = nx per interface;
  - the interface blocks are tiny (nx x nx), so they are all_gather'ed over
    the mesh axis (ICI traffic ~ S * 3 p^2 floats) and the reduced system is
    solved replicated on every chip; local back-substitution finishes.

Interface system (eliminating w_i = K_i^{-1}(b_i - E' mu_i - F' mu_{i-1})):

  - E K_i^{-1} F' mu_{i-1}
  - (E K_i^{-1} E' + F K_{i+1}^{-1} F') mu_i
  - F K_{i+1}^{-1} E' mu_{i+1}  =  c_i - E K_i^{-1} b_i - F K_{i+1}^{-1} b_{i+1}
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["schur_horizon_solve", "horizon_mesh", "assemble_dense_horizon"]


def _interface_system(Sloc, E, F, SX):
    """From gathered per-segment condensed quantities, build and solve the
    replicated block-tridiagonal interface system.

    Sloc: dict of gathered (S, ...) arrays (see _condense_local).
    Returns mu (S-1, p).
    """
    XE, XF, w0 = Sloc["XE"], Sloc["XF"], Sloc["w0"]
    E = jnp.asarray(E)
    F = jnp.asarray(F)
    p = E.shape[0]
    nI = SX - 1
    # diag_i   = E XE_i + F XF_{i+1}
    # lower_i  = E XF_i            (couples mu_{i-1})
    # upper_i  = F XE_{i+1}        (couples mu_{i+1})
    diag = jnp.einsum("pk,ikq->ipq", E, XE[:-1]) \
        + jnp.einsum("pk,ikq->ipq", F, XF[1:])
    lower = jnp.einsum("pk,ikq->ipq", E, XF[:-1])
    upper = jnp.einsum("pk,ikq->ipq", F, XE[1:])
    rhs = (Sloc["c"] - jnp.einsum("pk,ik->ip", E, w0[:-1])
           - jnp.einsum("pk,ik->ip", F, w0[1:]))
    # assemble the (small, replicated) dense interface matrix; a Thomas-scan
    # variant is unnecessary at p*(S-1) ~ tens of unknowns
    # seed the accumulator from the (possibly device-varying) data so the
    # fori_loop carry has consistent varying-axis types under shard_map
    M = jnp.zeros((nI * p, nI * p), XE.dtype) + 0.0 * diag[0, 0, 0]

    def put(M, i, j, B):
        return jax.lax.dynamic_update_slice(M, B, (i * p, j * p))

    def body(i, M):
        M = put(M, i, i, -diag[i])
        M = jax.lax.cond(i >= 1, lambda M: put(M, i, i - 1, -lower[i]),
                         lambda M: M, M)
        M = jax.lax.cond(i < nI - 1, lambda M: put(M, i, i + 1, -upper[i]),
                         lambda M: M, M)
        return M

    M = jax.lax.fori_loop(0, nI, body, M)
    mu = jnp.linalg.solve(M, rhs.reshape(-1)).reshape(nI, p)
    return mu


def _condense_local(K, b, E, F):
    """Per-segment dense elimination: returns K^{-1}E', K^{-1}F', K^{-1}b."""
    rhs = jnp.concatenate([E.T, F.T, b[:, None]], axis=1)
    sol = jnp.linalg.solve(K, rhs)
    p = E.shape[0]
    return sol[:, :p], sol[:, p:2 * p], sol[:, -1]


def schur_horizon_solve(K, b, E, F, c, mesh: Mesh | None = None,
                        axis: str = "seg"):
    """Solve the segment-coupled KKT system by Schur-complement condensation.

    K (S, k, k): per-segment symmetric (quasi-definite) KKT blocks.
    b (S, k): per-segment right-hand sides.
    E, F (p, k): interface pick matrices — interface i enforces
        E w_i + F w_{i+1} = c_i.
    c (S-1, p): interface right-hand sides.

    Returns (w (S, k), mu (S-1, p)).

    With ``mesh`` (1-D, axis name ``axis``, S == mesh size), the per-segment
    elimination runs sharded via ``shard_map`` and only the tiny condensed
    blocks cross chips (all_gather over ICI); without a mesh the same math
    runs locally (the parity oracle).
    """
    S, k = b.shape
    p = E.shape[0]
    E = jnp.asarray(E, K.dtype)
    F = jnp.asarray(F, K.dtype)

    if mesh is None:
        XE, XF, w0 = jax.vmap(_condense_local, in_axes=(0, 0, None, None))(
            K, b, E, F)
        mu = _interface_system({"XE": XE, "XF": XF, "w0": w0, "c": c},
                               E, F, S)
        mu_pad = jnp.concatenate([jnp.zeros((1, p), K.dtype), mu,
                                  jnp.zeros((1, p), K.dtype)], axis=0)
        # w_i = w0_i - XE mu_i - XF mu_{i-1}
        w = w0 - jnp.einsum("ikq,iq->ik", XE, mu_pad[1:]) \
            - jnp.einsum("ikq,iq->ik", XF, mu_pad[:-1])
        return w, mu

    if mesh.devices.size != S:
        raise ValueError(f"mesh size {mesh.devices.size} != segments {S}")

    def shard_fn(Kl, bl, cl):
        # Kl (1, k, k) local shard
        XE, XF, w0 = _condense_local(Kl[0], bl[0], E, F)
        # gather tiny condensed blocks over ICI; interface solve is replicated
        XEg = jax.lax.all_gather(XE, axis)
        XFg = jax.lax.all_gather(XF, axis)
        w0g = jax.lax.all_gather(w0, axis)
        cg = jax.lax.all_gather(cl[0], axis)        # (S, p) but only S-1 used
        mu = _interface_system(
            {"XE": XEg, "XF": XFg, "w0": w0g, "c": cg[:-1]}, E, F, S)
        i = jax.lax.axis_index(axis)
        mu_pad = jnp.concatenate(
            [jnp.zeros((1, p), mu.dtype), mu, jnp.zeros((1, p), mu.dtype)],
            axis=0)
        zero = jnp.zeros((), i.dtype)
        mu_right = jax.lax.dynamic_slice(mu_pad, (i + 1, zero), (1, p))[0]
        mu_left = jax.lax.dynamic_slice(mu_pad, (i, zero), (1, p))[0]
        w = w0 - XE @ mu_right - XF @ mu_left
        return w[None], mu

    # mu is computed from all_gather'ed (hence replicated) blocks on every
    # chip; the varying-axis checker can't infer that, so disable it
    w, mu = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )(K, b, jnp.concatenate([c, jnp.zeros((1, p), c.dtype)], axis=0))
    return w, mu


def assemble_dense_horizon(K, b, E, F, c):
    """Oracle: the full coupled KKT assembled dense (for parity tests).

    Layout: [w_0 ... w_{S-1}, mu_0 ... mu_{S-2}].
    """
    S, k = b.shape
    p = E.shape[0]
    n = S * k + (S - 1) * p
    M = np.zeros((n, n), dtype=np.asarray(K).dtype)
    r = np.zeros(n, dtype=np.asarray(K).dtype)
    Kn, bn = np.asarray(K), np.asarray(b)
    En, Fn, cn = np.asarray(E), np.asarray(F), np.asarray(c)
    for i in range(S):
        sl = slice(i * k, (i + 1) * k)
        M[sl, sl] = Kn[i]
        r[sl] = bn[i]
        if i < S - 1:
            mi = slice(S * k + i * p, S * k + (i + 1) * p)
            M[sl, mi] = En.T
            M[mi, sl] = En
        if i > 0:
            mi = slice(S * k + (i - 1) * p, S * k + i * p)
            M[sl, mi] = Fn.T
            M[mi, sl] = Fn
    for i in range(S - 1):
        mi = slice(S * k + i * p, S * k + (i + 1) * p)
        r[mi] = cn[i]
    sol = np.linalg.solve(M, r)
    w = sol[:S * k].reshape(S, k)
    mu = sol[S * k:].reshape(S - 1, p)
    return w, mu


def horizon_mesh(n_devices=None, axis: str = "seg") -> Mesh:
    """1-D mesh over the horizon-segment axis."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devs), axis_names=(axis,))
