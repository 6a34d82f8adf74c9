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

__all__ = ["schur_horizon_solve", "schur_horizon_factor",
           "schur_horizon_apply", "horizon_mesh", "assemble_dense_horizon"]


def _interface_system(Sloc, E, F, SX, G=None, Dg=None, bg=None):
    """From gathered per-segment condensed quantities, build and solve the
    replicated interface system: block-tridiagonal in the interface
    multipliers mu, plus an optional dense global border g (optimised
    parameters — the arrow column of continuous_ocp.hpp:341-376 condensed
    onto the reduced system).

    Sloc: dict of gathered (S, ...) arrays (see _condense_local).
    G: optional (S-1, p, p) diagonal interface block (e.g. -1/rho for
       ADMM-relaxed continuity rows: E w_i + F w_{i+1} + G_i mu_i = c_i).
    Dg/bg: (a, a)/(a,) global block and rhs for rows
       sum_s C_s' w_s + Dg g = bg.
    Returns (mu (S-1, p), g (a,)).
    """
    p = jnp.asarray(E).shape[0]
    a = 0 if Dg is None else Dg.shape[0]
    if SX - 1 == 0 and a == 0:
        return (jnp.zeros((0, p), Sloc["XE"].dtype),
                jnp.zeros((0,), Sloc["XE"].dtype))
    M = _interface_matrix(Sloc, E, F, SX, G=G, Dg=Dg)
    r = _interface_rhs(Sloc, E, F, SX, bg=bg)
    return _interface_split(jnp.linalg.solve(M, r), SX, p, a,
                            Sloc["XE"].dtype)


def _interface_split(sol, SX, p, a, dtype):
    nI = SX - 1
    mu = sol[:nI * p].reshape(nI, p) if nI else jnp.zeros((0, p), dtype)
    g = sol[nI * p:] if a else jnp.zeros((0,), dtype)
    return mu, g


def _interface_matrix(Sloc, E, F, SX, G=None, Dg=None):
    """The (replicated, b-independent) dense interface matrix from the
    condensed per-segment blocks — separated from the rhs so factorising
    callers (schur_horizon_factor) can invert it once and reuse it across
    many right-hand sides (ADMM iterations)."""
    XE, XF = Sloc["XE"], Sloc["XF"]
    E = jnp.asarray(E)
    F = jnp.asarray(F)
    p = E.shape[0]
    nI = SX - 1
    a = 0 if Dg is None else Dg.shape[0]
    if nI == 0:
        # single segment: only the (optional) global border remains
        if a:
            XC, C = Sloc["XC"], Sloc["C"]
            return Dg - jnp.einsum("ska,skb->ab", C, XC)
        return jnp.zeros((0, 0), XE.dtype)
    # diag_i   = E XE_i + F XF_{i+1}
    # lower_i  = E XF_i            (couples mu_{i-1})
    # upper_i  = F XE_{i+1}        (couples mu_{i+1})
    diag = jnp.einsum("pk,ikq->ipq", E, XE[:-1]) \
        + jnp.einsum("pk,ikq->ipq", F, XF[1:])
    if G is not None:
        diag = diag - G
    lower = jnp.einsum("pk,ikq->ipq", E, XF[:-1])
    upper = jnp.einsum("pk,ikq->ipq", F, XE[1:])
    # assemble the (small, replicated) dense interface matrix; a Thomas-scan
    # variant is unnecessary at p*(S-1) ~ tens of unknowns
    # seed the accumulator from the (possibly device-varying) data so the
    # fori_loop carry has consistent varying-axis types under shard_map
    nR = nI * p + a
    M = jnp.zeros((nR, nR), XE.dtype) + 0.0 * diag[0, 0, 0]

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
    if a:
        XC = Sloc["XC"]                                   # (S, k, a)
        C = Sloc["C"]                                     # (S, k, a)
        # mu-row border columns: -(E XC_i + F XC_{i+1}); symmetric rows
        colg = -(jnp.einsum("pk,ika->ipa", E, XC[:-1])
                 + jnp.einsum("pk,ika->ipa", F, XC[1:]))  # (nI, p, a)
        M = jax.lax.dynamic_update_slice(
            M, colg.reshape(nI * p, a), (0, nI * p))
        # C_s' w_s with w_s = w0 - XE mu_s - XF mu_{s-1} - XC g:
        #   border rows over mu_i collect -(C_i' XE_i + C_{i+1}' XF_{i+1})
        rows_mu = -(jnp.einsum("ika,ikp->iap", C[:-1], XE[:-1])
                    + jnp.einsum("ika,ikp->iap", C[1:], XF[1:]))  # (nI, a, p)
        M = jax.lax.dynamic_update_slice(
            M, jnp.moveaxis(rows_mu, 1, 0).reshape(a, nI * p), (nI * p, 0))
        Mgg = Dg - jnp.einsum("ska,skb->ab", C, XC)
        M = jax.lax.dynamic_update_slice(M, Mgg, (nI * p, nI * p))
    return M


def _interface_rhs(Sloc, E, F, SX, bg=None):
    """Interface right-hand side (depends on w0 = K^{-1} b and c)."""
    w0 = Sloc["w0"]
    E = jnp.asarray(E)
    F = jnp.asarray(F)
    nI = SX - 1
    a = "C" in Sloc and bg is not None
    parts = []
    if nI:
        rhs = (Sloc["c"] - jnp.einsum("pk,ik->ip", E, w0[:-1])
               - jnp.einsum("pk,ik->ip", F, w0[1:]))
        parts.append(rhs.reshape(-1))
    if a:
        parts.append(bg - jnp.einsum("ska,sk->a", Sloc["C"], w0))
    if not parts:
        return jnp.zeros((0,), w0.dtype)
    return jnp.concatenate(parts)


def _condense_local(K, b, E, F, C=None):
    """Per-segment dense elimination: returns K^{-1}E', K^{-1}F', K^{-1}b
    (and K^{-1}C when a global border is present)."""
    p = E.shape[0]
    cols = [E.T, F.T, b[:, None]]
    if C is not None:
        cols.append(C)
    sol = jnp.linalg.solve(K, jnp.concatenate(cols, axis=1))
    XC = sol[:, 2 * p + 1:] if C is not None else None
    return sol[:, :p], sol[:, p:2 * p], sol[:, 2 * p], XC


def schur_horizon_solve(K, b, E, F, c, mesh: Mesh | None = None,
                        axis: str = "seg", G=None, C=None, Dg=None, bg=None):
    """Solve the segment-coupled KKT system by Schur-complement condensation.

    K (S, k, k): per-segment symmetric (quasi-definite) KKT blocks.
    b (S, k): per-segment right-hand sides.
    E, F (p, k): interface pick matrices — interface i enforces
        E w_i + F w_{i+1} [+ G_i mu_i] = c_i.
    c (S-1, p): interface right-hand sides.
    G: optional (S-1, p, p) interface diagonal block (ADMM-relaxed
        continuity rows carry -diag(1/rho)).
    C/Dg/bg: optional global border (optimised parameters): C (S, k, a)
        per-segment coupling columns, global rows
        sum_s C_s' w_s + Dg g = bg with Dg (a, a), bg (a,).

    Returns (w (S, k), mu (S-1, p)) — or (w, mu, g) when a border is given.

    With ``mesh`` (1-D, axis name ``axis``, S == mesh size), the per-segment
    elimination runs sharded via ``shard_map`` and only the tiny condensed
    blocks cross chips (all_gather over ICI); without a mesh the same math
    runs locally (the parity oracle).
    """
    S, k = b.shape
    p = E.shape[0]
    E = jnp.asarray(E, K.dtype)
    F = jnp.asarray(F, K.dtype)
    a = 0 if C is None else C.shape[-1]

    def back_sub(w0, XE, XF, XC, mu, g):
        mu_pad = jnp.concatenate([jnp.zeros((1, p), K.dtype), mu,
                                  jnp.zeros((1, p), K.dtype)], axis=0)
        # w_i = w0_i - XE mu_i - XF mu_{i-1} [- XC g]
        w = w0 - jnp.einsum("ikq,iq->ik", XE, mu_pad[1:]) \
            - jnp.einsum("ikq,iq->ik", XF, mu_pad[:-1])
        if a:
            w = w - jnp.einsum("ika,a->ik", XC, g)
        return w

    if mesh is None:
        XE, XF, w0, XC = jax.vmap(
            _condense_local, in_axes=(0, 0, None, None, 0 if a else None))(
            K, b, E, F, C)
        Sloc = {"XE": XE, "XF": XF, "w0": w0, "c": c}
        if a:
            Sloc.update({"XC": XC, "C": C})
        mu, g = _interface_system(Sloc, E, F, S, G=G, Dg=Dg, bg=bg)
        w = back_sub(w0, XE, XF, XC, mu, g)
        return (w, mu, g) if a else (w, mu)

    if mesh.devices.size != S:
        raise ValueError(f"mesh size {mesh.devices.size} != segments {S}")

    def shard_fn(Kl, bl, cl, Cl):
        # Kl (1, k, k) local shard
        XE, XF, w0, XC = _condense_local(Kl[0], bl[0], E, F,
                                         Cl[0] if a else None)
        # gather tiny condensed blocks over ICI; interface solve is replicated
        Sloc = {"XE": jax.lax.all_gather(XE, axis),
                "XF": jax.lax.all_gather(XF, axis),
                "w0": jax.lax.all_gather(w0, axis),
                "c": jax.lax.all_gather(cl[0], axis)[:-1]}  # (S, p), S-1 used
        if a:
            Sloc["XC"] = jax.lax.all_gather(XC, axis)
            Sloc["C"] = jax.lax.all_gather(Cl[0], axis)
        mu, g = _interface_system(Sloc, E, F, S, G=G, Dg=Dg, bg=bg)
        i = jax.lax.axis_index(axis)
        mu_pad = jnp.concatenate(
            [jnp.zeros((1, p), mu.dtype), mu, jnp.zeros((1, p), mu.dtype)],
            axis=0)
        zero = jnp.zeros((), i.dtype)
        mu_right = jax.lax.dynamic_slice(mu_pad, (i + 1, zero), (1, p))[0]
        mu_left = jax.lax.dynamic_slice(mu_pad, (i, zero), (1, p))[0]
        w = w0 - XE @ mu_right - XF @ mu_left
        if a:
            w = w - XC @ g
        return w[None], mu, g

    # mu is computed from all_gather'ed (hence replicated) blocks on every
    # chip; the varying-axis checker can't infer that, so disable it
    w, mu, g = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    )(K, b, jnp.concatenate([c, jnp.zeros((1, p), c.dtype)], axis=0),
      C if a else jnp.zeros((S, k, 0), K.dtype))
    return (w, mu, g) if a else (w, mu)


def schur_horizon_factor(K, E, F, mesh: Mesh | None = None, axis: str = "seg",
                         G=None, C=None, Dg=None, kkt_solver: str = "lu"):
    """Precompute everything b-independent of :func:`schur_horizon_solve`:
    per-segment K^{-1} (explicit inverse), the condensed interface blocks
    XE = K^{-1}E', XF = K^{-1}F' (and XC = K^{-1}C), and the inverse of the
    replicated interface matrix.

    Callers that solve the same segment-coupled KKT against many right-hand
    sides (each distributed-ADMM epoch runs ``check_every`` iterations on
    one factorisation, mirroring the fused epoch structure of
    qp/box_admm.py) factor once and then every
    :func:`schur_horizon_apply` is pure batched matvecs on the MXU.

    kkt_solver="pallas" computes the per-segment inverses with the
    lane-batched LDL^T kernel (ops/ldlt.py:ldlt_inverse — the quasi-definite
    KKT licenses unpivoted LDL^T, box_admm.hpp:336-349); "lu" uses XLA's
    pivoted LU.  Returns an opaque dict for schur_horizon_apply.
    """
    S, k = K.shape[0], K.shape[1]
    p = jnp.asarray(E).shape[0]
    E = jnp.asarray(E, K.dtype)
    F = jnp.asarray(F, K.dtype)
    a = 0 if C is None else C.shape[-1]

    def inv_fn(Ks):
        if kkt_solver == "pallas":
            from polympc_tpu.ops.ldlt import ldlt_inverse
            return ldlt_inverse(Ks)
        return jnp.linalg.inv(Ks)

    def condense(Kinv, Cs):
        XE = jnp.einsum("skj,pj->skp", Kinv, E)
        XF = jnp.einsum("skj,pj->skp", Kinv, F)
        XC = jnp.einsum("skj,sja->ska", Kinv, Cs) if a else None
        return XE, XF, XC

    if mesh is None:
        Kinv = inv_fn(K)
        XE, XF, XC = condense(Kinv, C)
        Sloc = {"XE": XE, "XF": XF}
        if a:
            Sloc.update({"XC": XC, "C": C})
        M = _interface_matrix(Sloc, E, F, S, G=G, Dg=Dg)
        Minv = jnp.linalg.inv(M) if M.shape[0] else M
        return {"Kinv": Kinv, "XE": XE, "XF": XF, "XC": XC, "C": C,
                "Minv": Minv, "E": E, "F": F, "S": S, "p": p, "a": a,
                "mesh": None, "axis": axis}

    if mesh.devices.size != S:
        raise ValueError(f"mesh size {mesh.devices.size} != segments {S}")

    def shard_fn(Kl, Cl):
        Kinv = inv_fn(Kl)
        XEl, XFl, XCl = condense(Kinv, Cl)
        Sloc = {"XE": jax.lax.all_gather(XEl[0], axis),
                "XF": jax.lax.all_gather(XFl[0], axis)}
        if a:
            Sloc["XC"] = jax.lax.all_gather(XCl[0], axis)
            Sloc["C"] = jax.lax.all_gather(Cl[0], axis)
        M = _interface_matrix(Sloc, E, F, S, G=G, Dg=Dg)
        Minv = jnp.linalg.inv(M) if M.shape[0] else M
        if a:
            return Kinv, XEl, XFl, XCl, Minv
        return Kinv, XEl, XFl, Minv

    specs = (P(axis),) * (4 if a else 3) + (P(),)
    out = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=specs, check_vma=False,
    )(K, C if a else jnp.zeros((S, k, 0), K.dtype))
    if a:
        Kinv, XE, XF, XC, Minv = out
    else:
        (Kinv, XE, XF, Minv), XC = out, None
    return {"Kinv": Kinv, "XE": XE, "XF": XF, "XC": XC,
            "C": C, "Minv": Minv, "E": E, "F": F, "S": S, "p": p, "a": a,
            "mesh": mesh, "axis": axis}


def schur_horizon_apply(fac, b, c, bg=None):
    """Solve the segment-coupled KKT for one rhs using a precomputed
    :func:`schur_horizon_factor` — every step is a batched matvec.

    Returns (w (S, k), mu (S-1, p)) or (w, mu, g) when the factor carries a
    global border.
    """
    S, p, a = fac["S"], fac["p"], fac["a"]
    E, F = fac["E"], fac["F"]
    mesh, axis = fac["mesh"], fac["axis"]

    def interface_solve(w0_all, cl):
        Sloc = {"w0": w0_all, "c": cl}
        if a:
            Sloc["C"] = fac["C"]
        r = _interface_rhs(Sloc, E, F, S, bg=bg if a else None)
        sol = fac["Minv"] @ r if r.shape[0] else r
        return _interface_split(sol, S, p, a, w0_all.dtype)

    if mesh is None:
        w0 = jnp.einsum("skj,sj->sk", fac["Kinv"], b)
        mu, g = interface_solve(w0, c)
        mu_pad = jnp.concatenate([jnp.zeros((1, p), b.dtype), mu,
                                  jnp.zeros((1, p), b.dtype)], axis=0)
        w = w0 - jnp.einsum("ikq,iq->ik", fac["XE"], mu_pad[1:]) \
            - jnp.einsum("ikq,iq->ik", fac["XF"], mu_pad[:-1])
        if a:
            w = w - jnp.einsum("ika,a->ik", fac["XC"], g)
        return (w, mu, g) if a else (w, mu)

    def shard_fn(Kinvl, XEl, XFl, bl, cl, *maybe_XCl):
        w0l = Kinvl[0] @ bl[0]
        w0_all = jax.lax.all_gather(w0l, axis)
        c_all = jax.lax.all_gather(cl[0], axis)[:-1]
        mu, g = interface_solve(w0_all, c_all)
        i = jax.lax.axis_index(axis)
        mu_pad = jnp.concatenate(
            [jnp.zeros((1, p), mu.dtype), mu, jnp.zeros((1, p), mu.dtype)],
            axis=0)
        zero = jnp.zeros((), i.dtype)
        mu_right = jax.lax.dynamic_slice(mu_pad, (i + 1, zero), (1, p))[0]
        mu_left = jax.lax.dynamic_slice(mu_pad, (i, zero), (1, p))[0]
        w = w0l - XEl[0] @ mu_right - XFl[0] @ mu_left
        if a:
            w = w - maybe_XCl[0][0] @ g
        return w[None], mu, g

    args = [fac["Kinv"], fac["XE"], fac["XF"], b,
            jnp.concatenate([c, jnp.zeros((1, p), c.dtype)], axis=0)]
    if a:
        args.append(fac["XC"])
    w, mu, g = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis),) * len(args),
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    )(*args)
    return (w, mu, g) if a else (w, mu)


def assemble_dense_horizon(K, b, E, F, c, G=None, C=None, Dg=None, bg=None):
    """Oracle: the full coupled KKT assembled dense (for parity tests).

    Layout: [w_0 ... w_{S-1}, mu_0 ... mu_{S-2} (, g)].
    """
    S, k = b.shape
    p = E.shape[0]
    a = 0 if C is None else np.asarray(C).shape[-1]
    n = S * k + (S - 1) * p + a
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
        if a:
            gi = slice(S * k + (S - 1) * p, n)
            M[sl, gi] = np.asarray(C)[i]
            M[gi, sl] = np.asarray(C)[i].T
    for i in range(S - 1):
        mi = slice(S * k + i * p, S * k + (i + 1) * p)
        r[mi] = cn[i]
        if G is not None:
            M[mi, mi] = np.asarray(G)[i]
    if a:
        gi = slice(S * k + (S - 1) * p, n)
        M[gi, gi] = np.asarray(Dg)
        r[gi] = np.asarray(bg)
    sol = np.linalg.solve(M, r)
    w = sol[:S * k].reshape(S, k)
    mu = sol[S * k:S * k + (S - 1) * p].reshape(S - 1, p)
    if a:
        return w, mu, sol[S * k + (S - 1) * p:]
    return w, mu


def horizon_mesh(n_devices=None, axis: str = "seg") -> Mesh:
    """1-D mesh over the horizon-segment axis."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devs), axis_names=(axis,))
