"""Collocation KKT structure: permutation onto bordered-block-tridiagonal
(BBT) form.

The boxADMM KKT of a pseudospectral collocation NLP,

    K = [[H + sigma I + diag(rb),  A'], [A, -diag(1/rho)]],

is dense in the natural [X; U; P | duals] ordering, but the reference's nnz
estimators document its true sparsity (continuous_ocp.hpp:313-376): the
Lagrangian Hessian is node-block-diagonal with a parameter arrow, and the
constraint Jacobian couples nodes only *within* a collocation segment
(composite differentiation matrix) plus the same arrow.  Reordering the KKT
by segment — each block owning its nodes' states, controls and constraint
duals — yields

    [ T_0  O_1'              C_0 ]
    [ O_1  T_1  O_2'         C_1 ]
    [      O_2  T_2          C_2 ]
    [ C_0' C_1' C_2' ...      Dp ]

where the couplings O_s are *thin*: a segment's defect rows touch only the
nx boundary states owned by the previous block, so O_s has nx nonzero
columns.  The border collects the optimised parameters (and any
trajectory-level inequality duals).

This module computes the static permutation/metadata (numpy, build-time) and
provides a pure-jnp mirror of the BBT factor/solve used as the correctness
oracle for the Pallas kernel (ops/bbt_kernel.py).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CollocStructure", "bbt_structure", "gather_blocks",
           "scatter_solution", "bbt_solve_jnp", "structure_is_consistent"]


@dataclasses.dataclass(frozen=True)
class CollocStructure:
    """Static BBT metadata (hashable: everything is tuples/ints).

    S: number of blocks (= collocation segments);
    k: padded uniform block size (sublane-rounded);
    a: border width (np_ + ntg);
    nxr: boundary-state count rounded to the sublane multiple;
    perm: (S, k) global KKT indices per block, K (= n+m) marking padding;
    border: (a,) global indices of the border rows/cols;
    bx: (S,) row offset of the boundary states within each block;
    n, m: primal/dual dimensions of the original KKT.
    """
    S: int
    k: int
    a: int
    nx: int
    nxr: int
    perm: tuple          # of tuples, (S, k)
    border: tuple        # (a,)
    bx: tuple            # (S,)
    n: int
    m: int

    @property
    def K(self) -> int:
        return self.n + self.m


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


@functools.lru_cache(maxsize=64)
def structure_is_consistent(st: CollocStructure) -> bool:
    """Completeness check of a CollocStructure against its own dimensions:
    perm + border must cover each of the K = n+m global KKT indices exactly
    once (padding slots carry the sentinel K), with the advertised S/k/a
    shapes.  Guards the structured-kernel dispatch against a malformed or
    foreign structure whose n/m coincidentally match the QP — a wrong
    permutation would otherwise surface only as silent non-convergence.
    (A structure should come from the same Transcription.bbt_structure()
    that produced the QP; this cannot verify node *ownership*, only that
    the permutation is a bijection of the right shape.)
    """
    if len(st.perm) != st.S or any(len(row) != st.k for row in st.perm):
        return False
    if len(st.border) != st.a or len(st.bx) != st.S:
        return False
    K = st.K
    idx = [i for row in st.perm for i in row if i != K]
    idx.extend(st.border)
    return sorted(idx) == list(range(K))


def bbt_structure(N: int, nx: int, nu: int, ng: int, np_: int, ntg: int,
                  order: int, segments: int, sublane: int = 8
                  ) -> CollocStructure:
    """Build the BBT permutation for a Lobatto collocation KKT.

    Node ownership: block 0 owns nodes 0..p; block s >= 1 owns nodes
    s*p+1..(s+1)*p (the shared boundary node belongs to the left block,
    matching the composite-D row convention).  Block-internal order:
    [x(nodes), u(nodes), lam_eq(nodes), lam_ineq(nodes)], padded to the
    uniform size k.
    """
    p, S = order, segments
    if N != p * S + 1:
        raise ValueError("bbt_structure requires a boundary-sharing "
                         f"(Lobatto) mesh: N={N} != {p}*{S}+1")
    n = N * (nx + nu) + np_
    m = N * nx + N * ng + ntg
    K = n + m
    q = 2 * nx + nu + ng                     # per-node KKT rows
    k = _round_up((p + 1) * q, sublane)
    a = np_ + ntg

    def owned(s):
        return list(range(0, p + 1)) if s == 0 else \
            list(range(s * p + 1, (s + 1) * p + 1))

    perm = []
    bx = []
    for s in range(S):
        nodes = owned(s)
        idx = []
        for j in nodes:                      # x vars
            idx.extend(range(j * nx, (j + 1) * nx))
        bx.append((len(nodes) - 1) * nx)     # boundary x rows offset
        for j in nodes:                      # u vars
            idx.extend(range(N * nx + j * nu, N * nx + (j + 1) * nu))
        for j in nodes:                      # defect duals
            idx.extend(range(n + j * nx, n + (j + 1) * nx))
        for j in nodes:                      # node inequality duals
            idx.extend(range(n + N * nx + j * ng, n + N * nx + (j + 1) * ng))
        idx.extend([K] * (k - len(idx)))     # K = padding sentinel
        perm.append(tuple(idx))

    border = tuple(list(range(N * (nx + nu), n))          # P vars
                   + list(range(n + N * nx + N * ng, K)))  # traj duals
    return CollocStructure(S=S, k=k, a=a, nx=nx,
                           nxr=_round_up(max(nx, 1), sublane),
                           perm=tuple(perm), border=border, bx=tuple(bx),
                           n=n, m=m)


def gather_blocks(K_dense, b, st: CollocStructure):
    """Dense (K, K) KKT + rhs -> BBT block storage.

    Returns (Td (S,k,k), Oh (S-1,k,nx), C (S,k,a), Dp (a,a),
    bb (S,k), bp (a,)).  Padding slots read from a virtual identity
    row/zero rhs appended to the matrix.
    """
    dt = K_dense.dtype
    Kx = jnp.pad(K_dense, ((0, 1), (0, 1)))
    Kx = Kx.at[-1, -1].set(1.0)
    bxv = jnp.pad(b, (0, 1))
    perm = jnp.asarray(st.perm, jnp.int32)                # (S, k)
    Td = Kx[perm[:, :, None], perm[:, None, :]]           # (S, k, k)
    # every padding slot maps to the one sentinel index, so pad x pad
    # gathers read the same 1.0 (an all-ones, singular sub-block); replace
    # padding rows/cols with exact identity
    pad = perm == st.K                                    # (S, k)
    pad2 = pad[:, :, None] | pad[:, None, :]
    Td = jnp.where(pad2, jnp.eye(st.k, dtype=dt)[None], Td)
    if st.S > 1:
        # boundary-x global indices of block s (cols of O_{s+1})
        bxg = jnp.stack([perm[s, st.bx[s]:st.bx[s] + st.nx]
                         for s in range(st.S - 1)])       # (S-1, nx)
        Oh = Kx[perm[1:, :, None], bxg[:, None, :]]       # (S-1, k, nx)
    else:
        Oh = jnp.zeros((0, st.k, st.nx), dt)
    if st.a:
        bd = jnp.asarray(st.border, jnp.int32)
        C = Kx[perm[:, :, None], bd[None, None, :]]       # (S, k, a)
        Dp = Kx[bd[:, None], bd[None, :]]
        bp = bxv[bd]
    else:
        C = jnp.zeros((st.S, st.k, 0), dt)
        Dp = jnp.zeros((0, 0), dt)
        bp = jnp.zeros(0, dt)
    bb = bxv[perm]
    return Td, Oh, C, Dp, bb, bp


def scatter_solution(xb, xp, st: CollocStructure):
    """Inverse of the permutation: block solution (S, k) + border (a,) ->
    flat (K,) in the original ordering."""
    out = jnp.zeros(st.K + 1, xb.dtype)
    perm = jnp.asarray(st.perm, jnp.int32)
    out = out.at[perm.reshape(-1)].set(xb.reshape(-1))
    if st.a:
        out = out.at[jnp.asarray(st.border, jnp.int32)].set(xp)
    return out[:st.K]


def bbt_solve_jnp(Td, Oh, C, Dp, bb, bp, st: CollocStructure):
    """Pure-jnp BBT factor+solve (single instance) — the algorithm the
    Pallas kernel implements, in oracle form:

      sweep s = 0..S-1:  Schur-update T_s by the previous block through the
        thin coupling, update the border column and border Schur complement,
        factor T_s;
      solve the a x a border system;  back-substitute.

    Uses dense jnp.linalg solves per block (clarity over speed).
    """
    S, k, a, nx = st.S, st.k, st.a, st.nx
    dt = Td.dtype
    Tt = [None] * S          # updated (factor-ready) diagonal blocks
    Ch = [None] * S          # updated border columns
    W = [None] * S           # T~^{-1} E (k, nx)
    V = [None] * S           # T~^{-1} C~ (k, a)
    Sp = Dp
    for s in range(S):
        T = Td[s]
        Cs = C[s]
        if s > 0:
            Wp, Vp = W[s - 1], V[s - 1]
            bxp = st.bx[s - 1]
            G_EE = Wp[bxp:bxp + nx, :]               # E' T~^{-1} E (nx, nx)
            O = Oh[s - 1]                             # (k, nx)
            T = T - O @ G_EE @ O.T
            if a:
                Cs = Cs - O @ Vp[bxp:bxp + nx, :]
        if a:
            Sp = Sp - Ch[s - 1].T @ V[s - 1] if s > 0 else Sp
        Tt[s] = T
        Ch[s] = Cs
        E = jnp.zeros((k, nx), dt).at[st.bx[s]:st.bx[s] + nx, :].set(
            jnp.eye(nx, dtype=dt))
        W[s] = jnp.linalg.solve(T, E)
        V[s] = jnp.linalg.solve(T, Cs) if a else jnp.zeros((k, 0), dt)
    if a:
        Sp = Sp - Ch[S - 1].T @ V[S - 1]

    # forward sweep
    u = [None] * S
    yh = [None] * S
    bph = bp
    for s in range(S):
        y = bb[s]
        if s > 0:
            bxp = st.bx[s - 1]
            y = y - Oh[s - 1] @ u[s - 1][bxp:bxp + nx]
        yh[s] = y
        u[s] = jnp.linalg.solve(Tt[s], y)
        if a:
            bph = bph - Ch[s].T @ u[s]
    xp = jnp.linalg.solve(Sp, bph) if a else jnp.zeros(0, dt)

    # backward sweep
    xb = [None] * S
    for s in reversed(range(S)):
        x = u[s]
        if a:
            x = x - V[s] @ xp
        if s < S - 1:
            x = x - W[s] @ (Oh[s].T @ xb[s + 1])
        xb[s] = x
    return jnp.stack(xb), xp
