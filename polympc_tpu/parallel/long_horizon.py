"""Long-horizon OCP solving: per-segment transcription + distributed Newton
steps through :func:`polympc_tpu.parallel.horizon.schur_horizon_solve`.

The reference can only grow the horizon through its compile-time segment
count inside one process (splines.hpp:33, continuous_ocp.hpp:313-339).  Here
the horizon is partitioned across a device mesh: every chip owns one
collocation segment with *duplicated* interface states, builds its local
Newton KKT independently (all derivative work is segment-local), and the
segments are glued by continuity constraints condensed onto the tiny
interface system (ICI traffic per Newton step ~ S * nx^2 floats).

Equality-constrained form (dynamics defects only); bounds/inequalities ride
the outer SQP/ADMM layers, this module provides the scalable Newton engine.

Per segment s over [t_s, t_{s+1}] with basis nodes tau_k:
  variables  w_s = [X_s (N, nx); U_s (N, nu)] flattened, N = order+1
  defects    D X_s / t_scale_s - f(X_s, U_s) = 0
  cost       sum_k t_scale_s w_k L(x_k, u_k) (+ Mayer on the last segment)
  Newton KKT [[H_s, A_s'], [A_s, -delta I]] [dz; lam+] = [-grad_s; -defect_s]
  continuity x_tail(s) - x_head(s+1) = 0 handled by the Schur interface.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from polympc_tpu.basis.basis import Basis
from polympc_tpu.ocp.ocp import OCP
from polympc_tpu.parallel.horizon import schur_horizon_solve

__all__ = ["LongHorizon", "long_horizon_newton_step", "solve_long_horizon"]


class LongHorizon:
    """Static description of the partitioned problem (shapes, pick matrices).

    basis: single-segment basis (e.g. Chebyshev(5)); S segments over
    [t0, tf] of equal length.
    """

    def __init__(self, ocp: OCP, basis: Basis, S: int, t0: float, tf: float,
                 reg: float = 1e-8, delta: float = 1e-8):
        if ocp.np_:
            raise NotImplementedError(
                "global parameters are not supported in the partitioned "
                "horizon yet (the parameter arrow couples all segments)")
        self.ocp, self.basis, self.S = ocp, basis, S
        self.t0, self.tf = float(t0), float(tf)
        self.reg, self.delta = reg, delta
        self.N = basis.order + 1
        self.nx, self.nu = ocp.nx, ocp.nu
        self.nz = self.N * (self.nx + self.nu)
        self.ne = self.N * self.nx
        self.k = self.nz + self.ne          # per-segment KKT size
        self.D = np.asarray(basis.D)                      # (N, N) on [-1, 1]
        self.w = np.asarray(basis.quad_weights)           # (N,)
        self.t_scale = (self.tf - self.t0) / (2.0 * S)
        # segment time grids
        tau = np.asarray(basis.nodes)
        seg_len = (self.tf - self.t0) / S
        self.times = np.stack([
            self.t0 + s * seg_len + (tau + 1.0) * 0.5 * seg_len
            for s in range(S)])                           # (S, N)
        # interface picks on w = [dz; lam]: tail state of s vs head of s+1
        E = np.zeros((self.nx, self.k))
        F = np.zeros((self.nx, self.k))
        E[:, (self.N - 1) * self.nx:self.N * self.nx] = np.eye(self.nx)
        F[:, :self.nx] = -np.eye(self.nx)
        self.E, self.F = E, F

    def split(self, z):
        X = z[..., :self.ne].reshape(*z.shape[:-1], self.N, self.nx)
        U = z[..., self.ne:].reshape(*z.shape[:-1], self.N, self.nu)
        return X, U

    def pack(self, X, U):
        lead = X.shape[:-2]
        return jnp.concatenate(
            [X.reshape(*lead, -1), U.reshape(*lead, -1)], axis=-1)

    def initial_guess(self, x0, dtype=jnp.float64):
        X = jnp.tile(jnp.asarray(x0, dtype)[None, None],
                     (self.S, self.N, 1))
        U = jnp.zeros((self.S, self.N, self.nu), dtype)
        return self.pack(X, U)


def _segment_cost(lh: LongHorizon, z, t_nodes, is_last, d):
    ocp, N = lh.ocp, lh.N
    X, U = lh.split(z)
    val = jnp.zeros((), z.dtype)
    if ocp.lagrange is not None:
        p = jnp.zeros((0,), z.dtype)
        Ls = jax.vmap(lambda x, u, t: ocp.lagrange(x, u, p, d, t))(
            X, U, t_nodes)
        val = val + lh.t_scale * jnp.asarray(lh.w, z.dtype) @ Ls
    if ocp.mayer is not None:
        p = jnp.zeros((0,), z.dtype)
        val = val + jnp.where(is_last, ocp.mayer(X[-1], p, d),
                              jnp.zeros((), z.dtype))
    return val


def _segment_defects(lh: LongHorizon, z, t_nodes, d):
    ocp = lh.ocp
    X, U = lh.split(z)
    p = jnp.zeros((0,), z.dtype)
    fX = jax.vmap(lambda x, u, t: ocp.dynamics(x, u, p, d, t))(X, U, t_nodes)
    D = jnp.asarray(lh.D, z.dtype)
    return (D @ X - lh.t_scale * fX).reshape(-1)


def _segment_kkt(lh: LongHorizon, z, lam, t_nodes, is_last, d, x0, pin0):
    """Local Newton KKT block and rhs for one segment.

    pin0: boolean — segment 0 additionally pins its head state to x0 via a
    quadratic penalty folded into H (keeps every segment's KKT identical in
    structure; the penalty weight is large but finite for conditioning).
    """
    dt = z.dtype
    cost = lambda zz: _segment_cost(lh, zz, t_nodes, is_last, d)
    con = lambda zz: _segment_defects(lh, zz, t_nodes, d)
    g = jax.grad(cost)(z)
    c = con(z)
    A = jax.jacfwd(con)(z)
    H = jax.jacfwd(jax.grad(
        lambda zz: cost(zz) + con(zz) @ lam))(z)
    H = 0.5 * (H + H.T) + lh.reg * jnp.eye(lh.nz, dtype=dt)
    # Gershgorin shift keeps the reduced Hessian PD enough for Newton
    dg = jnp.diagonal(H)
    radii = jnp.sum(jnp.abs(H), axis=1) - jnp.abs(dg)
    shift = jnp.maximum(0.0, -(jnp.min(dg - radii)) + 1e-8)
    H = H + shift * jnp.eye(lh.nz, dtype=dt)

    W = 1e6
    pin = jnp.where(pin0, jnp.asarray(W, dt), jnp.zeros((), dt))
    X, _ = lh.split(z)
    head = X[0]
    Ppin = jnp.zeros((lh.nz,), dt).at[:lh.nx].set(pin)
    H = H + jnp.diag(Ppin)
    g = g + Ppin * jnp.concatenate(
        [head - jnp.asarray(x0, dt), jnp.zeros((lh.nz - lh.nx,), dt)])

    K = jnp.block([
        [H, A.T],
        [A, -lh.delta * jnp.eye(lh.ne, dtype=dt)],
    ])
    b = jnp.concatenate([-g, -c])
    return K, b


def long_horizon_newton_step(lh: LongHorizon, Z, LAM, x0, d=None,
                             mesh: Mesh | None = None, axis: str = "seg"):
    """One full-space Newton step on the partitioned horizon.

    Z (S, nz), LAM (S, ne) current primal/dual iterates; x0 initial state.
    Returns (Z_new, LAM_new, continuity_residual).
    """
    dt = Z.dtype
    S = lh.S
    if d is None:
        d = jnp.zeros((lh.ocp.nd,), dt)
    times = jnp.asarray(lh.times, dt)
    is_last = jnp.arange(S) == S - 1
    pin0 = jnp.arange(S) == 0

    K, b = jax.vmap(
        lambda z, lam, t, il, p0: _segment_kkt(lh, z, lam, t, il, d, x0, p0)
    )(Z, LAM, times, is_last, pin0)

    X, _ = lh.split(Z)
    cont = X[:-1, -1, :] - X[1:, 0, :]             # (S-1, nx) residual
    Ez = jnp.asarray(lh.E, dt)
    Fz = jnp.asarray(lh.F, dt)
    # interface rows act on dz only: E dz_s + F dz_{s+1} = -cont
    Ew = jnp.zeros((lh.nx, lh.k), dt).at[:, :lh.nz].set(Ez[:, :lh.nz])
    Fw = jnp.zeros((lh.nx, lh.k), dt).at[:, :lh.nz].set(Fz[:, :lh.nz])

    w, mu = schur_horizon_solve(K, b, Ew, Fw, -cont, mesh=mesh, axis=axis)
    dZ = w[:, :lh.nz]
    LAM_new = w[:, lh.nz:]
    return Z + dZ, LAM_new, cont


def solve_long_horizon(lh: LongHorizon, x0, iters: int = 10, d=None,
                       mesh: Mesh | None = None, Z0=None,
                       dtype=jnp.float64):
    """Run ``iters`` damped Newton steps from a constant initial guess.

    Returns (Z, LAM, info dict with defect/continuity norms per iterate).
    """
    Z = lh.initial_guess(x0, dtype) if Z0 is None else Z0
    LAM = jnp.zeros((lh.S, lh.ne), dtype)
    if d is None:
        d = jnp.zeros((lh.ocp.nd,), dtype)
    times = jnp.asarray(lh.times, dtype)

    def defect_norm(Z):
        c = jax.vmap(lambda z, t: _segment_defects(lh, z, t, d))(Z, times)
        return jnp.max(jnp.abs(c))

    step = jax.jit(functools.partial(long_horizon_newton_step, lh,
                                     mesh=mesh))
    hist = []
    for _ in range(iters):
        Z2, LAM2, cont = step(Z, LAM, jnp.asarray(x0, dtype), d)
        # simple fraction-to-the-boundary damping on blow-ups
        dn = float(defect_norm(Z2))
        if not np.isfinite(dn):
            Z2 = 0.5 * (Z + Z2)
            LAM2 = 0.5 * (LAM + LAM2)
            dn = float(defect_norm(Z2))
        Z, LAM = Z2, LAM2
        hist.append({"defect": dn,
                     "continuity": float(jnp.max(jnp.abs(cont)))})
    return Z, LAM, hist
