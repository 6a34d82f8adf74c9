"""Distributed constrained SQP for long-horizon OCPs (BASELINE config 5).

The full constrained NMPC stack — SQP + boxADMM with bounds, per-node
inequalities and optimised global parameters — run with the horizon
partitioned across a device mesh.  This supersedes the equality-only Newton
engine (parallel/long_horizon.py) as the scalable path: it is the
reference's SQP/boxADMM pipeline (sqp_base.hpp:569-696 + box_admm.hpp:88-205)
re-architected for segment sharding.

Formulation: the *duplicated-variable* spectral-element form.  Every segment
s owns a private block w_s = [X_s ((p+1), nx); U_s ((p+1), nu)] including its
own copy of the interface node, glued by interface equality constraints

    tail (x, u) of segment s  ==  head (x, u) of segment s+1.

Segment 0 imposes collocation defects at all p+1 of its nodes; segments
s >= 1 impose defects at nodes 1..p only (their head-node defect row is
masked out).  This makes the duplicated NLP *exactly* the fused
boundary-sharing transcription (ocp/transcription.py eq_fn with the
composite-D left-row convention, mirroring continuous_ocp.hpp:313-339) with
interface variables duplicated and pinned by equalities — so solutions match
the single-chip transcription to solver tolerance, not just to
discretisation order.

Distribution: all per-segment quantities are (S, ...) arrays sharded over a
1-D mesh ("seg").  Derivatives are segment-local (vmap over S).  The inner
boxADMM's KKT has per-segment diagonal blocks, thin interface couplings
(the continuity rows' KKT unknowns) and a global parameter border — solved
by schur_horizon_solve: per-segment dense elimination on-chip, tiny
condensed blocks all_gather'ed over ICI, replicated interface+border solve,
local back-substitution (SURVEY.md §2.3 P3).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from polympc_tpu.basis.basis import Basis
from polympc_tpu.ocp.ocp import OCP
from polympc_tpu.parallel.horizon import (
    schur_horizon_solve, schur_horizon_factor, schur_horizon_apply)
from polympc_tpu.utils import status as st

__all__ = ["DistTranscription", "DistBounds", "DistSQPSettings",
           "dist_transcribe", "dist_bounds", "dist_sqp_solve",
           "dist_refine", "dist_kkt_residual",
           "fused_to_segments", "segments_to_fused"]


@dataclasses.dataclass(frozen=True)
class DistSQPSettings:
    """Static settings for the distributed SQP (subset of SQPSettings +
    ADMMSettings; one flat dataclass keeps the carry simple)."""
    max_iter: int = 30
    eps_prim: float = 1e-3
    eps_dual: float = 1e-3
    eps_viol: float = 1e-3
    eps_stat: float = 1e-3
    ls_max_iter: int = 9
    tau: float = 0.5
    eta: float = 1e-4
    merit_mu_safety: float = 1e2
    merit_mu_max: float = 1e6
    reg_eps: float = 1e-8
    # inner ADMM: admm_iters is the total-iteration cap, organised as
    # epochs of check_every iterations — one Schur factorisation per epoch,
    # residual checks / adaptive rho / infeasibility certificates between
    # epochs (full parity with the fused qp/box_admm.py solver)
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    rho_min: float = 1e-6
    rho_max: float = 1e6
    sigma: float = 1e-6
    alpha: float = 1.6
    admm_iters: int = 200
    check_every: int = 25
    # inner tolerances sized for the outer eps_dual/eps_stat tests: 1e-4/
    # 1e-5 leave the QP duals too loose for the SQP's relative dual-step
    # test to settle (measured on the kite S=8 parity problem: 1e-5 stalls
    # at ds ~ 3e-2, 1e-6 converges in 35 iterations with ~5% fewer total
    # inner iterations than the round-3 fixed-length loop)
    eps_abs: float = 1e-6
    eps_rel: float = 1e-6
    # Adaptive rho reaches exact parity with the fused solver on standalone
    # QPs (tests/test_dist_sqp.py:test_dist_admm_matches_fused_qp), but is
    # OFF by default inside the SQP: early SQP linearisations can be
    # certified-infeasible, and scaling rho up on such a QP amplifies the
    # divergent dual ray that the certificate detects — those inflated
    # duals then poison the l1-merit weight and the next QP's dual warm
    # start.  (The fused SQP path survives the same hazard only because its
    # active-set polish replaces the returned duals.)
    adaptive_rho: bool = False
    eps_inf: float = 1e-5
    # "pallas": per-segment Schur elimination via the lane-batched LDL^T
    # kernel (ops/ldlt.py); "lu": XLA pivoted LU
    kkt_solver: str = "lu"
    loose_bound: float = 1e10
    eq_tol: float = 1e-4
    # per-iteration observability: records (cost, violation, primal_step,
    # dual_step) for the first trace_iters SQP iterations (the distributed
    # analogue of SQPSettings.trace_iters / the reference's
    # iteration_callback, sqp_base.hpp:33,685-686)
    trace_iters: int = 0

    def validate(self) -> bool:
        return (self.max_iter > 0 and self.ls_max_iter > 0
                and 0 < self.tau < 1 and self.rho > 0 and self.sigma > 0
                and 0 < self.alpha < 2 and self.admm_iters > 0
                and self.check_every > 0 and self.trace_iters >= 0
                and self.kkt_solver in ("lu", "pallas"))


class DistBounds(NamedTuple):
    """Duplicated-segment bounds pytree."""
    lbw: jnp.ndarray   # (S, kz)
    ubw: jnp.ndarray   # (S, kz)
    lbp: jnp.ndarray   # (np,)
    ubp: jnp.ndarray   # (np,)
    gl: jnp.ndarray    # (mg,) per-segment inequality row bounds
    gu: jnp.ndarray    # (mg,)


@dataclasses.dataclass(frozen=True)
class DistTranscription:
    """Static per-segment transcription data (the distributed analogue of
    ocp/transcription.py:Transcription)."""
    ocp: OCP
    basis: Basis
    S: int
    t0: float
    tf: float

    def __post_init__(self):
        if not (self.basis.has_left_endpoint and self.basis.has_right_endpoint):
            raise ValueError("segment duplication needs a Lobatto basis "
                             "(both endpoints in the node set)")

    @property
    def N(self) -> int:
        return self.basis.order + 1           # nodes per segment

    @property
    def kz(self) -> int:
        return self.N * (self.ocp.nx + self.ocp.nu)

    @property
    def me(self) -> int:
        return self.N * self.ocp.nx           # defect rows (head row masked)

    @property
    def mg(self) -> int:
        return self.N * self.ocp.ng

    @property
    def ml(self) -> int:
        return self.me + self.mg

    @property
    def p_if(self) -> int:
        return self.ocp.nx + self.ocp.nu      # interface rows (x and u glue)

    @property
    def t_scale(self) -> float:
        return (self.tf - self.t0) / (2.0 * self.S)

    @functools.cached_property
    def times(self) -> np.ndarray:
        tau = np.asarray(self.basis.nodes)
        L = (self.tf - self.t0) / self.S
        return np.stack([self.t0 + s * L + (tau + 1.0) * 0.5 * L
                         for s in range(self.S)])          # (S, N)

    @functools.cached_property
    def picks(self):
        """Interface picks E (tail of s), F (-head of s+1) on w = [X; U]."""
        N, nx, nu = self.N, self.ocp.nx, self.ocp.nu
        E = np.zeros((self.p_if, self.kz))
        F = np.zeros((self.p_if, self.kz))
        E[:nx, (N - 1) * nx:N * nx] = np.eye(nx)
        E[nx:, N * nx + (N - 1) * nu:] = np.eye(nu)
        F[:nx, :nx] = -np.eye(nx)
        F[nx:, N * nx:N * nx + nu] = -np.eye(nu)
        return E, F

    def split(self, w):
        N, nx = self.N, self.ocp.nx
        X = w[..., :N * nx].reshape(*w.shape[:-1], N, nx)
        U = w[..., N * nx:].reshape(*w.shape[:-1], N, self.ocp.nu)
        return X, U

    def pack(self, X, U):
        lead = X.shape[:-2]
        return jnp.concatenate(
            [X.reshape(*lead, -1), U.reshape(*lead, -1)], axis=-1)

    # ---- per-segment problem functions (w_s (kz,), P (np,)) ----

    def seg_cost(self, w, Pv, t_nodes, is_last, d):
        ocp = self.ocp
        X, U = self.split(w)
        val = jnp.zeros((), w.dtype)
        if ocp.lagrange is not None:
            Ls = jax.vmap(lambda x, u, t: ocp.lagrange(x, u, Pv, d, t))(
                X, U, t_nodes)
            val = val + self.t_scale * (
                jnp.asarray(self.basis.quad_weights, w.dtype) @ Ls)
        if ocp.mayer is not None:
            val = val + jnp.where(is_last, ocp.mayer(X[-1], Pv, d),
                                  jnp.zeros((), w.dtype))
        return val

    def seg_eq(self, w, Pv, t_nodes, mask_head, d):
        """Collocation defects at all N nodes; the head-node rows are
        multiplied by ``mask_head`` (0 for segments s >= 1, whose head
        defect is replaced by the interface continuity row — matching the
        fused composite-D left-row convention)."""
        ocp = self.ocp
        X, U = self.split(w)
        f = jax.vmap(lambda x, u, t: ocp.dynamics(x, u, Pv, d, t))(
            X, U, t_nodes)
        D = jnp.asarray(self.basis.D, w.dtype)
        rows = D @ X - self.t_scale * f                    # (N, nx)
        rows = rows.at[0].multiply(mask_head)
        return rows.reshape(-1)

    def seg_ineq(self, w, Pv, t_nodes, d):
        ocp = self.ocp
        X, U = self.split(w)
        G = jax.vmap(lambda x, u, t: ocp.ineq(x, u, Pv, d, t))(X, U, t_nodes)
        return G.reshape(-1)

    def seg_con(self, w, Pv, t_nodes, mask_head, d):
        c = self.seg_eq(w, Pv, t_nodes, mask_head, d)
        if self.ocp.ng:
            c = jnp.concatenate([c, self.seg_ineq(w, Pv, t_nodes, d)])
        return c

    def initial_guess(self, x0, dtype=jnp.float64):
        X = jnp.tile(jnp.asarray(x0, dtype)[None, None], (self.S, self.N, 1))
        U = jnp.zeros((self.S, self.N, self.ocp.nu), dtype)
        return self.pack(X, U), jnp.zeros((self.ocp.np_,), dtype)

    def rollout_guess(self, x0, d=None, Pv=None, substeps: int = 4,
                      dtype=jnp.float64):
        """RK4 rollout through the whole time grid (zero controls), then
        split into duplicated segments."""
        ocp = self.ocp
        d = jnp.zeros((ocp.nd,), dtype) if d is None else jnp.asarray(d, dtype)
        Pv = jnp.zeros((ocp.np_,), dtype) if Pv is None \
            else jnp.asarray(Pv, dtype)
        tg = jnp.asarray(self.times, dtype)                # (S, N)

        def f(x, t):
            return ocp.dynamics(x, jnp.zeros((ocp.nu,), dtype), Pv, d, t)

        def step(x, args):
            t0_, t1_ = args
            h = (t1_ - t0_) / substeps

            def sub(x, _):
                k1 = f(x, t0_)
                k2 = f(x + 0.5 * h * k1, t0_)
                k3 = f(x + 0.5 * h * k2, t0_)
                k4 = f(x + h * k3, t0_)
                return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None
            x, _ = jax.lax.scan(sub, x, None, length=substeps)
            return x, x

        flat_t = tg.reshape(-1)
        _, X_tail = jax.lax.scan(step, jnp.asarray(x0, dtype),
                                 (flat_t[:-1], flat_t[1:]))
        X_all = jnp.concatenate([jnp.asarray(x0, dtype)[None], X_tail])
        X = X_all.reshape(self.S, self.N, ocp.nx)
        U = jnp.zeros((self.S, self.N, ocp.nu), dtype)
        return self.pack(X, U), Pv


def dist_transcribe(ocp: OCP, basis: Basis, S: int, t0: float, tf: float
                    ) -> DistTranscription:
    if S < 2:
        raise ValueError(
            f"dist_transcribe needs S >= 2 segments to partition (got {S}); "
            "use the single-chip ocp.transcribe path for one segment")
    return DistTranscription(ocp=ocp, basis=basis, S=S, t0=float(t0),
                             tf=float(tf))


def dist_bounds(dtr: DistTranscription, xl=None, xu=None, ul=None, uu=None,
                pl=None, pu=None, gl=None, gu=None, x0=None,
                dtype=jnp.float64) -> DistBounds:
    """Per-variable OCP bounds -> duplicated-segment box/row bounds
    (the distributed ocp_bounds)."""
    inf = jnp.inf
    ocp, N, S = dtr.ocp, dtr.N, dtr.S

    def fill(v, size, default):
        return jnp.full(size, default, dtype) if v is None \
            else jnp.asarray(v, dtype)

    xlv = fill(xl, ocp.nx, -inf)
    xuv = fill(xu, ocp.nx, inf)
    ulv = fill(ul, ocp.nu, -inf)
    uuv = fill(uu, ocp.nu, inf)
    lbw = jnp.concatenate([jnp.tile(xlv, N), jnp.tile(ulv, N)])
    ubw = jnp.concatenate([jnp.tile(xuv, N), jnp.tile(uuv, N)])
    lbw = jnp.tile(lbw[None], (S, 1))
    ubw = jnp.tile(ubw[None], (S, 1))
    if x0 is not None:
        x0v = jnp.asarray(x0, dtype)
        lbw = lbw.at[0, :ocp.nx].set(x0v)
        ubw = ubw.at[0, :ocp.nx].set(x0v)
    lbp = fill(pl, ocp.np_, -inf)
    ubp = fill(pu, ocp.np_, inf)
    glv = jnp.tile(fill(gl, ocp.ng, -inf), N)
    guv = jnp.tile(fill(gu, ocp.ng, inf), N)
    return DistBounds(lbw, ubw, lbp, ubp, glv, guv)


# ---------------------------------------------------------------------------
# fused <-> duplicated layout converters (for parity tests and warm starts)
# ---------------------------------------------------------------------------

def fused_to_segments(dtr: DistTranscription, X, U):
    """Fused global-grid (Ng, nx)/(Ng, nu) with Ng = p*S+1 -> duplicated
    (S, kz)."""
    p = dtr.basis.order
    idx = np.stack([np.arange(s * p, s * p + p + 1) for s in range(dtr.S)])
    return dtr.pack(jnp.asarray(X)[idx], jnp.asarray(U)[idx])


def segments_to_fused(dtr: DistTranscription, W):
    """Duplicated (S, kz) -> fused global grid (p*S+1, nx)/(.., nu),
    averaging the duplicated interface nodes."""
    p = dtr.basis.order
    X, U = dtr.split(W)                       # (S, N, nx/nu)
    Ng = p * dtr.S + 1

    def fuse(V):
        out = jnp.zeros((Ng, V.shape[-1]), V.dtype)
        cnt = jnp.zeros((Ng, 1), V.dtype)
        for s in range(dtr.S):
            sl = slice(s * p, s * p + p + 1)
            out = out.at[sl].add(V[s])
            cnt = cnt.at[sl].add(1.0)
        return out / cnt
    return fuse(X), fuse(U)


# ---------------------------------------------------------------------------
# the distributed SQP
# ---------------------------------------------------------------------------

def _violation_l1(c_loc, cl, cu, r_if, W, lbw, ubw, Pv, lbp, ubp):
    """Global l1 violation (merit term; ref sqp_base.hpp:423-474)."""
    vc = jnp.sum(jnp.maximum(c_loc - cu[None], 0.0)
                 + jnp.maximum(cl[None] - c_loc, 0.0))
    vi = jnp.sum(jnp.abs(r_if)) if r_if.size else 0.0
    vw = jnp.sum(jnp.maximum(W - ubw, 0.0) + jnp.maximum(lbw - W, 0.0))
    vp = jnp.sum(jnp.maximum(Pv - ubp, 0.0) + jnp.maximum(lbp - Pv, 0.0)) \
        if Pv.size else 0.0
    return vc + vi + vw + vp


def _violation_inf(c_loc, cl, cu, r_if, W, lbw, ubw, Pv, lbp, ubp):
    parts = [jnp.max(jnp.maximum(jnp.maximum(c_loc - cu[None], 0.0),
                                 jnp.maximum(cl[None] - c_loc, 0.0)),
                     initial=0.0),
             jnp.max(jnp.abs(r_if), initial=0.0) if r_if.size else 0.0,
             jnp.max(jnp.maximum(jnp.maximum(W - ubw, 0.0),
                                 jnp.maximum(lbw - W, 0.0)), initial=0.0)]
    if Pv.size:
        parts.append(jnp.max(jnp.maximum(jnp.maximum(Pv - ubp, 0.0),
                                         jnp.maximum(lbp - Pv, 0.0)),
                             initial=0.0))
    return functools.reduce(jnp.maximum, parts)


def _dist_admm(dtr: DistTranscription, Hs, HsP, HPP, gW, gP,
               A, AP, al, au, lw, uw, lp, up, r_if,
               y_loc0, y_if0, ybW0, ybP0,
               settings: DistSQPSettings, mesh, axis):
    """Inner boxADMM on the segment-partitioned QP (the distributed
    box_admm.hpp:88-205), at full parity with the fused solver
    (qp/box_admm.py): epochs of ``check_every`` iterations on one Schur
    factorisation, residual-based termination, adaptive rho
    (box_admm.hpp:433-445) with per-epoch refactorisation, and OSQP §3.4
    infeasibility certificates on the epoch increments.

    QP: min 1/2 [dW;dP]' H [dW;dP] + g'[dW;dP]
        s.t. A_s dw_s + AP_s dP in [al_s, au_s]       (local rows, (S, ml))
             E dw_s + F dw_{s+1} = -r_if_s            (interface rows)
             lw <= dw <= uw,  lp <= dP <= up          (box)
    Returns (dW, dP, y_loc, y_if, ybW, ybP, iters, status, rp, rd).
    """
    S, kz, ml = dtr.S, dtr.kz, dtr.ml
    p_if = dtr.p_if
    np_ = dtr.ocp.np_
    dt = gW.dtype
    sigma = jnp.asarray(settings.sigma, dt)
    alpha = jnp.asarray(settings.alpha, dt)
    Epk, Fpk = dtr.picks
    # interface picks on the KKT block w = [dw; nu_loc]
    k = kz + ml
    E = jnp.zeros((p_if, k), dt).at[:, :kz].set(jnp.asarray(Epk, dt))
    F = jnp.zeros((p_if, k), dt).at[:, :kz].set(jnp.asarray(Fpk, dt))

    # rho classification (ref box_admm.hpp:357-396), matching the fused
    # path's classify_constraints/rho_vector: equality rows (spread below
    # eq_tol) get rho*rho_eq_scale, loose rows rho_min, everything clipped
    # into [rho_min, rho_max].  Defect rows (incl the masked dummy rows) and
    # interface rows are equalities.
    eq_row = (au - al) < settings.eq_tol                  # (S, ml)
    loose = (al < -settings.loose_bound) & (au > settings.loose_bound)
    boxW_loose = (lw < -settings.loose_bound) & (uw > settings.loose_bound)
    boxW_eq = (uw - lw) < settings.eq_tol
    boxP_loose = (lp < -settings.loose_bound) & (up > settings.loose_bound)
    boxP_eq = (up - lp) < settings.eq_tol

    def make_rhos(rho_base):
        """Per-constraint penalties from the adapted base rho, matching the
        fused classify_constraints/rho_vector (box_admm.hpp:357-396)."""
        rho_eq = jnp.clip(rho_base * settings.rho_eq_scale,
                          settings.rho_min, settings.rho_max)
        rho_loc = jnp.clip(
            jnp.where(eq_row, rho_eq,
                      jnp.where(loose, settings.rho_min, rho_base)),
            settings.rho_min, settings.rho_max)
        rho_if = jnp.full((p_if,), rho_eq, dt)
        rbW = jnp.clip(
            jnp.where(boxW_eq, rho_eq,
                      jnp.where(boxW_loose, settings.rho_min, rho_base)),
            settings.rho_min, settings.rho_max)
        rbP = jnp.clip(
            jnp.where(boxP_eq, rho_eq,
                      jnp.where(boxP_loose, settings.rho_min, rho_base)),
            settings.rho_min, settings.rho_max)
        return rho_loc, rho_if, rbW, rbP

    c_if_target = -r_if                                   # (S-1, p_if)
    eyek = jnp.eye(kz, dtype=dt)
    pad1 = jnp.zeros((1, p_if), dt)
    Ew, Fw = jnp.asarray(Epk, dt), jnp.asarray(Fpk, dt)
    inf_norm = lambda v: jnp.max(jnp.abs(v), initial=0.0)

    def _Hx(xW, xP):
        hW = jnp.einsum("skj,sj->sk", Hs, xW)
        if np_:
            hW = hW + jnp.einsum("ska,a->sk", HsP, xP)
            hP = jnp.einsum("ska,sk->a", HsP, xW) + HPP @ xP
        else:
            hP = xP
        return hW, hP

    def _Ax(xW, xP):
        ax = jnp.einsum("smk,sk->sm", A, xW)
        if np_:
            ax = ax + jnp.einsum("sma,a->sm", AP, xP)
        return ax

    def _if_of(xW):
        return (jnp.einsum("pk,sk->sp", Ew, xW[:-1])
                + jnp.einsum("pk,sk->sp", Fw, xW[1:]))

    def _ATy(y_loc, y_if, ybW, ybP):
        aty = jnp.einsum("smk,sm->sk", A, y_loc)
        aty = aty + jnp.einsum("pk,sp->sk", Ew,
                               jnp.concatenate([y_if, pad1], axis=0)) \
            + jnp.einsum("pk,sp->sk", Fw,
                         jnp.concatenate([pad1, y_if], axis=0)) + ybW
        atyP = (jnp.einsum("sma,sm->a", AP, y_loc) + ybP) if np_ else ybP
        return aty, atyP

    def _residuals_dist(xW, xP, z_loc, z_if, q_W, q_P, y_loc, y_if, ybW,
                        ybP):
        """OSQP primal/dual residuals of the partitioned QP (the
        distributed qp/box_admm.py:_residuals)."""
        Ax = _Ax(xW, xP)
        ifx = _if_of(xW)
        r_prim = jnp.maximum(
            jnp.maximum(inf_norm(Ax - z_loc), inf_norm(ifx - z_if)),
            jnp.maximum(inf_norm(xW - q_W), inf_norm(xP - q_P)))
        hW, hP = _Hx(xW, xP)
        atyW, atyP = _ATy(y_loc, y_if, ybW, ybP)
        r_dual = jnp.maximum(inf_norm(hW + gW + atyW),
                             inf_norm(hP + gP + atyP) if np_
                             else jnp.zeros((), dt))
        prim_scale = jnp.maximum(
            jnp.maximum(inf_norm(Ax), jnp.maximum(inf_norm(z_loc),
                                                  inf_norm(ifx))),
            jnp.maximum(jnp.maximum(inf_norm(xW), inf_norm(q_W)),
                        jnp.maximum(inf_norm(xP), inf_norm(q_P))))
        dual_scale = jnp.maximum(
            jnp.maximum(inf_norm(hW) if not np_ else
                        jnp.maximum(inf_norm(hW), inf_norm(hP)),
                        jnp.maximum(inf_norm(atyW), inf_norm(atyP))),
            jnp.maximum(jnp.maximum(inf_norm(gW), inf_norm(gP)),
                        jnp.maximum(inf_norm(ybW), inf_norm(ybP))))
        return r_prim, r_dual, prim_scale, dual_scale

    def _supp(b, v):
        return jnp.sum(jnp.where(v == 0.0, 0.0, b * v)) if b.size else \
            jnp.zeros((), dt)

    def _certificates(dxW, dxP, dy_loc, dy_if, dybW, dybP):
        """OSQP §3.4 infeasibility tests on the epoch increments — the
        distributed analogue of qp/box_admm.py:_infeasibility_certificates
        (interface rows are equalities with value c_if_target)."""
        nrm_y = jnp.maximum(
            jnp.maximum(inf_norm(dy_loc), inf_norm(dy_if)),
            jnp.maximum(inf_norm(dybW), inf_norm(dybP)))
        atyW, atyP = _ATy(dy_loc, dy_if, dybW, dybP)
        at_nrm = jnp.maximum(inf_norm(atyW),
                             inf_norm(atyP) if np_ else jnp.zeros((), dt))
        supp = (_supp(au, jnp.maximum(dy_loc, 0.0))
                + _supp(al, jnp.minimum(dy_loc, 0.0))
                + _supp(c_if_target, dy_if)
                + _supp(uw, jnp.maximum(dybW, 0.0))
                + _supp(lw, jnp.minimum(dybW, 0.0))
                + _supp(up, jnp.maximum(dybP, 0.0))
                + _supp(lp, jnp.minimum(dybP, 0.0)))
        eps_inf = settings.eps_inf
        prim_inf = (nrm_y > 0.0) & (at_nrm <= eps_inf * nrm_y) \
            & (supp <= -eps_inf * nrm_y)

        nrm_x = jnp.maximum(inf_norm(dxW), inf_norm(dxP))
        tol = eps_inf * nrm_x
        hW, hP = _Hx(dxW, dxP)
        h_nrm = jnp.maximum(inf_norm(hW),
                            inf_norm(hP) if np_ else jnp.zeros((), dt))
        gdx = jnp.sum(gW * dxW) + (gP @ dxP if np_ else 0.0)
        Adx = _Ax(dxW, dxP)
        ifdx = _if_of(dxW)

        def cone_ok(v, lo, up_):
            up_ok = jnp.where(jnp.isfinite(up_), v <= tol, True)
            lo_ok = jnp.where(jnp.isfinite(lo), v >= -tol, True)
            return jnp.all(up_ok & lo_ok) if v.size else jnp.asarray(True)

        dual_inf = (nrm_x > 0.0) & (h_nrm <= tol) & (gdx <= -tol) \
            & cone_ok(Adx, al, au) \
            & (inf_norm(ifdx) <= tol) \
            & cone_ok(dxW, lw, uw) & cone_ok(dxP, lp, up)
        return prim_inf, dual_inf

    check_every = settings.check_every
    max_epochs = max(1, settings.admm_iters // check_every)

    def epoch_body(carry):
        (xW, xP, z_loc, z_if, q_W, q_P, y_loc, y_if, ybW, ybP,
         rho_base, epoch, done, rp, rd, div, pinf, dinf) = carry
        rho_loc, rho_if, rbW, rbP = make_rhos(rho_base)
        # KKT blocks + one Schur factorisation per epoch (fused analogue:
        # box_admm.py epoch_body's _build_kkt + factor); the per-segment
        # elimination goes through the Pallas LDL^T when
        # settings.kkt_solver == "pallas"
        K = jnp.concatenate([
            jnp.concatenate([Hs + sigma * eyek[None]
                             + jax.vmap(jnp.diag)(rbW),
                             jnp.swapaxes(A, 1, 2)], axis=2),
            jnp.concatenate([A, -jax.vmap(jnp.diag)(1.0 / rho_loc)],
                            axis=2),
        ], axis=1)                                        # (S, k, k)
        G = jnp.tile((-jnp.diag(1.0 / rho_if))[None], (S - 1, 1, 1))
        if np_:
            C = jnp.concatenate([HsP, AP], axis=1)        # (S, k, np_)
            Dg = HPP + sigma * jnp.eye(np_, dtype=dt) + jnp.diag(rbP)
        else:
            C = Dg = None
        fac = schur_horizon_factor(K, E, F, mesh=mesh, axis=axis, G=G,
                                   C=C, Dg=Dg,
                                   kkt_solver=settings.kkt_solver)

        def iteration(_, state):
            xW, xP, z_loc, z_if, q_W, q_P, y_loc, y_if, ybW, ybP = state
            rhs_w = sigma * xW + rbW * q_W - ybW - gW     # (S, kz)
            rhs_l = z_loc - y_loc / rho_loc               # (S, ml)
            b = jnp.concatenate([rhs_w, rhs_l], axis=1)   # (S, k)
            c_if = z_if - y_if / rho_if[None]             # (S-1, p_if)
            if np_:
                bg = sigma * xP + rbP * q_P - ybP - gP
                w, nu_if, g_sol = schur_horizon_apply(fac, b, c_if, bg=bg)
            else:
                w, nu_if = schur_horizon_apply(fac, b, c_if)
                g_sol = xP
            xW_t = w[:, :kz]
            nu_loc = w[:, kz:]

            # primal updates (over-relaxed)
            xW2 = alpha * xW_t + (1 - alpha) * xW
            xP2 = alpha * g_sol + (1 - alpha) * xP if np_ else xP
            # box split q/yb (W then P)
            qW_u = alpha * xW_t + (1 - alpha) * q_W
            qW2 = jnp.clip(qW_u + ybW / rbW, lw, uw)
            ybW2 = ybW + rbW * (qW_u - qW2)
            if np_:
                qP_u = alpha * g_sol + (1 - alpha) * q_P
                qP2 = jnp.clip(qP_u + ybP / rbP, lp, up)
                ybP2 = ybP + rbP * (qP_u - qP2)
            else:
                qP2, ybP2 = q_P, ybP
            # local constraint split
            zl_t = z_loc + (nu_loc - y_loc) / rho_loc
            zl_u = alpha * zl_t + (1 - alpha) * z_loc
            zl2 = jnp.clip(zl_u + y_loc / rho_loc, al, au)
            yl2 = y_loc + rho_loc * (zl_u - zl2)
            # interface split (pure equality rows)
            zi_t = z_if + (nu_if - y_if) / rho_if[None]
            zi_u = alpha * zi_t + (1 - alpha) * z_if
            zi2 = jnp.clip(zi_u + y_if / rho_if[None], c_if_target,
                           c_if_target)
            yi2 = y_if + rho_if[None] * (zi_u - zi2)
            return (xW2, xP2, zl2, zi2, qW2, qP2, yl2, yi2, ybW2, ybP2)

        state0 = (xW, xP, z_loc, z_if, q_W, q_P, y_loc, y_if, ybW, ybP)
        out = jax.lax.fori_loop(0, check_every, iteration, state0)
        (xW2, xP2, zl2, zi2, qW2, qP2, yl2, yi2, ybW2, ybP2) = out

        # divergence guard (fused analogue box_admm.py:324-331)
        finite = (jnp.all(jnp.isfinite(xW2)) & jnp.all(jnp.isfinite(yl2))
                  & jnp.all(jnp.isfinite(yi2)) & jnp.all(jnp.isfinite(ybW2))
                  & jnp.all(jnp.isfinite(xP2)) & jnp.all(jnp.isfinite(ybP2)))
        keepf = lambda nw, o: jnp.where(finite, nw, o)
        xW2, xP2 = keepf(xW2, xW), keepf(xP2, xP)
        zl2, zi2 = keepf(zl2, z_loc), keepf(zi2, z_if)
        qW2, qP2 = keepf(qW2, q_W), keepf(qP2, q_P)
        yl2, yi2 = keepf(yl2, y_loc), keepf(yi2, y_if)
        ybW2, ybP2 = keepf(ybW2, ybW), keepf(ybP2, ybP)

        rp2, rd2, ps, ds = _residuals_dist(xW2, xP2, zl2, zi2, qW2, qP2,
                                           yl2, yi2, ybW2, ybP2)
        eps_p = settings.eps_abs + settings.eps_rel * ps
        eps_d = settings.eps_abs + settings.eps_rel * ds
        conv = (rp2 <= eps_p) & (rd2 <= eps_d)
        div2 = div | ~finite

        pinf_new, dinf_new = _certificates(
            xW2 - xW, xP2 - xP, yl2 - y_loc, yi2 - y_if,
            ybW2 - ybW, ybP2 - ybP)
        pinf2 = pinf | (pinf_new & finite & ~conv)
        dinf2 = dinf | (dinf_new & finite & ~conv)

        if settings.adaptive_rho:
            # rho <- rho * sqrt(relative primal/dual residual ratio)
            # (box_admm.hpp:433-445; OSQP eq. 28)
            num = rp2 / jnp.maximum(ps, 1e-12)
            den = rd2 / jnp.maximum(ds, 1e-12)
            scale = jnp.clip(jnp.sqrt(num / jnp.maximum(den, 1e-12)),
                             1e-3, 1e3)
            rho_next = jnp.clip(rho_base * scale, settings.rho_min,
                                settings.rho_max)
        else:
            rho_next = rho_base

        keep = done
        old = (xW, xP, z_loc, z_if, q_W, q_P, y_loc, y_if, ybW, ybP,
               rho_base, epoch, done, rp, rd, div, pinf, dinf)
        new = (xW2, xP2, zl2, zi2, qW2, qP2, yl2, yi2, ybW2, ybP2,
               rho_next, epoch + 1, conv | div2 | pinf2 | dinf2,
               rp2, rd2, div2, pinf2, dinf2)
        return tuple(jnp.where(keep, o, nw) for o, nw in zip(old, new))

    def epoch_cond(carry):
        epoch, done = carry[11], carry[12]
        return (~done) & (epoch < max_epochs)

    xW0 = jnp.zeros((S, kz), dt)
    xP0 = jnp.zeros((np_,), dt)
    z_loc0 = jnp.zeros((S, ml), dt)
    z_if0 = jnp.zeros((S - 1, p_if), dt)
    init = (xW0, xP0, z_loc0, z_if0, xW0, xP0,
            y_loc0, y_if0, ybW0, ybP0,
            jnp.asarray(settings.rho, dt), jnp.zeros((), jnp.int32),
            jnp.zeros((), bool), jnp.asarray(jnp.inf, dt),
            jnp.asarray(jnp.inf, dt), jnp.zeros((), bool),
            jnp.zeros((), bool), jnp.zeros((), bool))
    (xW, xP, z_loc, z_if, q_W, q_P, y_loc, y_if, ybW, ybP,
     rho_base, epochs, done, rp, rd, div, pinf, dinf) = jax.lax.while_loop(
        epoch_cond, epoch_body, init)

    status = jnp.where(
        div, st.UNSOLVED,
        jnp.where(pinf, st.INFEASIBLE,
                  jnp.where(dinf, st.INCONSISTENT,
                            jnp.where(done, st.SOLVED,
                                      st.MAX_ITER_EXCEEDED)))).astype(
        jnp.int32)
    iters = (epochs * check_every).astype(jnp.int32)
    return xW, xP, y_loc, y_if, ybW, ybP, iters, status, rp, rd


def dist_sqp_solve(dtr: DistTranscription, bounds: DistBounds,
                   W0, P0=None, d=None,
                   settings: DistSQPSettings = DistSQPSettings(),
                   mesh: Optional[Mesh] = None, axis: str = "seg",
                   lam_loc0=None, lam_if0=None, lam_bw0=None, lam_bp0=None):
    """Solve the duplicated-segment OCP NLP with SQP + distributed boxADMM.

    W0 (S, kz): per-segment primal initial guess; P0 (np,).
    Returns a dict with W, P, duals, status, iters, and diagnostics.
    The SQP loop mirrors nlp/sqp.py (l1-merit fixed-trial line search,
    QP bound shifting sqp_base.hpp:586-593, relative termination).
    """
    if not settings.validate():
        raise ValueError("invalid settings")
    ocp = dtr.ocp
    S, kz, ml, np_ = dtr.S, dtr.kz, dtr.ml, ocp.np_
    dt = W0.dtype
    Pv0 = jnp.zeros((np_,), dt) if P0 is None else P0.astype(dt)
    d = jnp.zeros((ocp.nd,), dt) if d is None else jnp.asarray(d, dt)
    times = jnp.asarray(dtr.times, dt)
    is_last = jnp.arange(S) == S - 1
    mask_head = jnp.where(jnp.arange(S) == 0, 1.0, 0.0).astype(dt)
    Epk, Fpk = dtr.picks
    Ew = jnp.asarray(Epk, dt)
    Fw = jnp.asarray(Fpk, dt)

    # local row bounds: defects = 0 (masked rows read 0 = 0), ineq [gl, gu]
    cl = jnp.concatenate([jnp.zeros(dtr.me, dt), bounds.gl.astype(dt)]) \
        if ocp.ng else jnp.zeros(dtr.me, dt)
    cu = jnp.concatenate([jnp.zeros(dtr.me, dt), bounds.gu.astype(dt)]) \
        if ocp.ng else jnp.zeros(dtr.me, dt)

    lbw, ubw = bounds.lbw.astype(dt), bounds.ubw.astype(dt)
    lbp, ubp = bounds.lbp.astype(dt), bounds.ubp.astype(dt)

    def total_cost(W, Pv):
        return jnp.sum(jax.vmap(
            lambda w, t, il: dtr.seg_cost(w, Pv, t, il, d))(W, times, is_last))

    def all_con(W, Pv):
        return jax.vmap(lambda w, t, mh: dtr.seg_con(w, Pv, t, mh, d))(
            W, times, mask_head)                           # (S, ml)

    def if_residual(W):
        return (jnp.einsum("pk,sk->sp", Ew, W[:-1])
                + jnp.einsum("pk,sk->sp", Fw, W[1:]))      # (S-1, p_if)

    def merit_parts(W, Pv):
        c = all_con(W, Pv)
        r = if_residual(W)
        return (total_cost(W, Pv),
                _violation_l1(c, cl, cu, r, W, lbw, ubw, Pv, lbp, ubp))

    def seg_derivs(W, Pv, lam_loc):
        """Per-segment gradient/Jacobian/Hessian blocks (vmapped)."""
        def one(w, t, il, mh, ll):
            wp = jnp.concatenate([w, Pv])

            def cost_joint(v):
                return dtr.seg_cost(v[:kz], v[kz:], t, il, d)

            def con_joint(v):
                return dtr.seg_con(v[:kz], v[kz:], t, mh, d)

            g = jax.grad(cost_joint)(wp)
            c = con_joint(wp)
            J = jax.jacfwd(con_joint)(wp)                  # (ml, kz+np)

            def lagr(v):
                return cost_joint(v) + con_joint(v) @ ll
            Hn = jax.jacfwd(jax.grad(lagr))(wp)            # (kz+np, kz+np)
            return g, c, J, Hn
        return jax.vmap(one)(W, times, is_last, mask_head, lam_loc)

    alphas = jnp.asarray(settings.tau, dt) ** jnp.arange(settings.ls_max_iter)

    def body(carry):
        (W, Pv, lam_loc, lam_if, lam_bw, lam_bp, it, done,
         ps, ds, vi, qp_iters_acc, qp_status, trace) = carry

        g, c, J, Hn = seg_derivs(W, Pv, lam_loc)
        gW = g[:, :kz]                                     # (S, kz)
        gP = jnp.sum(g[:, kz:], axis=0)                    # (np,)
        A = J[:, :, :kz]
        AP = J[:, :, kz:]
        # eigenvalue-mirror regularisation per segment joint block: the
        # global Lagrangian Hessian is exactly the sum of these lifted
        # blocks (segment-separable cost/constraints), so mirroring each
        # block yields a PSD global model Hessian — without the crushing
        # uniform shift a Gershgorin bound would impose (reg hook analogue
        # of sqp_base.hpp:317)
        def mirror(Hb):
            ev, V = jnp.linalg.eigh(0.5 * (Hb + Hb.T))
            ev = jnp.maximum(jnp.abs(ev), settings.reg_eps)
            return (V * ev[None, :]) @ V.T
        Hn = jax.vmap(mirror)(Hn)
        Hs = Hn[:, :kz, :kz]
        HsP = Hn[:, :kz, kz:]
        HPP2 = jnp.sum(Hn[:, kz:, kz:], axis=0)
        r_if = if_residual(W)

        # QP row/box bounds shifted by the current iterate
        # (ref: sqp_base.hpp:586-593)
        (dW, dP, yl_qp, yi_qp, ybw_qp, ybp_qp, qp_it, qp_st,
         _qp_rp, _qp_rd) = _dist_admm(
            dtr, Hs, HsP, HPP2, gW, gP, A, AP,
            cl[None] - c, cu[None] - c, lbw - W, ubw - W,
            lbp - Pv, ubp - Pv, r_if,
            lam_loc, lam_if, lam_bw, lam_bp, settings, mesh, axis)

        ok = (jnp.all(jnp.isfinite(dW)) & jnp.all(jnp.isfinite(dP))
              & jnp.all(jnp.isfinite(yl_qp)) & jnp.all(jnp.isfinite(yi_qp)))
        dW = jnp.where(ok, dW, 0.0)
        dP = jnp.where(ok, dP, 0.0)
        yl_qp = jnp.where(ok, yl_qp, lam_loc)
        yi_qp = jnp.where(ok, yi_qp, lam_if)
        ybw_qp = jnp.where(ok, ybw_qp, lam_bw)
        ybp_qp = jnp.where(ok, ybp_qp, lam_bp)
        dW = jnp.clip(dW, lbw - W, ubw - W)
        dP = jnp.clip(dP, lbp - Pv, ubp - Pv) if np_ else dP

        # --- l1-merit fixed-trial line search (sqp.py:187-246 pattern) ---
        f0, v0 = merit_parts(W, Pv)
        dphi_f = jnp.sum(gW * dW) + (gP @ dP if np_ else 0.0)
        trial = jax.vmap(lambda a: merit_parts(W + a * dW, Pv + a * dP))
        trial_f, trial_v = trial(alphas)
        bad = jnp.isnan(trial_f) | jnp.isnan(trial_v)
        trial_f = jnp.where(bad, jnp.inf, trial_f)
        trial_v = jnp.where(bad, jnp.inf, trial_v)
        mu = jnp.minimum(
            settings.merit_mu_safety + jnp.maximum(
                jnp.max(jnp.abs(yl_qp), initial=0.0),
                jnp.maximum(
                    jnp.max(jnp.abs(yi_qp), initial=0.0),
                    jnp.maximum(jnp.max(jnp.abs(ybw_qp), initial=0.0),
                                jnp.max(jnp.abs(ybp_qp), initial=0.0)))),
            settings.merit_mu_max)
        phi0 = f0 + mu * v0
        dphi = dphi_f - mu * v0
        phis = trial_f + mu * trial_v
        okt = phis <= phi0 + settings.eta * alphas * dphi
        first = jnp.argmax(okt)
        finite = jnp.isfinite(phis)
        improve = (phis < phi0) & finite
        best = jnp.argmin(jnp.where(improve, phis, jnp.inf))
        smallest = (settings.ls_max_iter - 1
                    - jnp.argmax(jnp.flip(finite)).astype(jnp.int32))
        fallback = jnp.where(jnp.any(improve), best,
                             jnp.where(jnp.any(finite), smallest, 0))
        alpha = jnp.where(jnp.any(okt), alphas[first], alphas[fallback])
        alpha = jnp.where(jnp.any(finite), alpha, jnp.zeros((), dt))

        W2 = W + alpha * dW
        Pv2 = Pv + alpha * dP
        lam_loc2 = lam_loc + alpha * (yl_qp - lam_loc)
        lam_if2 = lam_if + alpha * (yi_qp - lam_if)
        lam_bw2 = lam_bw + alpha * (ybw_qp - lam_bw)
        lam_bp2 = lam_bp + alpha * (ybp_qp - lam_bp)

        ps2 = jnp.maximum(jnp.max(jnp.abs(alpha * dW), initial=0.0),
                          jnp.max(jnp.abs(alpha * dP), initial=0.0))
        ds2 = jnp.maximum(
            jnp.max(jnp.abs(alpha * (yl_qp - lam_loc)), initial=0.0),
            jnp.max(jnp.abs(alpha * (yi_qp - lam_if)), initial=0.0))
        c2 = all_con(W2, Pv2)
        vi2 = _violation_inf(c2, cl, cu, if_residual(W2), W2, lbw, ubw,
                             Pv2, lbp, ubp)
        # stationarity: grad_L = g + A'lam + E'lam_if + box duals
        g2, _, J2, _ = seg_derivs(W2, Pv2, lam_loc2)
        gl_W = g2[:, :kz] + jnp.einsum("smk,sm->sk", J2[:, :, :kz], lam_loc2)
        pad = jnp.zeros((1, dtr.p_if), dt)
        li_pad = jnp.concatenate([lam_if2, pad], axis=0)   # index s
        li_prev = jnp.concatenate([pad, lam_if2], axis=0)  # index s-1
        gl_W = gl_W + jnp.einsum("pk,sp->sk", Ew, li_pad) \
            + jnp.einsum("pk,sp->sk", Fw, li_prev) + lam_bw2
        stat = jnp.max(jnp.abs(gl_W), initial=0.0)
        if np_:
            gl_P = (jnp.sum(g2[:, kz:], axis=0)
                    + jnp.einsum("sma,sm->a", J2[:, :, kz:], lam_loc2)
                    + lam_bp2)
            stat = jnp.maximum(stat, jnp.max(jnp.abs(gl_P), initial=0.0))
        lam_scale = jnp.maximum(1.0, jnp.maximum(
            jnp.max(jnp.abs(lam_loc2), initial=0.0),
            jnp.maximum(jnp.max(jnp.abs(lam_if2), initial=0.0),
                        jnp.max(jnp.abs(lam_bw2), initial=0.0))))
        conv = (ps2 <= settings.eps_prim) \
            & (ds2 <= settings.eps_dual * lam_scale) \
            & (vi2 <= settings.eps_viol) \
            & (stat <= settings.eps_stat * lam_scale)

        trace2 = trace
        if settings.trace_iters > 0:
            slot = jnp.clip(it, 0, settings.trace_iters - 1)
            f2, _ = merit_parts(W2, Pv2)
            row = jnp.stack([f2.astype(dt), vi2.astype(dt),
                             ps2.astype(dt), ds2.astype(dt)])
            row = jnp.where(it < settings.trace_iters, row, trace[slot])
            trace2 = trace.at[slot].set(row)
        new = (W2, Pv2, lam_loc2, lam_if2, lam_bw2, lam_bp2, it + 1, conv,
               ps2, ds2, vi2, qp_iters_acc + qp_it, qp_st, trace2)
        old = (W, Pv, lam_loc, lam_if, lam_bw, lam_bp, it, done, ps, ds, vi,
               qp_iters_acc, qp_status, trace)
        return jax.tree_util.tree_map(
            lambda o, nw: jnp.where(done, o, nw), old, new)

    def cond(carry):
        it, done = carry[6], carry[7]
        return (~done) & (it < settings.max_iter)

    lam_loc0 = jnp.zeros((S, ml), dt) if lam_loc0 is None else lam_loc0
    lam_if0 = jnp.zeros((S - 1, dtr.p_if), dt) if lam_if0 is None else lam_if0
    lam_bw0 = jnp.zeros((S, kz), dt) if lam_bw0 is None else lam_bw0
    lam_bp0 = jnp.zeros((np_,), dt) if lam_bp0 is None else lam_bp0
    W0 = jnp.clip(W0.astype(dt), lbw, ubw)
    Pv0 = jnp.clip(Pv0, lbp, ubp) if np_ else Pv0

    trace0 = jnp.full((settings.trace_iters, 4), jnp.nan, dt)
    init = (W0, Pv0, lam_loc0, lam_if0, lam_bw0, lam_bp0,
            jnp.zeros((), jnp.int32), jnp.zeros((), bool),
            jnp.asarray(jnp.inf, dt), jnp.asarray(jnp.inf, dt),
            jnp.asarray(jnp.inf, dt), jnp.zeros((), jnp.int32),
            jnp.asarray(st.UNINITIALIZED, jnp.int32), trace0)
    (W, Pv, lam_loc, lam_if, lam_bw, lam_bp, iters, done,
     ps, ds, vi, qp_iters, qp_status, trace) = jax.lax.while_loop(
        cond, body, init)

    status = jnp.where(done, st.SOLVED, st.MAX_ITER_EXCEEDED).astype(jnp.int32)
    return {"W": W, "P": Pv, "lam_loc": lam_loc, "lam_if": lam_if,
            "lam_bw": lam_bw, "lam_bp": lam_bp, "status": status,
            "iters": iters, "cost": total_cost(W, Pv),
            "primal_step": ps, "dual_step": ds, "violation": vi,
            "qp_iters": qp_iters, "qp_status": qp_status,
            "trace": trace if settings.trace_iters > 0 else None}


# ---------------------------------------------------------------------------
# distributed KKT certification + refinement (the 1e-6 parity pass)
# ---------------------------------------------------------------------------

def _dist_parts(dtr: DistTranscription, W, Pv, d):
    """Per-segment gradient / constraint / Jacobian at (W, P)."""
    S, kz = dtr.S, dtr.kz
    dt = W.dtype
    times = jnp.asarray(dtr.times, dt)
    is_last = jnp.arange(S) == S - 1
    mask_head = jnp.where(jnp.arange(S) == 0, 1.0, 0.0).astype(dt)

    def one(w, t, il, mh):
        wp = jnp.concatenate([w, Pv])
        cost_joint = lambda v: dtr.seg_cost(v[:kz], v[kz:], t, il, d)
        con_joint = lambda v: dtr.seg_con(v[:kz], v[kz:], t, mh, d)
        return (jax.grad(cost_joint)(wp), con_joint(wp),
                jax.jacfwd(con_joint)(wp))
    return jax.vmap(one)(W, times, is_last, mask_head)


def _dist_stationarity(dtr, g, J, lam_loc, lam_if, lam_bw, lam_bp, dt):
    kz, np_ = dtr.kz, dtr.ocp.np_
    Epk, Fpk = dtr.picks
    Ew, Fw = jnp.asarray(Epk, dt), jnp.asarray(Fpk, dt)
    gl_W = g[:, :kz] + jnp.einsum("smk,sm->sk", J[:, :, :kz], lam_loc)
    pad = jnp.zeros((1, dtr.p_if), dt)
    gl_W = gl_W + jnp.einsum("pk,sp->sk", Ew,
                             jnp.concatenate([lam_if, pad], axis=0)) \
        + jnp.einsum("pk,sp->sk", Fw,
                     jnp.concatenate([pad, lam_if], axis=0)) + lam_bw
    if np_:
        gl_P = (jnp.sum(g[:, kz:], axis=0)
                + jnp.einsum("sma,sm->a", J[:, :, kz:], lam_loc) + lam_bp)
    else:
        gl_P = jnp.zeros((0,), dt)
    return gl_W, gl_P


def dist_kkt_residual(dtr: DistTranscription, bounds: DistBounds,
                      W, Pv, lam_loc, lam_if, lam_bw, lam_bp, d=None):
    """Unscaled KKT infinity norm of the duplicated-segment NLP solution
    (conventions match nlp/refine.py:kkt_residual)."""
    dt = W.dtype
    ocp = dtr.ocp
    d = jnp.zeros((ocp.nd,), dt) if d is None else jnp.asarray(d, dt)
    cl = jnp.concatenate([jnp.zeros(dtr.me, dt), bounds.gl.astype(dt)]) \
        if ocp.ng else jnp.zeros(dtr.me, dt)
    cu = jnp.concatenate([jnp.zeros(dtr.me, dt), bounds.gu.astype(dt)]) \
        if ocp.ng else jnp.zeros(dtr.me, dt)
    g, c, J = _dist_parts(dtr, W, Pv, d)
    Epk, Fpk = dtr.picks
    r_if = (jnp.einsum("pk,sk->sp", jnp.asarray(Epk, dt), W[:-1])
            + jnp.einsum("pk,sk->sp", jnp.asarray(Fpk, dt), W[1:]))
    gl_W, gl_P = _dist_stationarity(dtr, g, J, lam_loc, lam_if,
                                    lam_bw, lam_bp, dt)
    stat = jnp.max(jnp.abs(gl_W), initial=0.0)
    if ocp.np_:
        stat = jnp.maximum(stat, jnp.max(jnp.abs(gl_P), initial=0.0))
    feas = _violation_inf(c, cl, cu, r_if, W, bounds.lbw, bounds.ubw,
                          Pv, bounds.lbp, bounds.ubp)

    def comp_term(v, lo, up, y):
        d_lo = jnp.where(jnp.isfinite(lo), v - lo, jnp.inf)
        d_up = jnp.where(jnp.isfinite(up), up - v, jnp.inf)
        dst = jnp.minimum(jnp.abs(d_lo), jnp.abs(d_up))
        dst = jnp.where(jnp.isfinite(dst), dst, 0.0)
        return jnp.max(jnp.abs(y) * dst, initial=0.0)

    comp = jnp.maximum(comp_term(c, cl[None], cu[None], lam_loc),
                       comp_term(W, bounds.lbw, bounds.ubw, lam_bw))
    if ocp.np_:
        comp = jnp.maximum(comp, comp_term(Pv, bounds.lbp, bounds.ubp,
                                           lam_bp))
    return jnp.maximum(stat, jnp.maximum(feas, comp))


def dist_refine(dtr: DistTranscription, bounds: DistBounds,
                W, Pv, lam_loc, lam_if, lam_bw, lam_bp, d=None,
                iters: int = 2, act_tol: float = 1e-3,
                mesh: Optional[Mesh] = None, axis: str = "seg"):
    """Frozen-active-set Newton-KKT refinement, distributed.

    The refinement KKT (nlp/refine.py:refine_solution, symmetrised) has the
    same segment-block + interface + parameter-border structure as the ADMM
    KKT, so the whole quadratic-convergence pass runs through
    schur_horizon_solve — no centralised linear algebra.  Per-segment block
    w = [dz (kz); dlam_loc (ml); dlam_box (kz)]; interface unknowns are the
    continuity-row Newton duals; the border is [dP; dlam_box_P].

    Inactive-row duals are zeroed up front so the masked (ac * J) coupling
    is exact and the KKT stays symmetric.
    """
    ocp = dtr.ocp
    S, kz, ml, np_ = dtr.S, dtr.kz, dtr.ml, ocp.np_
    dt = W.dtype
    d = jnp.zeros((ocp.nd,), dt) if d is None else jnp.asarray(d, dt)
    times = jnp.asarray(dtr.times, dt)
    is_last = jnp.arange(S) == S - 1
    mask_head = jnp.where(jnp.arange(S) == 0, 1.0, 0.0).astype(dt)
    cl = jnp.concatenate([jnp.zeros(dtr.me, dt), bounds.gl.astype(dt)]) \
        if ocp.ng else jnp.zeros(dtr.me, dt)
    cu = jnp.concatenate([jnp.zeros(dtr.me, dt), bounds.gu.astype(dt)]) \
        if ocp.ng else jnp.zeros(dtr.me, dt)
    lbw, ubw = bounds.lbw.astype(dt), bounds.ubw.astype(dt)
    lbp, ubp = bounds.lbp.astype(dt), bounds.ubp.astype(dt)
    Epk, Fpk = dtr.picks
    p_if = dtr.p_if
    k = kz + ml + kz
    Ew = jnp.zeros((p_if, k), dt).at[:, :kz].set(jnp.asarray(Epk, dt))
    Fw = jnp.zeros((p_if, k), dt).at[:, :kz].set(jnp.asarray(Fpk, dt))
    delta = 1e-10

    # ---- frozen active sets ----
    _, c0, _ = _dist_parts(dtr, W, Pv, d)
    alo_c = c0 - cl[None] <= act_tol
    aup_c = cu[None] - c0 <= act_tol
    ac = (alo_c | aup_c).astype(dt)                       # (S, ml)
    b_c = jnp.where(alo_c, cl[None], cu[None])
    b_c = jnp.where(jnp.isfinite(b_c), b_c, 0.0)
    alo_x = (W - lbw) <= act_tol
    aup_x = (ubw - W) <= act_tol
    ax = (alo_x | aup_x).astype(dt)                       # (S, kz)
    b_x = jnp.where(alo_x, lbw, ubw)
    b_x = jnp.where(jnp.isfinite(b_x), b_x, 0.0)
    if np_:
        alo_p = (Pv - lbp) <= act_tol
        aup_p = (ubp - Pv) <= act_tol
        ap = (alo_p | aup_p).astype(dt)
        b_p = jnp.where(alo_p, lbp, ubp)
        b_p = jnp.where(jnp.isfinite(b_p), b_p, 0.0)

    # zero inactive duals so the masked coupling is exact
    lam_loc = ac * lam_loc
    lam_bw = ax * lam_bw
    lam_bp = ap * lam_bp if np_ else lam_bp

    # row "mass": active rows get the tiny -delta, inactive rows -1 (which
    # pins their dual step to the zeroed dual)
    dm_c = jnp.where(ac > 0, delta, 1.0)
    dm_x = jnp.where(ax > 0, delta, 1.0)

    def hess_blocks(Wc, Pc, ll):
        def one(w, t, il, mh, lam_s):
            wp = jnp.concatenate([w, Pc])

            def lagr(v):
                val = dtr.seg_cost(v[:kz], v[kz:], t, il, d)
                return val + dtr.seg_con(v[:kz], v[kz:], t, mh, d) @ lam_s
            return jax.jacfwd(jax.grad(lagr))(wp)
        return jax.vmap(one)(Wc, times, is_last, mask_head, ll)

    def step(carry, _):
        W, Pv, lam_loc, lam_if, lam_bw, lam_bp = carry
        g, c, J = _dist_parts(dtr, W, Pv, d)
        A = J[:, :, :kz]
        AP = J[:, :, kz:]
        Hn = hess_blocks(W, Pv, lam_loc)
        Hs = Hn[:, :kz, :kz] + delta * jnp.eye(kz, dtype=dt)[None]
        HsP = Hn[:, :kz, kz:]
        HPP = jnp.sum(Hn[:, kz:, kz:], axis=0)

        gl_W, gl_P = _dist_stationarity(dtr, g, J, lam_loc, lam_if,
                                        lam_bw, lam_bp, dt)
        r_if = (jnp.einsum("pk,sk->sp", Ew[:, :kz], W[:-1])
                + jnp.einsum("pk,sk->sp", Fw[:, :kz], W[1:]))
        r_c = ac * (c - b_c) + (1.0 - ac) * lam_loc
        r_x = ax * (W - b_x) + (1.0 - ax) * lam_bw

        acA = ac[:, :, None] * A
        K = jnp.concatenate([
            jnp.concatenate([Hs, jnp.swapaxes(acA, 1, 2),
                             jax.vmap(jnp.diag)(ax)], axis=2),
            jnp.concatenate([acA, -jax.vmap(jnp.diag)(dm_c),
                             jnp.zeros((S, ml, kz), dt)], axis=2),
            jnp.concatenate([jax.vmap(jnp.diag)(ax),
                             jnp.zeros((S, kz, ml), dt),
                             -jax.vmap(jnp.diag)(dm_x)], axis=2),
        ], axis=1)                                        # (S, k, k)
        b = jnp.concatenate([-gl_W, -r_c, -r_x], axis=1)  # (S, k)
        G = jnp.tile((-delta * jnp.eye(p_if, dtype=dt))[None],
                     (S - 1, 1, 1))
        c_if = -r_if
        if np_:
            a2 = 2 * np_
            C = jnp.concatenate([
                jnp.concatenate([HsP, jnp.zeros((S, kz, np_), dt)], axis=2),
                jnp.concatenate([ac[:, :, None] * AP,
                                 jnp.zeros((S, ml, np_), dt)], axis=2),
                jnp.zeros((S, kz, a2), dt),
            ], axis=1)                                    # (S, k, 2np)
            dm_p = jnp.where(ap > 0, delta, 1.0)
            Dg = jnp.concatenate([
                jnp.concatenate([HPP + delta * jnp.eye(np_, dtype=dt),
                                 jnp.diag(ap)], axis=1),
                jnp.concatenate([jnp.diag(ap), -jnp.diag(dm_p)], axis=1),
            ], axis=0)
            r_p = ap * (Pv - b_p) + (1.0 - ap) * lam_bp
            bg = jnp.concatenate([-gl_P, -r_p])
            w, nu_if, g_sol = schur_horizon_solve(
                K, b, Ew, Fw, c_if, mesh=mesh, axis=axis, G=G,
                C=C, Dg=Dg, bg=bg)
            dP = g_sol[:np_]
            dlbp = g_sol[np_:]
        else:
            w, nu_if = schur_horizon_solve(K, b, Ew, Fw, c_if, mesh=mesh,
                                           axis=axis, G=G)
            dP = jnp.zeros((0,), dt)
            dlbp = jnp.zeros((0,), dt)

        ok = jnp.all(jnp.isfinite(w)) & jnp.all(jnp.isfinite(nu_if)) \
            & jnp.all(jnp.isfinite(dP))
        upd = lambda old, dlt: jnp.where(ok, old + dlt, old)
        W2 = jnp.clip(upd(W, w[:, :kz]), lbw, ubw)
        lam_loc2 = upd(lam_loc, w[:, kz:kz + ml])
        lam_bw2 = upd(lam_bw, w[:, kz + ml:])
        lam_if2 = upd(lam_if, nu_if)
        Pv2 = jnp.clip(upd(Pv, dP), lbp, ubp) if np_ else Pv
        lam_bp2 = upd(lam_bp, dlbp) if np_ else lam_bp
        return (W2, Pv2, lam_loc2, lam_if2, lam_bw2, lam_bp2), None

    carry0 = (W, Pv, lam_loc, lam_if, lam_bw, lam_bp)
    carry, _ = jax.lax.scan(step, carry0, None, length=iters)
    W2, Pv2, lam_loc2, lam_if2, lam_bw2, lam_bp2 = carry

    # accept only if the true KKT error improved
    r0 = dist_kkt_residual(dtr, bounds, W, Pv, lam_loc, lam_if,
                           lam_bw, lam_bp, d)
    r1 = dist_kkt_residual(dtr, bounds, W2, Pv2, lam_loc2, lam_if2,
                           lam_bw2, lam_bp2, d)
    ok = r1 <= r0
    pick = lambda a, b: jnp.where(ok, a, b)
    return (pick(W2, W), pick(Pv2, Pv), pick(lam_loc2, lam_loc),
            pick(lam_if2, lam_if), pick(lam_bw2, lam_bw),
            pick(lam_bp2, lam_bp))
