"""Primal-dual interior-point NLP solver — the native Ipopt analogue.

The reference ships an external-solver bridge (`ipopt_interface.hpp:387-495`:
``IpoptAdapter : Ipopt::TNLP`` mapping ProblemBase/ContinuousOCP
sensitivities into Ipopt callbacks, defaults tol 1e-6 / adaptive mu /
max_iter 100 at `ipopt_interface.hpp:403-406`).  On TPU we do not call out
to a host C++ solver from inside a jitted region; instead this module is a
self-contained barrier method with the same problem coverage and default
tolerances, built vmap/jit-safe:

    min_x  f(x, p)
    s.t.   c_e(x, p)  = 0
           gl <= c_i(x, p) <= gu
           lbx <= x <= ubx

Algorithm (monotone Fiacco-McCormick, the textbook core of Ipopt
[Waechter & Biegler 2006] without the filter restoration phase):

  * slack reformulation: w = (x, s), inequality rows become the equalities
    c_i(x) - s = 0 with box gl <= s <= gu, so every inequality is a bound;
  * log-barrier on all finite bounds with barrier parameter mu, duals
    (z_l, z_u) kept explicitly (primal-dual, not primal, Newton);
  * per-iteration: eliminate (z_l, z_u) against complementarity, solve the
    condensed symmetric KKT  [[W + Sigma + dw*I, J'], [J, -dc*I]] on the
    MXU (one dense solve — the collocation KKT is small enough per
    instance, and batched instances fill the MXU via vmap);
  * fraction-to-boundary step, Armijo backtracking on the l1 barrier merit
    (fixed trial count => vmap-safe);
  * mu decreased superlinearly (kappa_mu * mu, mu^theta_mu) whenever the
    barrier KKT error drops below kappa_eps * mu.

Control flow is a fixed-bound ``lax.while_loop`` over jnp state only —
batched instances run under ``jax.vmap`` with per-instance iteration counts.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from polympc_tpu.nlp.hessian import regularize
from polympc_tpu.nlp.types import NLP, NLPBounds, unbounded
from polympc_tpu.utils import status as st
from polympc_tpu.utils.precision import full_precision

__all__ = ["IPNLPSettings", "IPNLPSolution", "nlp_ip_solve"]


@dataclasses.dataclass(frozen=True)
class IPNLPSettings:
    """Defaults mirror the reference Ipopt bridge (ipopt_interface.hpp:403-406:
    tol 1e-6, mu_strategy adaptive, max_iter 100)."""
    max_iter: int = 100
    ls_max_iter: int = 12       # Armijo trials per iteration (fixed, masked)
    tol: float = 1e-6           # overall scaled KKT tolerance
    mu_init: float = 0.1
    mu_min: float = 1e-11
    kappa_eps: float = 10.0     # barrier subproblem tolerance = kappa_eps*mu
    kappa_mu: float = 0.2       # linear mu decrease factor
    theta_mu: float = 1.5       # superlinear mu decrease exponent
    tau_min: float = 0.99       # fraction-to-boundary: max(tau_min, 1-mu)
    eta: float = 1e-4           # Armijo sufficient decrease
    reg_w: float = 1e-8         # primal (1,1)-block regularisation
    reg_c: float = 1e-8         # dual (2,2)-block regularisation
    bound_push: float = 1e-2    # kappa_1: initial distance to bounds
    bound_frac: float = 1e-2    # kappa_2: relative initial distance
    # Ipopt bound_relax_factor: every finite bound is relaxed outward by
    # relax*max(1,|b|) so fixed variables (lb == ub, e.g. a pinned MPC
    # initial condition) keep a nonempty strict interior
    bound_relax: float = 1e-8
    # Hessian convexification — the role of Ipopt's inertia correction
    # (delta_w heuristic): "none" trusts an already-convex W; "eigen" /
    # "mirror" / "gershgorin" regularise the Lagrangian Hessian so every
    # Newton direction is a barrier-merit descent direction (nlp/hessian.py)
    reg: str = "eigen"
    reg_eps: float = 1e-6
    loose_bound: float = 1e10
    hessian: str = "exact"      # "exact" | "gauss_newton"
    nu_safety: float = 1.0      # l1 merit penalty = ||y||_inf + safety

    def validate(self) -> bool:
        return (self.max_iter >= 1 and self.ls_max_iter >= 1
                and 0 < self.kappa_mu < 1 and self.theta_mu > 1
                and 0 < self.tau_min < 1
                and self.hessian in ("exact", "gauss_newton")
                and self.reg in ("none", "gershgorin", "eigen", "mirror"))


class IPNLPSolution(NamedTuple):
    x: jnp.ndarray         # (n,)
    lam: jnp.ndarray       # (ne+ni,) equality/inequality duals
    lam_box: jnp.ndarray   # (n,) net box duals z_u - z_l (x part)
    status: jnp.ndarray    # int32
    iters: jnp.ndarray     # int32
    cost: jnp.ndarray
    kkt_error: jnp.ndarray  # final unscaled KKT infinity norm (mu = 0)
    mu: jnp.ndarray         # final barrier parameter
    violation: jnp.ndarray  # final max constraint violation


@full_precision
@functools.partial(jax.jit, static_argnames=("nlp", "settings"))
def nlp_ip_solve(nlp: NLP, x0, p=None, bounds: Optional[NLPBounds] = None,
                 lam0=None,
                 settings: IPNLPSettings = IPNLPSettings()) -> IPNLPSolution:
    """Solve the NLP with the interior-point method.  Pure: jit/vmap-safe.

    Same call surface as ``sqp_solve`` (nlp/sqp.py); ``lam0`` warm-starts the
    equality-block duals.  Unlike SQP, x0 is pushed strictly inside the box
    before iterating (Ipopt's kappa_1/kappa_2 push, so infeasible-at-bounds
    guesses are fine).
    """
    if not settings.validate():
        raise ValueError("invalid IP settings")
    dt = x0.dtype
    n, ne, ni = nlp.n, nlp.ne, nlp.ni
    nw = n + ni          # w = (x, s)
    me = ne + ni         # equality block: [c_e; c_i - s]
    if bounds is None:
        bounds = unbounded(nlp, dt)

    f = lambda x: nlp.cost(x, p)
    grad_f = (lambda x: nlp.cost_grad(x, p)) if nlp.cost_grad is not None \
        else jax.grad(f)

    def cons(x):
        parts = []
        if nlp.eq is not None:
            parts.append(nlp.eq(x, p))
        if nlp.ineq is not None:
            parts.append(nlp.ineq(x, p))
        return jnp.concatenate(parts) if parts else jnp.zeros(0, x.dtype)

    def cons_jac(x):
        parts = []
        if nlp.eq is not None:
            parts.append(nlp.eq_jac(x, p) if nlp.eq_jac is not None
                         else jax.jacfwd(lambda xx: nlp.eq(xx, p))(x))
        if nlp.ineq is not None:
            parts.append(nlp.ineq_jac(x, p) if nlp.ineq_jac is not None
                         else jax.jacfwd(lambda xx: nlp.ineq(xx, p))(x))
        return jnp.concatenate(parts, axis=0) if parts else \
            jnp.zeros((0, n), x.dtype)

    if settings.hessian == "gauss_newton" and nlp.gn_hessian is not None:
        lag_hess = lambda x, y: nlp.gn_hessian(x, p)
    elif nlp.lag_hessian is not None:
        lag_hess = lambda x, y: nlp.lag_hessian(x, y, p)
    else:
        def lag_hess(x, y):
            lag = lambda xx: f(xx) + (cons(xx) @ y if me else 0.0)
            return jax.hessian(lag)(x)

    # ---- bounds on w = (x, s): x box + inequality range on the slacks ----
    wl = jnp.concatenate([bounds.lbx, bounds.gl]) if ni else bounds.lbx
    wu = jnp.concatenate([bounds.ubx, bounds.gu]) if ni else bounds.ubx
    wl, wu = wl.astype(dt), wu.astype(dt)
    has_l = wl > -settings.loose_bound
    has_u = wu < settings.loose_bound
    fl = has_l.astype(dt)
    fu = has_u.astype(dt)
    rlx = settings.bound_relax
    wl_s = jnp.where(has_l, wl - rlx * jnp.maximum(1.0, jnp.abs(wl)), 0.0)
    wu_s = jnp.where(has_u, wu + rlx * jnp.maximum(1.0, jnp.abs(wu)), 0.0)

    def push_interior(w):
        """Ipopt kappa_1/kappa_2 push: strictly inside every finite bound."""
        width = jnp.where(has_l & has_u, wu_s - wl_s, 1.0)
        pl = jnp.maximum(settings.bound_push,
                         settings.bound_frac * jnp.abs(width))
        lo = jnp.where(has_l, wl_s + pl, -jnp.inf)
        hi = jnp.where(has_u, wu_s - pl, jnp.inf)
        mid = 0.5 * (wl_s + wu_s)
        # if the push crosses over (narrow interval), fall back to midpoint
        crossed = (lo > hi)
        w = jnp.clip(w, jnp.where(crossed, mid, lo),
                     jnp.where(crossed, mid, hi))
        return w

    ci0 = nlp.ineq(x0, p) if ni else jnp.zeros(0, dt)
    w = push_interior(jnp.concatenate([x0, ci0]) if ni else x0)

    def slacked(w):
        """Equality residual C(w) = [c_e(x); c_i(x) - s]."""
        x = w[:n]
        c = cons(x)
        if ni:
            c = c.at[ne:].add(-w[n:])
        return c

    def slacked_jac(w):
        x = w[:n]
        J = cons_jac(x)                               # (me, n)
        if ni:
            Js = jnp.concatenate(
                [jnp.zeros((ne, ni), dt), -jnp.eye(ni, dtype=dt)], axis=0)
            return jnp.concatenate([J, Js], axis=1)   # (me, nw)
        return J

    def grad_w(w):
        g = grad_f(w[:n])
        return jnp.concatenate([g, jnp.zeros(ni, dt)]) if ni else g

    def hess_w(w, y):
        W = lag_hess(w[:n], y)
        W = regularize(W, settings.reg, settings.reg_eps)
        if ni:
            Z = jnp.zeros((n, ni), dt)
            W = jnp.block([[W, Z], [Z.T, jnp.zeros((ni, ni), dt)]])
        return W

    mu0 = jnp.asarray(settings.mu_init, dt)
    d_l0 = jnp.where(has_l, w - wl_s, 1.0)
    d_u0 = jnp.where(has_u, wu_s - w, 1.0)
    z_l = jnp.where(has_l, mu0 / d_l0, 0.0)
    z_u = jnp.where(has_u, mu0 / d_u0, 0.0)
    y = jnp.zeros(me, dt) if lam0 is None else lam0.astype(dt)

    n_scale = jnp.maximum(1.0, (jnp.sum(fl) + jnp.sum(fu)) / max(nw, 1))

    def kkt_error_from(J, g, r_c, w, y, z_l, z_u, mu):
        """Infinity-norm KKT error of the mu-barrier problem (mu=0: true),
        from precomputed Jacobian J, objective gradient g and equality
        residual r_c — the barrier and convergence errors differ only in the
        complementarity term, so one Jacobian evaluation serves both."""
        d_l = jnp.where(has_l, w - wl_s, 1.0)
        d_u = jnp.where(has_u, wu_s - w, 1.0)
        r_d = g + (J.T @ y if me else 0.0) - fl * z_l + fu * z_u
        comp = jnp.maximum(
            jnp.max(jnp.abs(fl * (d_l * z_l - mu)), initial=0.0),
            jnp.max(jnp.abs(fu * (d_u * z_u - mu)), initial=0.0))
        # Ipopt-style scaling keeps large duals from stalling termination
        s_d = jnp.maximum(1.0, (jnp.sum(jnp.abs(y)) +
                                jnp.sum(fl * z_l) + jnp.sum(fu * z_u))
                          / jnp.maximum(1.0, float(me + 2 * nw)) / 100.0)
        return jnp.maximum(jnp.max(jnp.abs(r_d), initial=0.0) / s_d,
                           jnp.maximum(jnp.max(jnp.abs(r_c), initial=0.0),
                                       comp / s_d))

    def kkt_error(w, y, z_l, z_u, mu):
        return kkt_error_from(slacked_jac(w), grad_w(w), slacked(w),
                              w, y, z_l, z_u, mu)

    def barrier_merit(w, mu, nu):
        d_l = jnp.where(has_l, w - wl_s, 1.0)
        d_u = jnp.where(has_u, wu_s - w, 1.0)
        safe = lambda d: jnp.log(jnp.maximum(d, 1e-300))
        bar = -mu * (jnp.sum(fl * safe(d_l)) + jnp.sum(fu * safe(d_u)))
        return f(w[:n]) + bar + nu * jnp.sum(jnp.abs(slacked(w)))

    def body(carry):
        # J, g, r_c are the constraint Jacobian, objective gradient and
        # equality residual at w, carried from the previous iteration so each
        # iteration evaluates the (dominant-cost) Jacobian exactly once
        w, y, z_l, z_u, mu, it, status, J, g, r_c = carry
        d_l = jnp.where(has_l, w - wl_s, 1.0)
        d_u = jnp.where(has_u, wu_s - w, 1.0)

        # condensed primal-dual Newton system on (dw, dy)
        W = hess_w(w, y)
        sigma = fl * z_l / d_l + fu * z_u / d_u
        r_d = (g + (J.T @ y if me else 0.0)
               - fl * (mu / d_l) + fu * (mu / d_u))
        K = jnp.block([
            [W + jnp.diag(sigma) + settings.reg_w * jnp.eye(nw, dtype=dt),
             J.T],
            [J, -settings.reg_c * jnp.eye(me, dtype=dt)]]) if me else \
            (W + jnp.diag(sigma) + settings.reg_w * jnp.eye(nw, dtype=dt))
        rhs = -jnp.concatenate([r_d, r_c]) if me else -r_d
        sol = jnp.linalg.solve(K, rhs)
        dw = sol[:nw]
        dy = sol[nw:] if me else jnp.zeros(0, dt)
        dz_l = jnp.where(has_l, (mu - z_l * d_l - z_l * dw) / d_l, 0.0)
        dz_u = jnp.where(has_u, (mu - z_u * d_u + z_u * dw) / d_u, 0.0)

        # fraction-to-boundary
        tau = jnp.maximum(settings.tau_min, 1.0 - mu)

        def max_alpha(v, dv, mask):
            ratio = jnp.where((dv < 0) & mask,
                              -tau * v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.minimum(1.0, jnp.min(ratio, initial=1.0))

        a_w = jnp.minimum(max_alpha(d_l, dw, has_l),
                          max_alpha(d_u, -dw, has_u))
        a_z = jnp.minimum(max_alpha(z_l, dz_l, has_l),
                          max_alpha(z_u, dz_u, has_u))

        # Armijo backtracking on the l1 barrier merit (fixed trials, masked)
        nu = jnp.max(jnp.abs(y), initial=0.0) + jnp.max(
            jnp.abs(y + dy), initial=0.0) + settings.nu_safety
        phi0 = barrier_merit(w, mu, nu)
        # barrier-merit directional derivative: the barrier gradient (r_d
        # without the J'y term) against dw, minus the l1 infeasibility drop
        gphi = r_d - (J.T @ y if me else 0.0)
        dphi = jnp.minimum(gphi @ dw - nu * jnp.sum(jnp.abs(r_c)), -1e-16)

        def trial(k):
            a = a_w * (0.5 ** k)
            ok = barrier_merit(w + a * dw, mu, nu) \
                <= phi0 + settings.eta * a * dphi
            return a, ok

        ks = jnp.arange(settings.ls_max_iter)
        alphas, oks = jax.vmap(trial)(ks)
        any_ok = jnp.any(oks)
        first = jnp.argmax(oks)      # first passing trial (largest alpha)
        # no passing trial: take the smallest step rather than stalling
        alpha = jnp.where(any_ok, alphas[first], alphas[-1])

        w2 = w + alpha * dw
        y2 = y + alpha * dy
        z_l2 = jnp.where(has_l, z_l + a_z * dz_l, 0.0)
        z_u2 = jnp.where(has_u, z_u + a_z * dz_u, 0.0)
        # dual safeguard (Ipopt kappa_Sigma): keep z within 1e10 of mu/d
        d_l2 = jnp.where(has_l, w2 - wl_s, 1.0)
        d_u2 = jnp.where(has_u, wu_s - w2, 1.0)
        kS = 1e10
        z_l2 = jnp.clip(z_l2, mu / (kS * d_l2), kS * mu / d_l2)
        z_u2 = jnp.clip(z_u2, mu / (kS * d_u2), kS * mu / d_u2)
        z_l2 = jnp.where(has_l, z_l2, 0.0)
        z_u2 = jnp.where(has_u, z_u2, 0.0)

        finite = (jnp.all(jnp.isfinite(w2)) & jnp.all(jnp.isfinite(y2)))
        w2 = jnp.where(finite, w2, w)
        y2 = jnp.where(finite, y2, y)
        z_l2 = jnp.where(finite, z_l2, z_l)
        z_u2 = jnp.where(finite, z_u2, z_u)

        # one derivative evaluation at the new point, shared by the barrier
        # error, the convergence test and the next iteration's Newton system
        J2 = slacked_jac(w2)
        g2 = grad_w(w2)
        c2 = slacked(w2)

        # barrier update: shrink mu once the mu-problem is solved
        e_mu = kkt_error_from(J2, g2, c2, w2, y2, z_l2, z_u2, mu)
        shrink = e_mu <= settings.kappa_eps * mu * n_scale
        mu2 = jnp.where(
            shrink,
            jnp.maximum(settings.mu_min,
                        jnp.minimum(settings.kappa_mu * mu,
                                    mu ** settings.theta_mu)),
            mu)

        conv = kkt_error_from(J2, g2, c2, w2, y2, z_l2, z_u2,
                              0.0) <= settings.tol
        status2 = jnp.where(conv, st.SOLVED,
                            jnp.where(finite, status, st.UNSOLVED))
        return (w2, y2, z_l2, z_u2, mu2, it + 1, status2, J2, g2, c2)

    def cond(carry):
        it, status = carry[5], carry[6]
        return (status == st.MAX_ITER_EXCEEDED) & (it < settings.max_iter)

    init = (w, y, z_l, z_u, mu0, jnp.zeros((), jnp.int32),
            jnp.full((), st.MAX_ITER_EXCEEDED, jnp.int32),
            slacked_jac(w), grad_w(w), slacked(w))
    (w, y, z_l, z_u, mu, iters, status,
     _, _, _) = jax.lax.while_loop(cond, body, init)

    x = w[:n]
    err = kkt_error(w, y, z_l, z_u, 0.0)
    ce = slacked(w)
    # inequality violation measured against [gl, gu] directly
    ci = nlp.ineq(x, p) if ni else jnp.zeros(0, dt)
    viol = jnp.maximum(
        jnp.max(jnp.abs(ce[:ne]), initial=0.0) if ne else jnp.zeros((), dt),
        jnp.maximum(
            jnp.max(bounds.gl - ci, initial=0.0) if ni else jnp.zeros((), dt),
            jnp.max(ci - bounds.gu, initial=0.0) if ni else jnp.zeros((), dt)))
    viol = jnp.maximum(viol, jnp.maximum(
        jnp.max(fl * (wl_s - w), initial=0.0),
        jnp.max(fu * (w - wu_s), initial=0.0)))
    return IPNLPSolution(
        x=x, lam=y,
        lam_box=(fu * z_u - fl * z_l)[:n],
        status=status.astype(jnp.int32), iters=iters,
        cost=f(x), kkt_error=err, mu=mu, violation=viol)
