"""SQP solver with l1-merit line search, pure JAX.

TPU-native re-design of ``SQPBase`` (sqp_base.hpp:66-699).  Differences from
the C++ reference, driven by XLA semantics (SURVEY.md §7):

  - the solve is one bounded ``lax.while_loop``; converged lanes freeze, so
    the whole solver is ``vmap``-able over problem instances (the batch axis
    that replaces the reference's single-instance warm-start loop);
  - the l1-merit backtracking line search (sqp_base.hpp:380-419) becomes a
    *batched fixed-trial* search: all ls_max_iter candidate step lengths are
    evaluated in one vmapped sweep and the first acceptable one is selected —
    no data-dependent trip counts, and the merit evaluations become one
    batched dynamics sweep on the MXU;
  - derivatives come from jax.grad / jax.jacfwd / jax.hessian instead of
    nested forward-mode AutoDiffScalar (autodiff/AutoDiffScalar.h);
  - the inner QP is the box-split ADMM solver, dual-warm-started with the
    current Lagrange multipliers each iteration (sqp_base.hpp:533-565).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from polympc_tpu.nlp.types import NLP, NLPBounds, SQPSettings, SQPSolution, unbounded
from polympc_tpu.nlp.hessian import (
    bfgs_update, sr1_update, regularize, block_hessian_identity,
    block_bfgs_update, assemble_block_hessian,
)
from polympc_tpu.qp.types import QPData
from polympc_tpu.qp.box_admm import box_admm_solve
from polympc_tpu.utils import status as st
from polympc_tpu.utils.precision import full_precision

__all__ = ["sqp_solve"]


def _constraints(nlp: NLP, x, p):
    """Stacked general constraints c(x) = [c_e; c_i], shape (ne+ni,)."""
    parts = []
    if nlp.eq is not None:
        parts.append(jnp.atleast_1d(nlp.eq(x, p)))
    if nlp.ineq is not None:
        parts.append(jnp.atleast_1d(nlp.ineq(x, p)))
    if not parts:
        return jnp.zeros(0, x.dtype)
    return jnp.concatenate(parts)


def _row_bounds(nlp: NLP, bounds: NLPBounds, dtype):
    cl = jnp.concatenate([jnp.zeros(nlp.ne, dtype), bounds.gl.astype(dtype)])
    cu = jnp.concatenate([jnp.zeros(nlp.ne, dtype), bounds.gu.astype(dtype)])
    return cl, cu


def _violation_l1(c, cl, cu, x, lbx, ubx):
    """l1 constraint violation for the merit function
    (ref: sqp_base.hpp:423-474)."""
    vc = jnp.sum(jnp.maximum(c - cu, 0.0) + jnp.maximum(cl - c, 0.0)) \
        if c.size else 0.0
    vx = jnp.sum(jnp.maximum(x - ubx, 0.0) + jnp.maximum(lbx - x, 0.0))
    return vc + vx


def _violation_inf(c, cl, cu, x, lbx, ubx):
    vc = jnp.max(jnp.maximum(jnp.maximum(c - cu, 0.0),
                             jnp.maximum(cl - c, 0.0)), initial=0.0)
    vx = jnp.max(jnp.maximum(jnp.maximum(x - ubx, 0.0),
                             jnp.maximum(lbx - x, 0.0)), initial=0.0)
    return jnp.maximum(vc, vx)


@full_precision
def sqp_solve(nlp: NLP, x0, p=None, bounds: NLPBounds | None = None,
              lam0=None, lam_box0=None,
              settings: SQPSettings = SQPSettings()) -> SQPSolution:
    """Solve the NLP from initial guess x0.  Pure function: jit/vmap-safe.

    p: parameter pytree forwarded to all problem callables.
    lam0: optional warm start for the general-constraint duals.
    lam_box0: optional warm start for the box duals — without it a re-solve
    from a converged point restarts the box duals at zero and the
    stationarity test only recovers at the line-search rate.
    """
    if not settings.validate():
        raise ValueError("invalid SQP settings")
    dt = x0.dtype
    n, m = nlp.n, nlp.m
    if bounds is None:
        bounds = unbounded(nlp, dt)
    cl, cu = _row_bounds(nlp, bounds, dt)

    cost_fn = lambda x: nlp.cost(x, p)
    con_fn = lambda x: _constraints(nlp, x, p)
    grad_fn = (lambda x: nlp.cost_grad(x, p)) if nlp.cost_grad is not None \
        else jax.grad(cost_fn)

    if nlp.eq_jac is not None or nlp.ineq_jac is not None:
        def jac_fn(x):
            parts = []
            if nlp.eq is not None:
                parts.append(nlp.eq_jac(x, p) if nlp.eq_jac is not None
                             else jax.jacfwd(lambda xx: nlp.eq(xx, p))(x))
            if nlp.ineq is not None:
                parts.append(nlp.ineq_jac(x, p) if nlp.ineq_jac is not None
                             else jax.jacfwd(lambda xx: nlp.ineq(xx, p))(x))
            return jnp.concatenate(parts, axis=0) if parts else \
                jnp.zeros((0, n), x.dtype)
    else:
        jac_fn = jax.jacfwd(con_fn)

    quasi_newton = settings.hessian in ("bfgs", "sr1", "block_bfgs")
    if settings.hessian == "exact":
        if nlp.lag_hessian is not None:
            hess_fn = lambda x, lam: nlp.lag_hessian(x, lam, p)
        else:
            def hess_fn(x, lam):
                def lagr(xx):
                    val = cost_fn(xx)
                    if m:
                        val = val + con_fn(xx) @ lam
                    return val
                # jacfwd-of-grad (not jax.hessian): compiles orders of
                # magnitude faster on TPU when this solver is vmapped
                return jax.jacfwd(jax.grad(lagr))(x)
    elif settings.hessian == "gauss_newton":
        if nlp.gn_hessian is None:
            raise ValueError("hessian='gauss_newton' requires nlp.gn_hessian")
        hess_fn = lambda x, lam: nlp.gn_hessian(x, p)
    else:
        hess_fn = None  # quasi-Newton modes carry B
    if settings.hessian == "block_bfgs":
        if nlp.block_structure is None:
            raise ValueError(
                "hessian='block_bfgs' requires nlp.block_structure "
                "(set by ocp.transcribe)")
        bs_N, bs_nx, bs_nu, bs_np = nlp.block_structure

    def merit_components(x):
        return cost_fn(x), _violation_l1(con_fn(x), cl, cu, x,
                                         bounds.lbx, bounds.ubx)

    alphas = jnp.asarray(settings.tau, dt) ** jnp.arange(settings.ls_max_iter)

    def body(carry):
        # first-order quantities (g, c, A, f) are carried from the previous
        # iteration's end-of-step evaluation — each iteration pays exactly
        # one gradient/constraint/Jacobian sweep (the reference re-evaluates
        # at the accepted point too, sqp_base.hpp:489-521; the naive body
        # evaluated the same point twice)
        (x, lam, lam_box, B, it, done, qp_iters_acc,
         prim_step, dual_step, viol, filt_f, filt_v, trace,
         g, c, A, f0) = carry

        if settings.hessian == "block_bfgs":
            H = assemble_block_hessian(B, bs_N, bs_nx, bs_nu)
        elif quasi_newton:
            H = B
        else:
            H = hess_fn(x, lam)
        H = regularize(H, settings.reg, settings.reg_eps)

        # QP subproblem in the step p: bounds shifted by the current iterate
        # (ref: sqp_base.hpp:586-593)
        qp = QPData(H=H, h=g, A=A, al=cl - c, au=cu - c,
                    xl=bounds.lbx - x, xu=bounds.ubx - x)
        qp_sol = box_admm_solve(qp, y0=lam, y_box0=lam_box,
                                settings=settings.qp)
        # reject non-finite / diverged QP steps (stay put, duals unchanged)
        p_ok = (jnp.all(jnp.isfinite(qp_sol.x))
                & jnp.all(jnp.isfinite(qp_sol.y))
                & jnp.all(jnp.isfinite(qp_sol.y_box)))
        pstep = jnp.where(p_ok, qp_sol.x, 0.0)
        lam_qp = jnp.where(p_ok, qp_sol.y, lam)
        lam_box_qp = jnp.where(p_ok, qp_sol.y_box, lam_box)
        # an unconverged QP can return a step violating the (shifted) box;
        # clipping keeps every trial iterate x + alpha*p inside [lbx, ubx]
        pstep = jnp.clip(pstep, bounds.lbx - x, bounds.ubx - x)

        # --- line search, batched over fixed trial alphas ---
        v0 = _violation_l1(c, cl, cu, x, bounds.lbx, bounds.ubx)
        dphi_f = g @ pstep  # cost directional derivative
        trial_f, trial_v = jax.vmap(
            lambda a: merit_components(x + a * pstep))(alphas)
        # NaN-safe: a trial that overflows the dynamics (e.g. exp() blow-up
        # at unphysical states) must be rejected, not silently compared
        bad = jnp.isnan(trial_f) | jnp.isnan(trial_v)
        trial_f = jnp.where(bad, jnp.inf, trial_f)
        trial_v = jnp.where(bad, jnp.inf, trial_v)

        if settings.line_search == "merit":
            # l1 exact-penalty merit with mu = ||lambda||_inf (+ safety, cap)
            mu = jnp.minimum(
                settings.merit_mu_safety + jnp.maximum(
                    jnp.max(jnp.abs(lam_qp), initial=0.0),
                    jnp.max(jnp.abs(lam_box_qp), initial=0.0)),
                settings.merit_mu_max)
            phi0 = f0 + mu * v0
            dphi = dphi_f - mu * v0
            phis = trial_f + mu * trial_v
            ok = phis <= phi0 + settings.eta * alphas * dphi
        else:
            # Fletcher-Leyffer filter acceptance (line_search.hpp:16-98):
            # a trial is acceptable if, vs every filter entry and the current
            # point, it improves cost or violation by the margins
            gma, beta = settings.filter_gamma, settings.filter_beta
            ok_entries = jnp.all(
                (trial_f[:, None] <= filt_f[None, :] - gma * filt_v[None, :])
                | (trial_v[:, None] <= beta * filt_v[None, :]), axis=1)
            ok_current = (trial_f <= f0 - gma * v0) | (trial_v <= beta * v0)
            ok = ok_entries & ok_current

        first = jnp.argmax(ok)  # index of first acceptable trial
        # two-tier fallback when no trial meets the acceptance test:
        #  1. a trial that at least PLAINLY improves (merit decrease / filter
        #     cost-or-violation decrease) — handles Maratos-type rejections
        #     where the sufficient-decrease margin is just missed;
        #  2. otherwise the SMALLEST finite trial step (the reference
        #     backtracks to tau^ls_max_iter, sqp_base.hpp:380-419).  Taking a
        #     large "least-bad" step here instead lets an unconverged QP's
        #     garbage direction drag the iterate away from the solution
        #     (observed on identification problems with near-singular
        #     constraint Jacobians).
        finite = jnp.isfinite(trial_f) & jnp.isfinite(trial_v)
        if settings.line_search == "merit":
            improve = phis < phi0
            score = phis
        else:
            improve = (trial_f < f0) | (trial_v < v0)
            score = trial_f + trial_v
        improve = improve & finite
        best = jnp.argmin(jnp.where(improve, score, jnp.inf))
        smallest = (settings.ls_max_iter - 1
                    - jnp.argmax(jnp.flip(finite)).astype(jnp.int32))
        fallback = jnp.where(jnp.any(improve), best,
                             jnp.where(jnp.any(finite), smallest, 0))
        sel = jnp.where(jnp.any(ok), first, fallback)
        alpha = alphas[sel]
        # if every trial is non-finite, stand still
        alpha = jnp.where(jnp.any(finite), alpha, jnp.zeros((), dt))

        if settings.line_search == "filter":
            # augment the filter with the departed point when the accepted
            # step is not a sufficient-cost-decrease (f-type) step; bounded
            # depth via ring buffer (vmap-safe, no list surgery)
            chosen_f = jnp.where(jnp.any(ok), trial_f[first], trial_f[sel])
            f_type = (dphi_f < 0) & (
                chosen_f <= f0 + settings.eta * alpha * dphi_f)
            slot = jnp.mod(it, settings.filter_depth)
            filt_f = jnp.where(f_type, filt_f,
                               filt_f.at[slot].set(f0))
            filt_v = jnp.where(f_type, filt_v,
                               filt_v.at[slot].set(v0))

        x2 = x + alpha * pstep
        lam2 = lam + alpha * (lam_qp - lam) if m else lam
        lam_box2 = lam_box + alpha * (lam_box_qp - lam_box)

        # one end-of-step first-order sweep serves the quasi-Newton secant,
        # the stationarity test, the violation metric AND the next
        # iteration's linearisation (via the carry)
        g2 = grad_fn(x2)
        c2 = con_fn(x2) if m else jnp.zeros(0, dt)
        A2 = jac_fn(x2) if m else jnp.zeros((0, n), dt)
        f2 = jnp.where(jnp.any(finite), trial_f[sel], f0)

        if quasi_newton:
            s_vec = x2 - x
            y_vec = (g2 + A2.T @ lam2) - (g + A.T @ lam2) if m else g2 - g
            if settings.hessian == "bfgs":
                B2 = bfgs_update(B, s_vec, y_vec)
            elif settings.hessian == "sr1":
                B2 = sr1_update(B, s_vec, y_vec)
            else:
                B2 = block_bfgs_update(B, s_vec, y_vec, bs_N, bs_nx, bs_nu)
        else:
            B2 = B

        ps = jnp.max(jnp.abs(alpha * pstep), initial=0.0)
        ds = jnp.max(jnp.abs(alpha * (lam_qp - lam)), initial=0.0) if m \
            else jnp.zeros((), dt)
        vi = _violation_inf(c2, cl, cu, x2, bounds.lbx, bounds.ubx)
        # stationarity of the Lagrangian: catches line-search stalls that the
        # reference's step-norm-only criterion (sqp_base.hpp:523-529) misses.
        # dual-step and stationarity tests are *relative* to the multiplier
        # scale — problems like the CSTR have |lambda| ~ 1e5 at the optimum
        stat = jnp.max(jnp.abs(
            (g2 + A2.T @ lam2 if m else g2) + lam_box2), initial=0.0)
        lam_scale = jnp.maximum(
            1.0, jnp.maximum(jnp.max(jnp.abs(lam2), initial=0.0),
                             jnp.max(jnp.abs(lam_box2), initial=0.0)))
        conv = (ps <= settings.eps_prim) \
            & (ds <= settings.eps_dual * lam_scale) \
            & (vi <= settings.eps_viol) \
            & (stat <= settings.eps_stat * lam_scale)

        # per-iteration observability record (iteration_callback analogue)
        trace2 = trace
        if settings.trace_iters > 0:
            slot_t = jnp.clip(it, 0, settings.trace_iters - 1)
            row = jnp.stack([f2.astype(dt), vi.astype(dt),
                             ps.astype(dt), ds.astype(dt)])
            row = jnp.where(it < settings.trace_iters, row, trace[slot_t])
            trace2 = trace.at[slot_t].set(row)

        new = (x2, lam2, lam_box2, B2, it + 1, conv,
               qp_iters_acc + qp_sol.iters, ps, ds, vi, filt_f, filt_v,
               trace2, g2, c2, A2, f2)
        old = (x, lam, lam_box, B, it, done, qp_iters_acc,
               prim_step, dual_step, viol, filt_f, filt_v, trace,
               g, c, A, f0)
        # tree_map (not a flat tuple-zip): B may be a BlockHessian pytree
        return jax.tree_util.tree_map(
            lambda o, nw: jnp.where(done, o, nw), old, new)

    def cond(carry):
        it, done = carry[4], carry[5]
        return (~done) & (it < settings.max_iter)

    lam_init = (jnp.zeros(m, dt) if lam0 is None else lam0.astype(dt))
    lam_box_init = (jnp.zeros(n, dt) if lam_box0 is None
                    else lam_box0.astype(dt))
    # empty filter entries (f=+inf, v=0) accept everything
    filt_f0 = jnp.full(settings.filter_depth, jnp.inf, dt)
    filt_v0 = jnp.zeros(settings.filter_depth, dt)
    # project the initial guess into the box so all iterates stay feasible
    # with respect to the bounds (steps are clipped to the shifted box)
    x0 = jnp.clip(x0.astype(dt), bounds.lbx, bounds.ubx)
    if settings.hessian == "block_bfgs":
        B0 = block_hessian_identity(bs_N, bs_nx, bs_nu, bs_np, dt)
    else:
        B0 = jnp.eye(n, dtype=dt)
    trace0 = jnp.full((settings.trace_iters, 4), jnp.nan, dt)
    g_init = grad_fn(x0)
    c_init = con_fn(x0) if m else jnp.zeros(0, dt)
    A_init = jac_fn(x0) if m else jnp.zeros((0, n), dt)
    f_init = cost_fn(x0)
    init = (x0.astype(dt), lam_init, lam_box_init,
            B0, jnp.zeros((), jnp.int32),
            jnp.zeros((), bool), jnp.zeros((), jnp.int32),
            jnp.asarray(jnp.inf, dt), jnp.asarray(jnp.inf, dt),
            jnp.asarray(jnp.inf, dt), filt_f0, filt_v0, trace0,
            g_init, c_init, A_init, f_init)

    (x, lam, lam_box, B, iters, done, qp_iters,
     ps, ds, vi, _, _, trace, _, _, _, f_fin) = jax.lax.while_loop(
        cond, body, init)

    status = jnp.where(done, st.SOLVED, st.MAX_ITER_EXCEEDED).astype(jnp.int32)
    return SQPSolution(x=x, lam=lam, lam_box=lam_box, status=status,
                       iters=iters, qp_iters=qp_iters, cost=f_fin,
                       primal_step=ps, dual_step=ds, violation=vi,
                       trace=trace if settings.trace_iters > 0 else None)
