"""KKT residual certification + mixed-precision solution refinement.

The reference's accuracy bar is the Ipopt default tol 1e-6
(ipopt_interface.hpp:403); its solvers run fp64 end-to-end.  The TPU hot
path runs fp32 (MXU-native) — SURVEY.md §7 hard-part #3: fp32 + refinement
to reach 1e-6 residual parity.  This module provides both halves:

  * :func:`kkt_residual` — the unscaled KKT infinity norm (stationarity,
    feasibility, complementarity) of an NLP solution, evaluated in whatever
    dtype the inputs carry (cast to fp64 for certification);
  * :func:`refine_solution` — a few full-Newton steps on the active-set KKT
    system in fp64, warm-started from the fp32 solve.  The active set is
    frozen from the fp32 solution (it is correct once the fp32 solve is in
    the right basin), so each step is one linear solve and convergence is
    quadratic: 2 steps take a 1e-3 residual to < 1e-6.

Both are pure jax functions: jit/vmap-safe, usable inside the batched
benchmark harness.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from polympc_tpu.nlp.types import NLP, NLPBounds
from polympc_tpu.utils.precision import full_precision

__all__ = ["kkt_residual", "refine_solution", "KKTResidual"]


class KKTResidual(NamedTuple):
    stationarity: jnp.ndarray    # ||grad_f + J' lam + lam_box||_inf
    feasibility: jnp.ndarray     # max constraint/bound violation
    complementarity: jnp.ndarray  # max |dual * distance-to-bound|
    max: jnp.ndarray             # overall KKT error (inf norm of the above)


def _eval_parts(nlp: NLP, z, p):
    g = nlp.cost_grad(z, p) if nlp.cost_grad is not None else \
        jax.grad(lambda zz: nlp.cost(zz, p))(z)
    cs, Js = [], []
    if nlp.eq is not None:
        cs.append(nlp.eq(z, p))
        Js.append(nlp.eq_jac(z, p) if nlp.eq_jac is not None else
                  jax.jacfwd(lambda zz: nlp.eq(zz, p))(z))
    if nlp.ineq is not None:
        cs.append(nlp.ineq(z, p))
        Js.append(nlp.ineq_jac(z, p) if nlp.ineq_jac is not None else
                  jax.jacfwd(lambda zz: nlp.ineq(zz, p))(z))
    dt = z.dtype
    c = jnp.concatenate(cs) if cs else jnp.zeros(0, dt)
    J = jnp.concatenate(Js, axis=0) if Js else jnp.zeros((0, nlp.n), dt)
    return g, c, J


def _row_bounds(nlp: NLP, bounds: NLPBounds, dt):
    cl = jnp.concatenate([jnp.zeros(nlp.ne, dt), bounds.gl.astype(dt)])
    cu = jnp.concatenate([jnp.zeros(nlp.ne, dt), bounds.gu.astype(dt)])
    return cl, cu


def _kkt_from_parts(nlp: NLP, g, c, J, z, lam, lam_box, cl, cu, lbx, ubx
                    ) -> KKTResidual:
    """KKT error from pre-evaluated derivative parts (g, c, J) — lets the
    refinement loop certify each iterate with the evaluation it already
    paid for instead of re-evaluating (fp64 evals are emulated on TPU and
    dominate the certification cost)."""
    dt = z.dtype
    stat = jnp.max(jnp.abs(g + (J.T @ lam if nlp.m else 0.0) + lam_box),
                   initial=0.0)
    feas_c = jnp.max(jnp.maximum(jnp.maximum(c - cu, 0.0),
                                 jnp.maximum(cl - c, 0.0)), initial=0.0) \
        if nlp.m else jnp.zeros((), dt)
    feas_x = jnp.max(jnp.maximum(jnp.maximum(z - ubx, 0.0),
                                 jnp.maximum(lbx - z, 0.0)), initial=0.0)
    feas = jnp.maximum(feas_c, feas_x)

    # complementarity: dual times distance to the *nearer* bound; equality
    # rows (cl == cu) have distance = |c - cl| which is their violation
    def comp_term(v, lo, up, y):
        d_lo = jnp.where(jnp.isfinite(lo), v - lo, jnp.inf)
        d_up = jnp.where(jnp.isfinite(up), up - v, jnp.inf)
        d = jnp.minimum(jnp.abs(d_lo), jnp.abs(d_up))
        d = jnp.where(jnp.isfinite(d), d, 0.0)
        return jnp.max(jnp.abs(y) * d, initial=0.0)

    comp = jnp.maximum(
        comp_term(c, cl, cu, lam) if nlp.m else jnp.zeros((), dt),
        comp_term(z, lbx, ubx, lam_box))
    return KKTResidual(stationarity=stat, feasibility=feas,
                       complementarity=comp,
                       max=jnp.maximum(stat, jnp.maximum(feas, comp)))


@full_precision
def kkt_residual(nlp: NLP, z, lam, lam_box, bounds: NLPBounds, p=None
                 ) -> KKTResidual:
    """Unscaled KKT error of (z, lam, lam_box) in the dtype of ``z``.

    Conventions match sqp_solve (nlp/sqp.py): stationarity is
    grad_f + J'lam + lam_box; rows live in [cl, cu]; lam_box is the *net*
    box dual (upper-active positive, lower-active negative).
    """
    dt = z.dtype
    lam = lam.astype(dt)
    lam_box = lam_box.astype(dt)
    cl, cu = _row_bounds(nlp, bounds, dt)
    lbx, ubx = bounds.lbx.astype(dt), bounds.ubx.astype(dt)
    g, c, J = _eval_parts(nlp, z, p)
    return _kkt_from_parts(nlp, g, c, J, z, lam, lam_box, cl, cu, lbx, ubx)


@full_precision
@functools.partial(jax.jit,
                   static_argnames=("nlp", "iters", "act_tol", "solve_dtype",
                                    "matrix_dtype", "return_residual"))
def refine_solution(nlp: NLP, z, lam, lam_box, bounds: NLPBounds, p=None,
                    iters: int = 2, act_tol: float = 1e-3,
                    solve_dtype=None, matrix_dtype=None,
                    return_residual: bool = False):
    """Newton-KKT refinement in fp64 from an fp32 (or loose fp64) solution.

    ``solve_dtype`` controls the precision of the inner linear solve only:
    residuals, Jacobians and iterates always live in fp64.  On TPU, where
    XLA's LU factorisation is fp32-only, pass ``solve_dtype=jnp.float32``
    — that is textbook mixed-precision iterative refinement (high-precision
    residuals + low-precision factorisation), which still converges to
    fp64-accurate KKT points as long as kappa(K)*eps_f32 < 1; each step
    cuts the residual by that factor, so bump ``iters`` to 3.

    ``matrix_dtype`` controls the precision of the *Lagrangian Hessian*
    evaluation only (the W block of the Newton matrix).  Refinement accuracy
    is set by the residual precision, not the matrix: W only preconditions
    the step, so evaluating the second-order AD in fp32 (cheap on TPU)
    instead of emulated fp64 changes the per-step contraction factor
    slightly but not the attainable residual.  First-order quantities
    (g, c, J) stay fp64 — they enter the residual.

    ``return_residual=True`` appends the certified fp64 KKT infinity norm of
    the returned point (already computed for the accept/reject test) so
    callers don't pay another fp64 Jacobian evaluation to re-certify.

    Freezes the active set detected at the input point, then runs ``iters``
    exact-Hessian Newton steps on the square active-set KKT system

        [ W      J'        I     ] [dz  ]   [ g + J'lam + lam_box ]
        [ J      0         0     ] [dlam] = [ act_c*(c - b) + (1-act_c)*lam ]
        [ diag(a) 0  diag(1-a)   ] [dlb ]  -[ a*(z - b) + (1-a)*lam_box ]

    (the same structure as the boxADMM polish, box_admm.py:_polish, but with
    re-evaluated nonlinear residuals and exact Lagrangian Hessian, so it
    converges quadratically to the true KKT point).  Returns refined
    (z, lam, lam_box) in fp64; callers re-certify with
    :func:`kkt_residual` — a step that leaves the basin is rejected
    per-instance by comparing before/after residuals.
    """
    f64 = jnp.float64
    sd = f64 if solve_dtype is None else solve_dtype
    z = z.astype(f64)
    lam = lam.astype(f64)
    lam_box = lam_box.astype(f64)
    bounds64 = NLPBounds(*(b.astype(f64) for b in bounds))
    p64 = jax.tree_util.tree_map(
        lambda a: a.astype(f64) if jnp.issubdtype(
            jnp.asarray(a).dtype, jnp.floating) else a, p)
    n, m = nlp.n, nlp.m
    cl, cu = _row_bounds(nlp, bounds64, f64)
    lbx, ubx = bounds64.lbx, bounds64.ubx

    md = f64 if matrix_dtype is None else matrix_dtype
    p_md = p64 if md == f64 else jax.tree_util.tree_map(
        lambda a: a.astype(md) if jnp.issubdtype(
            jnp.asarray(a).dtype, jnp.floating) else a, p)

    if nlp.lag_hessian is not None:
        hess = lambda zz, ll: nlp.lag_hessian(
            zz.astype(md), ll.astype(md), p_md).astype(f64)
    else:
        def hess(zz, ll):
            def lagr(v):
                val = nlp.cost(v, p_md)
                if m:
                    val = val + _eval_parts(nlp, v, p_md)[1] @ ll.astype(md)
                return val
            return jax.jacfwd(jax.grad(lagr))(zz.astype(md)).astype(f64)

    # ---- active-set detection (re-done at every step's iterate) ----
    # the set is *refreshed* each Newton step from the carried evaluation:
    # an fp32 solution occasionally sits act_tol-marginally on the wrong
    # side of a bound, and freezing that misclassification makes the first
    # step contract poorly (measured: 6/512 kite instances need a third
    # step with a frozen set; refreshing costs nothing — it reuses the
    # (c, z) the step already carries)
    def active_set(z, c):
        act_lo_c = (c - cl <= act_tol) if m else jnp.zeros(0, bool)
        act_up_c = (cu - c <= act_tol) if m else jnp.zeros(0, bool)
        b_c = jnp.where(act_lo_c, cl, cu) if m else jnp.zeros(0, f64)
        b_c = jnp.where(jnp.isfinite(b_c), b_c, 0.0)
        act_lo_x = (z - lbx) <= act_tol
        act_up_x = (ubx - z) <= act_tol
        b_x = jnp.where(act_lo_x, lbx, ubx)
        b_x = jnp.where(jnp.isfinite(b_x), b_x, 0.0)
        ac = (act_lo_c | act_up_c).astype(f64)
        ax = (act_lo_x | act_up_x).astype(f64)
        return ac, b_c, ax, b_x

    # one evaluation serves triple duty: active-set detection, the first
    # Newton step's residual, and the before-refinement KKT certificate
    g0, c0, J0 = _eval_parts(nlp, z, p64)
    In = jnp.eye(n, dtype=f64)
    delta = 1e-10

    def step(carry, _):
        # the carried (g, c, J) were evaluated at the carried point — each
        # step pays exactly one fp64 first-order evaluation (at its output)
        z, lam, lam_box, g, c, J = carry
        ac, b_c, ax, b_x = active_set(z, c)
        W = hess(z, lam)
        r1 = g + (J.T @ lam if m else 0.0) + lam_box
        r3 = ax * (z - b_x) + (1.0 - ax) * lam_box
        if m:
            r2 = ac * (c - b_c) + (1.0 - ac) * lam
            K = jnp.block([
                [W + delta * In, J.T, In],
                [ac[:, None] * J, jnp.diag(1.0 - ac) - delta * jnp.diag(ac),
                 jnp.zeros((m, n), f64)],
                [jnp.diag(ax), jnp.zeros((n, m), f64),
                 jnp.diag(1.0 - ax) - delta * jnp.diag(ax)],
            ])
            r = jnp.concatenate([r1, r2, r3])
        else:
            K = jnp.block([
                [W + delta * In, In],
                [jnp.diag(ax), jnp.diag(1.0 - ax) - delta * jnp.diag(ax)],
            ])
            r = jnp.concatenate([r1, r3])
        # a plain low-precision solve suffices: refinement accuracy is set
        # by the fp64 residual, and an inner solve-refinement pass was
        # measured to cost ~20% without certifying a single extra instance
        # (the stragglers are active-set-limited, not solve-precision-
        # limited — hence the per-step active-set refresh above)
        sol = jnp.linalg.solve(K.astype(sd), (-r).astype(sd)).astype(f64)
        dz = sol[:n]
        dlam = sol[n:n + m]
        dlb = sol[n + m:]
        ok = jnp.all(jnp.isfinite(sol))
        z2 = jnp.where(ok, z + dz, z)
        lam2 = jnp.where(ok, lam + dlam, lam)
        lam_box2 = jnp.where(ok, lam_box + dlb, lam_box)
        # keep iterates inside the box (active-set solve can overshoot by
        # rounding; clipping is exact for the frozen active set)
        z2 = jnp.clip(z2, lbx, ubx)
        g2, c2, J2 = _eval_parts(nlp, z2, p64)
        return (z2, lam2, lam_box2, g2, c2, J2), None

    (z2, lam2, lam_box2, g2, c2, J2), _ = jax.lax.scan(
        step, (z, lam, lam_box, g0, c0, J0), None, length=iters)

    # accept only if the refinement improved the true KKT error — both
    # certificates come from already-paid evaluations (g0/c0/J0 at the
    # input, the last step's g2/c2/J2 at the output)
    r_before = _kkt_from_parts(nlp, g0, c0, J0, z, lam, lam_box,
                               cl, cu, lbx, ubx).max
    r_after = _kkt_from_parts(nlp, g2, c2, J2, z2, lam2, lam_box2,
                              cl, cu, lbx, ubx).max
    ok = r_after <= r_before
    pick = lambda a, b: jnp.where(ok, a, b)
    out = (pick(z2, z), pick(lam2, lam), pick(lam_box2, lam_box))
    if return_residual:
        return out + (jnp.where(ok, r_after, r_before),)
    return out
