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


def _newton_kkt_solve(M, r, ir: int = 2):
    """Symmetric Newton-KKT solve — a ``custom_vmap`` function so the
    *batched* certification pipeline hits the lane-batched Pallas LDL^T
    kernel (ops/ldlt.py) instead of XLA's pivoted LU, which is
    scalar-recurrence-bound on TPU (measured: 72 ms for 512 lanes at K=209
    — the entire refinement budget).  Unvmapped calls use plain LU.

    The refine KKT's (1,1) block is the *exact* Lagrangian Hessian, which
    is routinely indefinite away from the solution — the matrix is not
    quasi-definite, so the unpivoted LDL^T factor can suffer large element
    growth (measured: stalls 20+/512 kite lanes at 1e-5 KKT).  ``ir``
    fixed-count iterative-refinement sweeps against the *same fp32 matrix*
    (full-fp32 matvec + factor re-solve) recover the pivoted-LU solve
    quality: growth-induced factor error contracts by ~(growth*eps32) per
    sweep, and each sweep is two triangular passes — far cheaper than
    pivoting on TPU."""
    from jax.custom_batching import custom_vmap
    from polympc_tpu.ops.ldlt import (
        ldlt_factor_solve, ldlt_solve, pallas_fits)

    def _impl(M, r):
        return jnp.linalg.solve(M, r)

    solve = custom_vmap(_impl)

    @solve.def_vmap
    def _batched(axis_size, in_batched, M, r):
        M = M if in_batched[0] else jnp.broadcast_to(
            M, (axis_size,) + M.shape)
        r = r if in_batched[1] else jnp.broadcast_to(
            r, (axis_size,) + r.shape)
        K = M.shape[-1]
        if M.dtype == jnp.float32 and pallas_fits(K):
            # trace the kernel with x64 disabled: the certification pipeline
            # runs under jax.enable_x64(), which would make grid/loop indices
            # int64 — Mosaic's convert lowering recurses on those.  All
            # operands are already fp32, so the jaxpr is identical to the
            # non-x64 one.
            with jax.enable_x64(False):
                x, F, d = ldlt_factor_solve(M, r)
                for _ in range(ir):
                    # residual at FULL fp32 (TPU matmuls default to bf16
                    # passes, which would hide exactly the error IR removes)
                    res = r - jnp.einsum("bij,bj->bi", M, x,
                                         precision=jax.lax.Precision.HIGHEST)
                    x = x + ldlt_solve(F, d, res)
        else:
            # fp64 (CPU parity runs) or VMEM-exceeding sizes: batched LU
            x = jnp.linalg.solve(M, r[..., None])[..., 0]
        return x, True

    return solve(M, r)


@full_precision
@functools.partial(jax.jit,
                   static_argnames=("nlp", "iters", "act_tol", "solve_dtype",
                                    "matrix_dtype", "return_residual",
                                    "kkt_solver", "solve_ir", "return_last"))
def refine_solution(nlp: NLP, z, lam, lam_box, bounds: NLPBounds, p=None,
                    iters: int = 2, act_tol: float = 1e-3,
                    solve_dtype=None, matrix_dtype=None,
                    return_residual: bool = False,
                    kkt_solver: str = "ldlt", solve_ir: int = 2,
                    return_last: bool = False):
    """Newton-KKT refinement in fp64 from an fp32 (or loose fp64) solution.

    ``solve_dtype`` controls the precision of the inner linear solve only:
    residuals, Jacobians and iterates always live in fp64.  On TPU, where
    dense factorisations are fp32-only, pass ``solve_dtype=jnp.float32``
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

    ``kkt_solver``: "ldlt" routes the per-step linear solve through the
    lane-batched Pallas LDL^T kernel when the call is vmapped and fp32
    (the TPU certification pipeline); "lu" forces XLA's pivoted LU.

    ``return_residual=True`` appends the certified fp64 KKT infinity norm of
    the returned point (already computed for the accept/reject test) so
    callers don't pay another fp64 Jacobian evaluation to re-certify.

    Each step detects the active set at the current iterate, *eliminates*
    the box-dual block and the inactive multipliers, and solves the reduced
    symmetric quasi-definite active-set system in (dz, dlam)

        [ Wm   Jm' ] [dz  ]   [ (1-ax)*(g + J'(ac*lam) + (W+dI)t) - ax*t ]
        [ Jm  -Dc  ] [dlam] = [ ac*((c - b_c) + J(ax*t))                 ]
          (RHS negated)

    with Wm = (1-ax)(W+dI)(1-ax)' + diag(ax), Jm = diag(ac) J diag(1-ax),
    Dc = d*ac + (1-ac), and t = ax*(b_x - z) the exact step onto the active
    box faces.  Inactive multipliers are zeroed; active box duals are then
    assigned *exactly* from the fp64 stationarity at the new point,
    lam_box = -ax*(g2 + J2'lam2), which zeroes the stationarity residual on
    active coordinates by construction (the box-dual column of the KKT is an
    identity — its Newton equation is linear, so the assignment IS the
    Newton update, evaluated without roundup).  This is the same elimination
    the boxADMM polish uses (box_admm.py:_polish) but with re-evaluated
    nonlinear residuals and the exact Lagrangian Hessian: convergence is
    quadratic to the true KKT point.

    The Newton iterate always advances (its max-norm residual path is
    routinely non-monotone), but the *returned* point is the best iterate by
    true fp64 KKT residual — each certificate reuses the evaluations the
    step already paid for — so an indefinite-W factorisation breakdown or a
    basin departure can never degrade the result below the input point.
    Returns refined (z, lam, lam_box) in fp64.
    """
    if kkt_solver not in ("ldlt", "lu"):
        raise ValueError("kkt_solver must be 'ldlt' or 'lu'")
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
    # Newton-matrix regularisation.  1e-6 keeps the fp32 LDL^T pivots away
    # from zero (the (2,2) active rows would otherwise be ~0); it perturbs
    # only the *matrix*, not the residual, so the Newton fixed point is the
    # exact KKT point — the rate loses O(delta*kappa), which is invisible.
    delta = 1e-6

    def residual_of(parts):
        z, lam, lam_box, g, c, J = parts
        return _kkt_from_parts(nlp, g, c, J, z, lam, lam_box,
                               cl, cu, lbx, ubx).max

    def step(state, _):
        # the carried (g, c, J) were evaluated at the carried point — each
        # step pays exactly one fp64 first-order evaluation (at its output)
        (z, lam, lam_box, g, c, J), best, best_r = state
        ac, b_c, ax, b_x = active_set(z, c)
        W = hess(z, lam)
        free = 1.0 - ax
        t = ax * (b_x - z)                      # exact active-face step
        Wd_t = W @ t + delta * t
        lam_a = ac * lam if m else jnp.zeros(0, f64)
        rz = free * (g + (J.T @ lam_a if m else 0.0) + Wd_t) - ax * t
        Wm = free[:, None] * (W + delta * In) * free[None, :] + jnp.diag(ax)
        if m:
            rc = ac * ((c - b_c) + J @ t)
            Jm = (ac[:, None] * J) * free[None, :]
            Dc = delta * ac + (1.0 - ac)
            M = jnp.block([[Wm, Jm.T], [Jm, -jnp.diag(Dc)]])
            r = jnp.concatenate([rz, rc])
        else:
            M = Wm
            r = rz
        # symmetric Jacobi (max-row) equilibration before the low-precision
        # solve: the active-set KKT inherits the NLP's raw row scales (the
        # race car's force columns sit 1e4 above its angle columns), and
        # unpivoted fp32 LDL^T loses ~kappa*eps32 per solve — measured: the
        # unequilibrated solve stalled 5/256 race-car lanes at 1e-4 KKT
        # while equilibrated lanes contract to 1e-6.  Exact in fp64: the
        # scaling is applied and undone outside the fp32 factorisation.
        dscale = 1.0 / jnp.sqrt(
            jnp.clip(jnp.max(jnp.abs(M), axis=1), 1e-10, None))
        Ms = (dscale[:, None] * M) * dscale[None, :]
        rs = dscale * (-r)
        sol = _newton_kkt_solve(Ms.astype(sd), rs.astype(sd)) \
            if kkt_solver == "ldlt" else \
            jnp.linalg.solve(Ms.astype(sd), rs.astype(sd))
        sol = dscale * sol.astype(f64)
        ok = jnp.all(jnp.isfinite(sol))
        dz = jnp.where(ok, sol[:n], 0.0)
        z2 = jnp.clip(z + dz, lbx, ubx)         # exact for the active set
        lam2 = jnp.where(ok, ac * (lam + sol[n:]), lam) if m else lam
        g2, c2, J2 = _eval_parts(nlp, z2, p64)
        # active box duals from exact fp64 stationarity at the new point;
        # inactive box duals are zero
        lam_box2 = jnp.where(
            ok, -ax * (g2 + (J2.T @ lam2 if m else 0.0)), lam_box)
        new = (z2, lam2, lam_box2, g2, c2, J2)
        # the iterate always advances (Newton paths are routinely
        # non-monotone in the max-norm — pinning the iterate to the best
        # point was measured to freeze 20+/512 kite lanes at their first
        # transient increase), but the *returned* point is the best iterate
        # by true fp64 KKT residual, so a factorisation breakdown or basin
        # departure can never degrade the result below the input
        r_new = residual_of(new)
        improved = r_new <= best_r
        best2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(improved, a, b),
            (z2, lam2, lam_box2), best)
        return (new, best2, jnp.minimum(r_new, best_r)), None

    start = (z, lam, lam_box, g0, c0, J0)
    r0 = residual_of(start)
    (last, best, best_r), _ = jax.lax.scan(
        step, (start, (z, lam, lam_box), r0), None, length=iters)
    out = best
    if return_residual:
        out = out + (best_r,)
    if return_last:
        # the LAST Newton iterate (not the best-by-residual point): lets a
        # caller that splits refinement into stages (adaptive tail sweeps,
        # bench.py) continue the non-monotone Newton path instead of
        # restarting from a pinned best point — restarting was measured to
        # freeze 3/512 kite tail lanes that the continuous path certifies
        out = out + last[:3]
    return out
