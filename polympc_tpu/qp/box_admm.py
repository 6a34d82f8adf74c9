"""Box-constrained OSQP-style ADMM QP solver, pure JAX.

TPU-native re-design of the reference's ``boxADMM`` (box_admm.hpp:15-477) and
``ADMM`` (admm.hpp): the operator-splitting method of Stellato et al.,
"OSQP: an operator splitting solver for quadratic programs", with a *separate*
splitting for the box constraints so the KKT system is (n+m) x (n+m) rather
than (2n+m) x (2n+m).

Key TPU-first design decisions (vs the C++ reference):
  - the whole solve is a bounded ``lax.while_loop`` over *epochs*; the KKT
    matrix is factorised once per epoch (dense LU) and ``check_every`` ADMM
    iterations run between residual checks — adaptive-rho refactorisation
    (box_admm.hpp:167-187) becomes an unconditional per-epoch refactor, which
    keeps the loop vmap-friendly (no data-dependent branching on refactors);
  - constraint-type classification (EQUALITY/INEQUALITY/LOOSE,
    qp_base.hpp:195-222) is a vectorised ``where`` producing the per-row rho;
  - everything is dense: collocation KKT structure is exploited later by the
    Pallas kernel, not by a sparse format.

Iteration (rho (m,) for general rows, rb (n,) for box rows):

  [ H + sigma*I + diag(rb)   A' ] [x~]   [ sigma*x + rb*q - yb - h ]
  [ A                -diag(1/rho)] [nu] = [ z - y/rho ]

  z~ <- z + (nu - y)/rho
  x  <- alpha*x~ + (1-alpha)*x
  z+ <- clip(alpha*z~ + (1-alpha)*z + y/rho,  al, au);  y += rho*(pre - z+)
  q+ <- clip(alpha*x~ + (1-alpha)*q + yb/rb,  xl, xu);  yb += rb*(pre - q+)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

from polympc_tpu.qp.types import (
    QPData, QPSolution, ADMMSettings, infer_dims,
)
from polympc_tpu.qp.ruiz import ruiz_equilibrate, RuizScaling
from polympc_tpu.utils import status as st
from polympc_tpu.utils.precision import full_precision

__all__ = ["box_admm_solve", "admm_solve", "classify_constraints", "rho_vector"]


def _inf_norm(v):
    return jnp.max(jnp.abs(v)) if v.size else jnp.zeros(())


def classify_constraints(al, au, settings: ADMMSettings):
    """Per-row constraint type: returns (is_eq, is_loose) boolean masks
    (ref: qp_base.hpp:195-222)."""
    is_loose = (al < -settings.loose_bound) & (au > settings.loose_bound)
    is_eq = (au - al) < settings.eq_tol
    return is_eq, is_loose & ~is_eq


def rho_vector(rho_base, al, au, settings: ADMMSettings):
    """Per-constraint penalty: equalities get rho*1e3, loose rows rho_min
    (ref: box_admm.hpp:357-396)."""
    is_eq, is_loose = classify_constraints(al, au, settings)
    rho = jnp.full_like(al, rho_base)
    rho = jnp.where(is_eq, rho_base * settings.rho_eq_scale, rho)
    rho = jnp.where(is_loose, settings.rho_min, rho)
    return jnp.clip(rho, settings.rho_min, settings.rho_max)


def _support(b, v):
    """Support-function term sum_i b_i v_i with the convention 0*inf = 0.
    Infinite bounds hit by a nonzero certificate direction yield +inf, which
    correctly fails the infeasibility test (OSQP §3.4)."""
    return jnp.sum(jnp.where(v == 0.0, 0.0, b * v)) if b.size else \
        jnp.zeros(())


def _infeasibility_certificates(qp: QPData, dx, dy, dyb, eps_inf):
    """OSQP §3.4 primal/dual infeasibility tests on the per-epoch primal and
    dual *increments* (the divergent rays of an infeasible problem).

    Returns (primal_infeasible, dual_infeasible) booleans.  The reference
    surfaces these only through its OSQP bridge's status mapping
    (osqp_interface.hpp:92-101, qp_base.hpp:55-62); the native boxADMM there
    has no certificates — this closes that gap for the TPU solver, box rows
    included (they behave as identity rows of A).
    """
    m = dy.shape[0]
    # --- primal: delta_y = (dy, dyb) with A' dy + dyb ~ 0 and negative
    #     support  u'(dy)_+ + l'(dy)_-  (certificate of no feasible point)
    nrm_y = jnp.maximum(_inf_norm(dy), _inf_norm(dyb))
    Atdy = (qp.A.T @ dy if m else jnp.zeros_like(dyb)) + dyb
    supp_p = (_support(qp.au, jnp.maximum(dy, 0.0))
              + _support(qp.al, jnp.minimum(dy, 0.0))
              + _support(qp.xu, jnp.maximum(dyb, 0.0))
              + _support(qp.xl, jnp.minimum(dyb, 0.0)))
    prim_inf = (nrm_y > 0.0) \
        & (_inf_norm(Atdy) <= eps_inf * nrm_y) \
        & (supp_p <= -eps_inf * nrm_y)

    # --- dual: delta_x with H dx ~ 0, h'dx < 0, and A dx inside the
    #     recession cone of the constraint set (unbounded descent ray)
    nrm_x = _inf_norm(dx)
    Adx = qp.A @ dx if m else jnp.zeros(0, dx.dtype)
    tol = eps_inf * nrm_x

    def _cone_ok(v, lo, up):
        # rows with finite upper bound need v <= tol; finite lower: v >= -tol
        up_ok = jnp.where(jnp.isfinite(up), v <= tol, True)
        lo_ok = jnp.where(jnp.isfinite(lo), v >= -tol, True)
        return jnp.all(up_ok & lo_ok) if v.size else jnp.asarray(True)

    dual_inf = (nrm_x > 0.0) \
        & (_inf_norm(qp.H @ dx) <= tol) \
        & (qp.h @ dx <= -tol) \
        & _cone_ok(Adx, qp.al, qp.au) \
        & _cone_ok(dx, qp.xl, qp.xu)
    return prim_inf, dual_inf


def _build_kkt(qp: QPData, rho, rho_box, sigma):
    n, m = infer_dims(qp)
    dt = qp.H.dtype
    K11 = qp.H + (sigma * jnp.eye(n, dtype=dt)
                  + jnp.diag(rho_box.astype(dt)))
    if m == 0:
        return K11
    K12 = qp.A.T
    K22 = -jnp.diag(1.0 / rho)
    return jnp.block([[K11, K12], [qp.A, K22]])


def _residuals(qp: QPData, x, z, q, y, yb):
    """OSQP primal/dual residuals extended with the box split
    (ref: qp_base.hpp:240-252, box_admm.hpp:398-415)."""
    Ax = qp.A @ x if qp.A.shape[0] else jnp.zeros_like(z)
    Hx = qp.H @ x
    ATy = qp.A.T @ y if qp.A.shape[0] else jnp.zeros_like(x)
    r_prim = jnp.maximum(_inf_norm(Ax - z), _inf_norm(x - q))
    r_dual = _inf_norm(Hx + qp.h + ATy + yb)
    # relative scalings
    prim_scale = jnp.maximum(
        jnp.maximum(_inf_norm(Ax), _inf_norm(z)),
        jnp.maximum(_inf_norm(x), _inf_norm(q)))
    dual_scale = jnp.maximum(
        jnp.maximum(_inf_norm(Hx), _inf_norm(ATy)),
        jnp.maximum(_inf_norm(qp.h), _inf_norm(yb)))
    return r_prim, r_dual, prim_scale, dual_scale


@functools.lru_cache(maxsize=None)
def _make_epoch_fn(sigma, alpha, iters, structure=None):
    """One ADMM epoch (fixed rho: ``iters`` iterations on a pre-built KKT)
    as a ``custom_vmap`` function: solo/unvmapped calls run the LU path
    below; under ``vmap`` (the batched-MPC hot path) the whole epoch runs as
    a fused lane-batched Pallas kernel with the factor VMEM-resident — the
    bordered-block-tridiagonal kernel (ops/bbt_kernel.py) when the caller
    supplied the collocation ``structure``, the dense LDL^T epoch
    (ops/admm_epoch.py) otherwise."""
    from jax.custom_batching import custom_vmap
    from polympc_tpu.ops.admm_epoch import (
        admm_epoch_batched, epoch_kernel_fits,
    )
    from polympc_tpu.ops.bbt_kernel import (
        bbt_admm_epoch_batched, bbt_kernel_fits,
    )
    from polympc_tpu.ops.structure import structure_is_consistent

    def _epoch_impl(kkt, h, al, au, xl, xu, rho, rb, x, z, q, y, yb):
        n, m = h.shape[0], al.shape[0]
        # solo solves on TPU: run the fused Pallas kernel as a 1-lane batch
        # instead of XLA's pivoted LU — the LU factorisation is a scalar
        # recurrence on TPU and dominates single-instance (B=1 real-time)
        # latency (measured: 2.3 s -> 63 ms warm race-car re-solve).  Only
        # above K ~ 96: tiny KKTs (spline fit K=47, frame transform K=1)
        # are faster through LU than through a 128-lane-padded kernel
        # (measured: 0.27 -> 0.43 ms spline-fit regression unguarded)
        if (jax.default_backend() == "tpu" and kkt.dtype == jnp.float32
                and n + m >= 96):
            args1 = [a[None] for a in (kkt, h, al, au, xl, xu, rho, rb,
                                       x, z, q, y, yb)]
            if (structure is not None and structure.n == n
                    and structure.m == m
                    and structure_is_consistent(structure)
                    and bbt_kernel_fits(structure)):
                out = bbt_admm_epoch_batched(*args1, st=structure,
                                             sigma=sigma, alpha=alpha,
                                             iters=iters)
                return tuple(o[0] for o in out)
            if epoch_kernel_fits(n, m):
                out = admm_epoch_batched(*args1, sigma=sigma, alpha=alpha,
                                         iters=iters)
                return tuple(o[0] for o in out)
        fac = lu_factor(kkt)

        def it(_, state):
            x, z, q, y, yb = state
            rhs_top = sigma * x + rb * q - yb - h
            rhs = jnp.concatenate([rhs_top, z - y / rho]) if m else rhs_top
            sol = lu_solve(fac, rhs)
            xt = sol[:n]
            x_new = alpha * xt + (1 - alpha) * x
            q_u = alpha * xt + (1 - alpha) * q
            q_new = jnp.clip(q_u + yb / rb, xl, xu)
            yb_new = yb + rb * (q_u - q_new)
            if m:
                zt = z + (sol[n:] - y) / rho
                z_u = alpha * zt + (1 - alpha) * z
                z_new = jnp.clip(z_u + y / rho, al, au)
                y_new = y + rho * (z_u - z_new)
            else:
                z_new, y_new = z, y
            return x_new, z_new, q_new, y_new, yb_new

        return jax.lax.fori_loop(0, iters, it, (x, z, q, y, yb))

    epoch = custom_vmap(_epoch_impl)

    @epoch.def_vmap
    def _batched(axis_size, in_batched, *args):
        args = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        n, m = args[1].shape[-1], args[2].shape[-1]
        if (structure is not None and structure.n == n and structure.m == m
                and structure_is_consistent(structure)
                and bbt_kernel_fits(structure)):
            out = bbt_admm_epoch_batched(*args, st=structure, sigma=sigma,
                                         alpha=alpha, iters=iters)
        elif epoch_kernel_fits(n, m):
            out = admm_epoch_batched(*args, sigma=sigma, alpha=alpha,
                                     iters=iters)
        else:
            # KKT too large for the fused kernels' VMEM working sets:
            # fall back to the vmapped LU epoch
            out = jax.vmap(_epoch_impl)(*args)
        return out, (True,) * 5

    return epoch


@full_precision
def box_admm_solve(qp: QPData, x0=None, y0=None, y_box0=None,
                   settings: ADMMSettings = ADMMSettings()) -> QPSolution:
    """Solve the box-constrained QP.  Pure function: jit/vmap/grad-safe.

    Gradients flow through the solution via implicit differentiation of the
    KKT conditions at the converged active set (OptNet-style custom VJP), not
    by unrolling ADMM iterations.

    x0, y0: optional primal / general-constraint-dual warm starts
    (ref: box_admm.hpp:88-100 warm-start state).
    """
    n, m = infer_dims(qp)
    dt = qp.H.dtype
    if x0 is None:
        x0 = jnp.zeros(n, dt)
    if y0 is None:
        y0 = jnp.zeros(m, dt)
    if y_box0 is None:
        y_box0 = jnp.zeros(n, dt)
    return _solve_vjp(settings, qp, x0, y0, y_box0)


@functools.partial(jax.jit, static_argnames=("settings",))
def _box_admm_raw(qp: QPData, x0, y0, yb0,
                  settings: ADMMSettings = ADMMSettings()) -> QPSolution:
    n, m = infer_dims(qp)
    dt = qp.H.dtype

    scaling = None
    if settings.equil_iters > 0:
        qp, scaling = ruiz_equilibrate(qp, iters=settings.equil_iters)
        # inverse of unscale_solution: x = d*x~, y = e*y~/c, yb = y~b/(d*c)
        x0 = x0 / scaling.d
        y0 = y0 * scaling.c / scaling.e
        yb0 = yb0 * scaling.d * scaling.c

    x = x0.astype(dt)
    y = y0.astype(dt)
    yb = yb0.astype(dt)
    z = qp.A @ x if m else jnp.zeros(0, dt)
    q = x

    rho0 = jnp.asarray(settings.rho, dt)
    # box rows are plain inequalities unless actually loose
    box_loose = (qp.xl < -settings.loose_bound) & (qp.xu > settings.loose_bound)
    box_eq = (qp.xu - qp.xl) < settings.eq_tol

    def make_rho(rho_base):
        rho = rho_vector(rho_base, qp.al, qp.au, settings) if m else \
            jnp.zeros(0, dt)
        rb = jnp.full(n, rho_base, dt)
        rb = jnp.where(box_eq, rho_base * settings.rho_eq_scale, rb)
        rb = jnp.where(box_loose, settings.rho_min, rb)
        return rho, jnp.clip(rb, settings.rho_min, settings.rho_max)

    def epoch_body(carry):
        (x, z, q, y, yb, rho_base, epoch, done, rp, rd, div,
         pinf, dinf) = carry
        rho, rb = make_rho(rho_base)
        kkt = _build_kkt(qp, rho, rb, settings.sigma)
        if settings.kkt_solver == "pallas":
            ep = _make_epoch_fn(float(settings.sigma), float(settings.alpha),
                                int(settings.check_every),
                                settings.structure)
            x2, z2, q2, y2, yb2 = ep(kkt, qp.h, qp.al, qp.au, qp.xl, qp.xu,
                                     rho, rb, x, z, q, y, yb)
        else:
            if settings.kkt_solver == "inverse":
                kkt_inv = jnp.linalg.inv(kkt)
                solve_kkt = lambda rhs: kkt_inv @ rhs
            else:
                fac = lu_factor(kkt)
                solve_kkt = lambda rhs: lu_solve(fac, rhs)

            def admm_iter(_, state):
                x, z, q, y, yb = state
                rhs_top = settings.sigma * x + rb * q - yb - qp.h
                if m:
                    rhs = jnp.concatenate([rhs_top, z - y / rho])
                else:
                    rhs = rhs_top
                sol = solve_kkt(rhs)
                xt = sol[:n]
                if m:
                    nu = sol[n:]
                    zt = z + (nu - y) / rho
                a = settings.alpha
                x_new = a * xt + (1 - a) * x
                # box split: z_new = proj(u + y/rho), y_new = y + rho*(u - z_new)
                q_u = a * xt + (1 - a) * q
                q_new = jnp.clip(q_u + yb / rb, qp.xl, qp.xu)
                yb_new = yb + rb * (q_u - q_new)
                if m:
                    z_u = a * zt + (1 - a) * z
                    z_new = jnp.clip(z_u + y / rho, qp.al, qp.au)
                    y_new = y + rho * (z_u - z_new)
                else:
                    z_new, y_new = z, y
                return x_new, z_new, q_new, y_new, yb_new

            x2, z2, q2, y2, yb2 = jax.lax.fori_loop(
                0, settings.check_every, admm_iter, (x, z, q, y, yb))

        # divergence guard: ill-conditioned or non-finite data can blow the
        # iteration up; freeze at the last finite state and report UNSOLVED
        finite = (jnp.all(jnp.isfinite(x2)) & jnp.all(jnp.isfinite(y2))
                  & jnp.all(jnp.isfinite(yb2)))
        x2 = jnp.where(finite, x2, x)
        z2 = jnp.where(finite, z2, z)
        q2 = jnp.where(finite, q2, q)
        y2 = jnp.where(finite, y2, y)
        yb2 = jnp.where(finite, yb2, yb)

        rp2, rd2, ps, ds = _residuals(qp, x2, z2, q2, y2, yb2)
        eps_p = settings.eps_abs + settings.eps_rel * ps
        eps_d = settings.eps_abs + settings.eps_rel * ds
        conv = (rp2 <= eps_p) & (rd2 <= eps_d)
        div2 = div | ~finite

        # infeasibility certificates on the epoch increments (OSQP §3.4);
        # an infeasible problem's iterates diverge along the certificate ray
        pinf2, dinf2 = _infeasibility_certificates(
            qp, x2 - x, y2 - y, yb2 - yb, settings.eps_inf)
        pinf2 = pinf | (pinf2 & finite & ~conv)
        dinf2 = dinf | (dinf2 & finite & ~conv)

        if settings.adaptive_rho:
            # rho <- rho*sqrt(relative primal/dual residual ratio)
            # (ref: box_admm.hpp:433-445; OSQP eq. 28)
            num = rp2 / jnp.maximum(ps, 1e-12)
            den = rd2 / jnp.maximum(ds, 1e-12)
            scale = jnp.sqrt(num / jnp.maximum(den, 1e-12))
            scale = jnp.clip(scale, 1e-3, 1e3)
            rho_next = jnp.clip(rho_base * scale, settings.rho_min,
                                settings.rho_max)
        else:
            rho_next = rho_base

        # freeze state once converged (vmap lanes finish independently);
        # a certified-infeasible lane also stops iterating
        keep = done
        out = tuple(jnp.where(keep, a, b) for a, b in
                    zip((x, z, q, y, yb, rho_base, epoch, done, rp, rd, div,
                         pinf, dinf),
                        (x2, z2, q2, y2, yb2, rho_next, epoch + 1,
                         conv | div2 | pinf2 | dinf2, rp2, rd2, div2,
                         pinf2, dinf2)))
        return out

    def epoch_cond(carry):
        epoch, done = carry[6], carry[7]
        return (~done) & (epoch < settings.max_epochs)

    init = (x, z, q, y, yb, rho0, jnp.zeros((), jnp.int32),
            jnp.zeros((), bool), jnp.asarray(jnp.inf, dt),
            jnp.asarray(jnp.inf, dt), jnp.zeros((), bool),
            jnp.zeros((), bool), jnp.zeros((), bool))
    (x, z, q, y, yb, rho_base, epochs, done, rp, rd,
     diverged, prim_inf, dual_inf) = jax.lax.while_loop(
        epoch_cond, epoch_body, init)

    if settings.polish:
        x, y, yb, rp, rd = _polish(qp, x, y, yb, rp, rd, settings)
        eps_p = settings.eps_abs + settings.eps_rel * jnp.maximum(
            _inf_norm(qp.A @ x) if m else jnp.zeros((), dt), _inf_norm(x))
        eps_d = settings.eps_abs + settings.eps_rel * jnp.maximum(
            _inf_norm(qp.H @ x), _inf_norm(qp.h))
        done = done | ((rp <= eps_p) & (rd <= eps_d) & ~diverged)

    # status vocabulary mirrors qp_base.hpp:55-62 via the OSQP mapping
    # (osqp_interface.hpp:92-101): primal infeasible -> INFEASIBLE; the
    # dual-infeasible (unbounded) certificate gets the finer INCONSISTENT
    status = jnp.where(
        diverged, st.UNSOLVED,
        jnp.where(prim_inf, st.INFEASIBLE,
                  jnp.where(dual_inf, st.INCONSISTENT,
                            jnp.where(done, st.SOLVED,
                                      st.MAX_ITER_EXCEEDED)))).astype(
        jnp.int32)
    iters = (epochs * settings.check_every).astype(jnp.int32)
    rho_final, _ = make_rho(rho_base)

    if scaling is not None:
        x = scaling.d * x
        y = scaling.e * y / scaling.c
        yb = yb / (scaling.d * scaling.c)

    return QPSolution(x=x, y=y, y_box=yb, status=status, iters=iters,
                      res_prim=rp, res_dual=rd, rho=rho_final)


def _polish(qp: QPData, x, y, yb, rp, rd, settings: ADMMSettings):
    """Active-set polish (OSQP §5.5): guess the active set from the ADMM
    solution, solve the equality-constrained KKT exactly, keep the polished
    point only if it improves both residuals.  One dense LU — cheap relative
    to the ADMM loop, and it returns near-machine-precision duals, which
    matters because SQP warm-starts the next QP with them."""
    n, m = infer_dims(qp)
    dt = qp.H.dtype
    tol = 10.0 * settings.eps_abs + 1e-9

    Ax = qp.A @ x if m else jnp.zeros(0, dt)
    act_lo = (Ax - qp.al <= tol) if m else jnp.zeros(0, bool)
    act_up = (qp.au - Ax <= tol) if m else jnp.zeros(0, bool)
    act = act_lo | act_up
    b_act = jnp.where(act_lo, qp.al, qp.au) if m else jnp.zeros(0, dt)
    actb_lo = (x - qp.xl) <= tol
    actb_up = (qp.xu - x) <= tol
    actb = actb_lo | actb_up
    bb_act = jnp.where(actb_lo, qp.xl, qp.xu)
    # guard unbounded "active" values (can't happen, but keep it finite)
    b_act = jnp.where(jnp.isfinite(b_act), b_act, 0.0)
    bb_act = jnp.where(jnp.isfinite(bb_act), bb_act, 0.0)

    af = act.astype(dt)
    abf = actb.astype(dt)
    In = jnp.eye(n, dtype=dt)
    d = settings.polish_delta
    if m:
        J = jnp.block([
            [qp.H + d * In, qp.A.T, In],
            [af[:, None] * qp.A, jnp.diag(1.0 - af) - d * jnp.diag(af),
             jnp.zeros((m, n), dt)],
            [jnp.diag(abf), jnp.zeros((n, m), dt),
             jnp.diag(1.0 - abf) - d * jnp.diag(abf)],
        ])
        rhs = jnp.concatenate([-qp.h, af * b_act, abf * bb_act])
    else:
        J = jnp.block([
            [qp.H + d * In, In],
            [jnp.diag(abf), jnp.diag(1.0 - abf) - d * jnp.diag(abf)],
        ])
        rhs = jnp.concatenate([-qp.h, abf * bb_act])
    sol = jnp.linalg.solve(J, rhs)
    xp = sol[:n]
    yp = sol[n:n + m]
    ybp = sol[n + m:]
    # clip primal into bounds (tiny active-set errors) and re-evaluate
    xp = jnp.clip(xp, qp.xl, qp.xu)
    zp = qp.A @ xp if m else jnp.zeros(0, dt)
    zp = jnp.clip(zp, qp.al, qp.au)
    rp_p, rd_p, _, _ = _residuals(qp, xp, zp, xp, yp, ybp)
    ok = (jnp.all(jnp.isfinite(xp)) & jnp.all(jnp.isfinite(yp))
          & jnp.all(jnp.isfinite(ybp))
          & (rp_p <= rp) & (rd_p <= rd))
    return (jnp.where(ok, xp, x), jnp.where(ok, yp, y),
            jnp.where(ok, ybp, yb),
            jnp.where(ok, rp_p, rp), jnp.where(ok, rd_p, rd))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _solve_vjp(settings: ADMMSettings, qp: QPData, x0, y0, yb0) -> QPSolution:
    return _box_admm_raw(qp, x0, y0, yb0, settings)


def _solve_vjp_fwd(settings, qp, x0, y0, yb0):
    sol = _box_admm_raw(qp, x0, y0, yb0, settings)
    return sol, (qp, sol)


@full_precision
def _solve_vjp_bwd(settings, res, cot: QPSolution):
    """Implicit differentiation of the QP solution map (OptNet-style).

    At the solution, with the active set A fixed, (x*, y*, y_box*) solve
        F1 = H x + h + A' y + y_box            = 0
        F2_i = act_i (A_i x - b_i) + (1-act_i) y_i      = 0
        F3_i = actb_i (x_i - bb_i) + (1-actb_i) ybox_i  = 0
    VJP: v = J^{-T} [x_bar; y_bar; ybox_bar];  theta_bar = -v' dF/dtheta.
    """
    qp, sol = res
    n, m = infer_dims(qp)
    dt = qp.H.dtype
    x, y, yb = sol.x, sol.y, sol.y_box
    tol = 10.0 * settings.eps_abs + 1e-8

    Ax = qp.A @ x if m else jnp.zeros(0, dt)
    act_lo = (Ax - qp.al <= tol) if m else jnp.zeros(0, bool)
    act_up = (qp.au - Ax <= tol) if m else jnp.zeros(0, bool)
    act = act_lo | act_up
    actb_lo = (x - qp.xl) <= tol
    actb_up = (qp.xu - x) <= tol
    actb = actb_lo | actb_up

    af = act.astype(dt)
    abf = actb.astype(dt)
    Im = jnp.eye(m, dtype=dt)
    In = jnp.eye(n, dtype=dt)
    if m:
        J = jnp.block([
            [qp.H, qp.A.T, In],
            [af[:, None] * qp.A, jnp.diag(1.0 - af), jnp.zeros((m, n), dt)],
            [jnp.diag(abf), jnp.zeros((n, m), dt), jnp.diag(1.0 - abf)],
        ])
        rhs = jnp.concatenate([cot.x, cot.y, cot.y_box])
    else:
        J = jnp.block([
            [qp.H, In],
            [jnp.diag(abf), jnp.diag(1.0 - abf)],
        ])
        rhs = jnp.concatenate([cot.x, cot.y_box])
    # regularise: the active-set KKT can be singular at degenerate solutions
    J = J + 1e-10 * jnp.eye(J.shape[0], dtype=dt)
    v = jnp.linalg.solve(J.T, rhs)
    v1 = v[:n]
    v2 = v[n:n + m]
    v3 = v[n + m:]

    H_bar = -jnp.outer(v1, x)
    # symmetrise: H enters the QP only through its symmetric part
    H_bar = 0.5 * (H_bar + H_bar.T)
    h_bar = -v1
    def _bound_weights(lo, up):
        # split the bound cotangent between lower/upper; equality rows
        # (both active) get half each to avoid double counting
        lo_f, up_f = lo.astype(dt), up.astype(dt)
        denom = jnp.maximum(lo_f + up_f, 1.0)
        return lo_f / denom, up_f / denom

    if m:
        # A_ij enters F1_j with weight y_i and F2_i with weight act_i * x_j
        A_bar = -jnp.outer(y, v1) - jnp.outer(af * v2, x)
        w_lo, w_up = _bound_weights(act_lo, act_up)
        al_bar = v2 * w_lo
        au_bar = v2 * w_up
    else:
        A_bar = jnp.zeros((0, n), dt)
        al_bar = jnp.zeros(0, dt)
        au_bar = jnp.zeros(0, dt)
    wb_lo, wb_up = _bound_weights(actb_lo, actb_up)
    xl_bar = v3 * wb_lo
    xu_bar = v3 * wb_up

    qp_bar = QPData(H=H_bar, h=h_bar, A=A_bar, al=al_bar, au=au_bar,
                    xl=xl_bar, xu=xu_bar)
    return (qp_bar, jnp.zeros_like(sol.x), jnp.zeros_like(sol.y),
            jnp.zeros_like(sol.y_box))


_solve_vjp.defvjp(_solve_vjp_fwd, _solve_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("settings",))
def admm_solve(qp: QPData, x0=None, y0=None,
               settings: ADMMSettings = ADMMSettings()) -> QPSolution:
    """Standard OSQP splitting: box rows stacked into A as [I; A]
    (ref: admm.hpp:32-38 ``construct_A``).  Provided for parity/testing; the
    box-split solver above is the production path."""
    n, m = infer_dims(qp)
    dt = qp.H.dtype
    big = jnp.asarray(jnp.inf, dt)
    A2 = jnp.concatenate([jnp.eye(n, dtype=dt), qp.A], axis=0)
    qp2 = QPData(H=qp.H, h=qp.h, A=A2,
                 al=jnp.concatenate([qp.xl, qp.al]),
                 au=jnp.concatenate([qp.xu, qp.au]),
                 xl=jnp.full(n, -big), xu=jnp.full(n, big))
    y0_2 = None if y0 is None else jnp.concatenate([jnp.zeros(n, dt), y0])
    sol = box_admm_solve(qp2, x0=x0, y0=y0_2, settings=settings)
    return QPSolution(x=sol.x, y=sol.y[n:], y_box=sol.y[:n],
                      status=sol.status, iters=sol.iters,
                      res_prim=sol.res_prim, res_dual=sol.res_dual,
                      rho=sol.rho[n:])
