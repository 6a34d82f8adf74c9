"""Trust-region Newton and projected-gradient solvers.

TPU-native equivalents of the reference's experimental solvers in
`src/solvers/trust_region_tests/` (trust_region_test.cpp:131-216 — Nocedal
Alg. 6.2 trust-region loop with the Alg. 4.3 Levenberg lambda iteration for
the subproblem; gradproj_test.cpp:37-88 — projected gradient with Armijo
backtracking on box constraints).  The reference versions are test-local
scratch; here they are proper library functions: pure jax, bounded
`lax.while_loop`s, jit/vmap-safe, derivatives via `jax.grad`/`jax.jacfwd`
instead of CasADi symbolics.

Use cases mirror the reference's: small unconstrained/box-constrained
smooth problems where a full SQP stack (nlp/sqp.py) is overkill.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from polympc_tpu.utils import status as st
from polympc_tpu.utils.precision import full_precision

__all__ = ["trust_region_solve", "projected_gradient_solve", "TRSolution"]


class TRSolution(NamedTuple):
    x: jnp.ndarray
    cost: jnp.ndarray
    grad_norm: jnp.ndarray
    status: jnp.ndarray       # utils.status: SOLVED / MAX_ITER_EXCEEDED
    iters: jnp.ndarray


@full_precision
def trust_region_solve(f: Callable, x0, p=None, max_iter: int = 100,
                       eps: float = 1e-6, radius0: float = 0.1,
                       radius_max: float = 1e3, eta: float = 0.0,
                       lambda_iters: int = 3) -> TRSolution:
    """Trust-region Newton for min_x f(x, p) (Nocedal Alg. 6.2).

    The TR subproblem min_p g'p + p'Bp/2, ||p|| <= radius is solved with the
    Levenberg iteration of Alg. 4.3 (trust_region_test.cpp:140-161): a few
    fixed iterations of  lambda += (p'p/q'q) (||p|| - radius)/radius  on the
    shifted system (B + lambda I) p = -g, with Cholesky solves.  Indefinite
    B is handled by growing lambda until the shift is positive definite
    (the reference's `cholesky.info() != Success` branch) — here detected
    through NaNs in the Cholesky factor, which is the jit-safe equivalent.

    Acceptance: rho = ared/pred > eta accepts; radius shrinks 0.5x when
    rho < 0.1, grows 2x (capped) when rho > 0.75 and the step hit the
    boundary (trust_region_test.cpp:183-199).
    """
    fx = lambda x: f(x, p) if p is not None else f(x)
    grad = jax.grad(fx)
    hess = jax.jacfwd(grad)
    dt = x0.dtype
    n = x0.shape[0]
    In = jnp.eye(n, dtype=dt)

    def chol_solve(B, lam, g):
        """Cholesky of B + lam*I and solves for p and q = L^{-1} p.
        Returns (ok, p, q): ok=False when the shift is not PD (NaN factor)."""
        L = jnp.linalg.cholesky(B + lam * In)
        ok = jnp.all(jnp.isfinite(L))
        Ls = jnp.where(ok, L, In)
        p = jax.scipy.linalg.cho_solve((Ls, True), -g)
        q = jax.scipy.linalg.solve_triangular(Ls, p, lower=True)
        return ok, p, q

    def subproblem(B, g, radius):
        """Alg. 4.3: fixed Levenberg iterations; doubles lambda while the
        shifted matrix is indefinite."""
        def body(carry, _):
            lam = carry
            ok, pvec, qvec = chol_solve(B, lam, g)
            pn = jnp.linalg.norm(pvec)
            lam_new = lam + (pvec @ pvec) / jnp.maximum(qvec @ qvec, 1e-30) \
                * (pn - radius) / radius
            # not PD -> double lambda (reference: lambda *= 2; continue)
            lam = jnp.where(ok, jnp.maximum(lam_new, 0.0), 2.0 * lam)
            return lam, None
        lam, _ = jax.lax.scan(body, jnp.asarray(0.1, dt), None,
                              length=lambda_iters)
        ok, pvec, _ = chol_solve(B, lam, g)
        return jnp.where(ok, pvec, -g * jnp.minimum(
            radius / jnp.maximum(jnp.linalg.norm(g), 1e-30), 1.0))

    def body(carry):
        x, radius, it, done = carry
        g = grad(x)
        B = hess(x)
        cost = fx(x)
        pvec = subproblem(B, g, radius)
        pred = -(g @ pvec + 0.5 * pvec @ (B @ pvec))
        cost_step = fx(x + pvec)
        ared = cost - cost_step
        rho = ared / jnp.where(jnp.abs(pred) > 1e-30, pred, 1e-30)
        accept = (rho > eta) & jnp.isfinite(cost_step)
        x2 = jnp.where(accept, x + pvec, x)
        pn = jnp.linalg.norm(pvec)
        radius2 = jnp.where(
            rho < 0.1, 0.5 * radius,
            jnp.where((rho > 0.75) & (pn >= 0.8 * radius),
                      jnp.minimum(2.0 * radius, radius_max), radius))
        conv = jnp.max(jnp.abs(grad(x2)), initial=0.0) < eps
        return (x2, radius2, it + 1, conv)

    def cond(carry):
        _, _, it, done = carry
        return (~done) & (it < max_iter)

    x, _, iters, done = jax.lax.while_loop(
        cond, body, (x0.astype(dt), jnp.asarray(radius0, dt),
                     jnp.zeros((), jnp.int32), jnp.zeros((), bool)))
    g = grad(x)
    return TRSolution(
        x=x, cost=fx(x), grad_norm=jnp.max(jnp.abs(g), initial=0.0),
        status=jnp.where(done, st.SOLVED,
                         st.MAX_ITER_EXCEEDED).astype(jnp.int32),
        iters=iters)


@full_precision
def projected_gradient_solve(f: Callable, x0, lb, ub, p=None,
                             max_iter: int = 100, eps: float = 1e-6,
                             alpha0: float = 0.9, beta: float = 0.3,
                             c: float = 1e-5, ls_trials: int = 20
                             ) -> TRSolution:
    """Projected gradient for min f(x, p) s.t. lb <= x <= ub
    (gradproj_test.cpp:37-88).

    Each iteration projects the scaled gradient step onto the box and
    Armijo-backtracks; the reference's inner `for (i = 1;;)` search becomes
    a fixed-trial batched sweep (all ls_trials candidate alphas evaluated in
    one vmap, first acceptable selected) — the same transformation the SQP
    line search uses (nlp/sqp.py).  Termination: the projected-gradient
    residual ||x - proj(x - g)||_inf <= eps (exact stationarity measure for
    box constraints; the reference loop just runs its 100 iterations).
    """
    fx = lambda x: f(x, p) if p is not None else f(x)
    grad = jax.grad(fx)
    dt = x0.dtype
    lb = jnp.asarray(lb, dt)
    ub = jnp.asarray(ub, dt)
    proj = lambda x: jnp.clip(x, lb, ub)
    alphas = alpha0 * jnp.asarray(beta, dt) ** jnp.arange(ls_trials)

    def body(carry):
        x, it, done = carry
        val = fx(x)
        g = grad(x)

        def trial(a):
            xs = proj(x - a * g)
            return fx(xs), xs
        fs, xs = jax.vmap(trial)(alphas)
        # Armijo on the projected step (reference:
        # f(x_step) <= f(x) - alpha*c*g'(x_step - x), gradproj_test.cpp:68)
        ok = fs <= val - alphas * c * jax.vmap(
            lambda xstep: g @ (xstep - x))(xs)
        ok = ok & jnp.isfinite(fs)
        sel = jnp.argmax(ok)
        x2 = jnp.where(jnp.any(ok), xs[sel], x)
        resid = jnp.max(jnp.abs(x2 - proj(x2 - grad(x2))), initial=0.0)
        return (x2, it + 1, resid <= eps)

    def cond(carry):
        _, it, done = carry
        return (~done) & (it < max_iter)

    x, iters, done = jax.lax.while_loop(
        cond, body, (proj(x0.astype(dt)), jnp.zeros((), jnp.int32),
                     jnp.zeros((), bool)))
    g = grad(x)
    return TRSolution(
        x=x, cost=fx(x),
        grad_norm=jnp.max(jnp.abs(x - proj(x - g)), initial=0.0),
        status=jnp.where(done, st.SOLVED,
                         st.MAX_ITER_EXCEEDED).astype(jnp.int32),
        iters=iters)
