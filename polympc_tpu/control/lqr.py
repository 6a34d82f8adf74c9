"""LQR / CARE / Lyapunov solvers as differentiable JAX routines.

TPU-native replacement for ``src/control/lqr.hpp:10-231``.  The reference
implements Newton-Kleinman CARE with exact quartic line search but ships with
the Newton refinement disabled (lqr.hpp:177-186, noted in SURVEY.md §3.5);
here the full method is implemented and enabled.

Design notes:
  - Lyapunov equations are solved with the Bartels-Stewart-style
    vectorised solve (Kronecker form) for small n, which is dense-matmul
    friendly; the reference uses a RealSchur back-substitution (lqr.hpp:29-53)
    — Schur decompositions are not available inside jit on TPU, and the
    Kronecker solve is exactly what the MXU likes for the n<=32 control
    problems this targets.
  - The stabilising initialisation uses a Lyapunov-based procedure
    (lqr.hpp:144-175): P0 from  (A - B K0)' P + P (A - B K0) = -(Q + K0'R K0)
    with K0 a stabilising gain obtained by a few Kleinman iterations from a
    shifted Lyapunov solve.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from polympc_tpu.utils.precision import full_precision

__all__ = ["lyapunov", "care", "lqr", "pinv"]


def pinv(a, eps: float = 1e-9):
    """SVD pseudo-inverse (ref: lqr.hpp:10-25)."""
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    s_inv = jnp.where(s > eps * jnp.max(s), 1.0 / s, 0.0)
    return (vt.T * s_inv) @ u.T


@full_precision
def lyapunov(A, Q):
    """Solve the continuous Lyapunov equation  A' P + P A + Q = 0  for P.

    Vectorised (Kronecker) linear solve:  (I (x) A' + A' (x) I) vec(P) = -vec(Q)
    (ref: lqr.hpp:29-53 does Schur back-substitution; same equation).
    """
    n = A.shape[0]
    In = jnp.eye(n, dtype=A.dtype)
    K = jnp.kron(In, A.T) + jnp.kron(A.T, In)
    p = jnp.linalg.solve(K, -Q.reshape(-1))
    P = p.reshape(n, n)
    return 0.5 * (P + P.T)


def _care_residual(P, A, B, Q, R_inv):
    return A.T @ P + P @ A - P @ B @ R_inv @ B.T @ P + Q


def _care_exact_step(a, b, c):
    """Exact line search for the Newton-CARE step (ref: lqr.hpp:93-142,
    ``line_search_care``): minimise the quartic

        f(t) = ||R(X + tH)||_F^2 = a (1-t)^2 - 2 b (1-t) t^2 + c t^4

    over t in [1e-5, 2], where a = tr(R^2), b = tr(R V), c = tr(V^2) with
    V = H G H (G = B R^{-1} B') — the closed form follows from
    R(X+tH) = (1-t) R(X) - t^2 H G H when H solves the Newton-Lyapunov
    equation.  The reference finds the cubic f'(t) roots with Eigen's
    PolynomialSolver; on TPU a dense grid + Newton polish of the best
    bracket is branch-free and exact to fp64 roundoff (f has <= 3 critical
    points, so a 129-point grid always brackets the global minimiser).
    """
    f = lambda t: a * (1 - t) ** 2 - 2 * b * (1 - t) * t ** 2 + c * t ** 4
    fp = lambda t: -2 * a * (1 - t) - 2 * b * (2 * t - 3 * t ** 2) \
        + 4 * c * t ** 3
    fpp = lambda t: 2 * a - 4 * b + 12 * b * t + 12 * c * t ** 2
    ts = jnp.linspace(1e-5, 2.0, 129)
    t = ts[jnp.argmin(f(ts))]
    for _ in range(4):   # Newton polish of the bracketed critical point
        step = fp(t) / jnp.where(jnp.abs(fpp(t)) > 1e-300, fpp(t), 1.0)
        t2 = jnp.clip(t - step, 1e-5, 2.0)
        t = jnp.where(f(t2) <= f(t), t2, t)
    # degenerate direction (V ~ 0): the full Newton step is exact
    return jnp.where(c > 1e-300 * jnp.maximum(a, 1.0), t, 1.0)


@full_precision
def care(A, B, Q, R, num_newton: int = 30, shift: float | None = None,
         line_search: bool = False):
    """Continuous algebraic Riccati equation:
        A'P + PA - P B R^{-1} B' P + Q = 0
    by Newton-Kleinman iteration with a stabilising initialisation
    (ref: lqr.hpp:55-186 — Newton loop implemented and *enabled* here,
    fixing what the reference left commented out at lqr.hpp:185).

    Each Newton step solves the Lyapunov equation
        (A - B K_k)' P + P (A - B K_k) = -(Q + K_k' R K_k),
    which converges quadratically and monotonically from a stabilising guess
    (Kleinman 1968).

    line_search=True enables the reference's exact quartic line search
    (lqr.hpp:93-142): each iteration takes X + t H along the Newton
    direction H with t minimising ||R(X + tH)||_F^2 over [1e-5, 2] in
    closed form.  Damped steps (t < 1) rescue iterations whose full
    Kleinman step overshoots on ill-conditioned problems; extended steps
    (t up to 2) accelerate the initial phase far from the solution.
    """
    n = A.shape[0]
    R_inv = jnp.linalg.inv(R)

    # stabilising initialisation via the Bass algorithm (the role of
    # init_newton_care, lqr.hpp:144-175): with beta > max Re(eig(A)) bounded
    # by the Gershgorin row-sum norm, solve
    #     (A + beta I) W + W (A + beta I)' = 2 B B'
    # then K0 = B' W^{-1} renders A - B K0 Hurwitz (for controllable (A,B)).
    if shift is None:
        beta = jnp.max(jnp.sum(jnp.abs(A), axis=1)) + 0.5
    else:
        beta = jnp.asarray(shift, A.dtype)
    In = jnp.eye(n, dtype=A.dtype)
    M = -(A + beta * In)          # stable by construction
    W = lyapunov(M.T, 2.0 * B @ B.T)   # M W + W M' + 2BB' = 0
    # ridge for stabilisable-but-uncontrollable systems
    W = W + 1e-10 * jnp.trace(W) * In
    K0 = jnp.linalg.solve(W.T, B).T     # B' W^{-1}
    Acl0 = A - B @ K0
    P0 = lyapunov(Acl0, Q + K0.T @ R @ K0)

    G = B @ R_inv @ B.T

    def newton_step(P, _):
        K = R_inv @ B.T @ P
        Acl = A - B @ K
        if line_search:
            # Newton direction H: Acl'H + H Acl + R(X) = 0, then the exact
            # quartic step (lqr.hpp:108-127: V = H G H, a/b/c traces)
            RX = _care_residual(P, A, B, Q, R_inv)
            H = lyapunov(Acl, RX)
            V = H @ G @ H
            a = jnp.sum(RX * RX)
            b = jnp.sum(RX * V)
            c = jnp.sum(V * V)
            t = _care_exact_step(a, b, c)
            P_next = P + t * H
        else:
            P_next = lyapunov(Acl, Q + K.T @ R @ K)
        P_next = 0.5 * (P_next + P_next.T)
        return P_next, jnp.linalg.norm(_care_residual(P_next, A, B, Q, R_inv))

    P, residuals = jax.lax.scan(newton_step, P0, None, length=num_newton)
    return P


@full_precision
def lqr(A, B, Q, R, M=None, num_newton: int = 30):
    """Infinite-horizon continuous LQR gain (ref: lqr.hpp:193-229).

    Returns (K, P) with u = -K x minimising  integral x'Qx + u'Ru + 2x'Mu.
    With a cross term M, the equivalent CARE uses
    A_t = A - B R^{-1} M', Q_t = Q - M R^{-1} M'.
    """
    n = A.shape[0]
    R_inv = jnp.linalg.inv(R)
    if M is None:
        M = jnp.zeros((n, B.shape[1]), A.dtype)
    A_t = A - B @ R_inv @ M.T
    Q_t = Q - M @ R_inv @ M.T
    P = care(A_t, B, Q_t, R, num_newton=num_newton)
    K = R_inv @ (B.T @ P + M.T)
    return K, P
