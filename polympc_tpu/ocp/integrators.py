"""ODE integrators: explicit RK4, implicit (stiff) trapezoidal-Newton, and a
pseudospectral collocation ODE solver.

TPU-native replacements for the reference's integration stack:
  - ``ODESolver`` RK4 / CVODES (src/integration/integrator.cpp:68-111) ->
    ``rk4_integrate`` (lax.scan over steps) and ``implicit_integrate``
    (trapezoidal rule with a fixed-iteration Newton corrector — the
    stiff-capable analogue of CVODES for the model sizes this targets);
  - ``PSODESolver`` (src/integration/chebyshev_integrator.hpp:176+), which
    solves the collocated dynamics as an NLP via Ipopt -> ``ps_integrate``,
    a damped-Newton solve of the square collocation system
    D X = scale * f(X) with the initial condition row pinned.

All integrators are jit/vmap/grad-safe pure functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis.basis import SegmentedBasis
from polympc_tpu.utils.precision import full_precision

__all__ = ["rk4_step", "rk4_integrate", "implicit_integrate",
           "radau_integrate", "ps_integrate"]


def rk4_step(f, x, u, t, h):
    """One classical Runge-Kutta-4 step (ref: integrator.cpp:68-91)."""
    k1 = f(x, u, t)
    k2 = f(x + 0.5 * h * k1, u, t + 0.5 * h)
    k3 = f(x + 0.5 * h * k2, u, t + 0.5 * h)
    k4 = f(x + h * k3, u, t + h)
    return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def rk4_integrate(f, x0, t0, tf, num_steps: int, u=None):
    """Integrate x' = f(x, u, t) over [t0, tf] with num_steps RK4 steps.

    u: None, a constant control vector, or a (num_steps, nu) sequence
    (zero-order hold per step).  Returns the (num_steps+1, nx) trajectory.
    """
    h = (tf - t0) / num_steps
    dtype = jnp.asarray(x0).dtype
    if u is None:
        U = jnp.zeros((num_steps, 0), dtype)
        f_ = lambda x, u_, t: f(x, None, t)
    else:
        u = jnp.asarray(u, dtype)
        U = jnp.broadcast_to(u, (num_steps,) + u.shape) if u.ndim == 1 else u
        f_ = f

    def step(x, args):
        k, uk = args
        t = t0 + k * h
        x2 = rk4_step(f_, x, uk, t, h)
        return x2, x2

    _, traj = jax.lax.scan(step, jnp.asarray(x0, dtype),
                           (jnp.arange(num_steps, dtype=dtype), U))
    return jnp.concatenate([jnp.asarray(x0, dtype)[None], traj], axis=0)


@full_precision
def implicit_integrate(f, x0, t0, tf, num_steps: int, u=None,
                       newton_iters: int = 8):
    """Stiff-capable trapezoidal integration with Newton corrector.

    Solves  x_{k+1} = x_k + h/2 (f(x_k) + f(x_{k+1}))  per step with
    ``newton_iters`` exact-Jacobian Newton iterations (jax.jacfwd), warm
    started from an explicit Euler predictor.  The CVODES-analogue for the
    small stiff systems (CSTR) in scope.
    """
    h = (tf - t0) / num_steps
    dtype = jnp.asarray(x0).dtype
    nx = jnp.asarray(x0).shape[0]
    if u is None:
        U = jnp.zeros((num_steps, 0), dtype)
        f_ = lambda x, u_, t: f(x, None, t)
    else:
        u = jnp.asarray(u, dtype)
        U = jnp.broadcast_to(u, (num_steps,) + u.shape) if u.ndim == 1 else u
        f_ = f
    In = jnp.eye(nx, dtype=dtype)

    def step(x, args):
        k, uk = args
        t = t0 + k * h
        fx = f_(x, uk, t)
        x_next = x + h * fx  # explicit predictor

        def newton(xn, _):
            g = xn - x - 0.5 * h * (fx + f_(xn, uk, t + h))
            J = In - 0.5 * h * jax.jacfwd(
                lambda xx: f_(xx, uk, t + h))(xn)
            return xn - jnp.linalg.solve(J, g), None

        x_next, _ = jax.lax.scan(newton, x_next, None, length=newton_iters)
        return x_next, x_next

    _, traj = jax.lax.scan(step, jnp.asarray(x0, dtype),
                           (jnp.arange(num_steps, dtype=dtype), U))
    return jnp.concatenate([jnp.asarray(x0, dtype)[None], traj], axis=0)


@full_precision
def radau_integrate(f, x0, t0, tf, num_steps: int, order: int = 3, u=None,
                    newton_iters: int = 10):
    """Radau IIA collocation integrator: stiffly accurate and L-stable —
    the true stiff-ODE workhorse (the role CVODES' BDF plays in the
    reference's ODESolver, integrator.cpp:93-111), realised as the
    GAUSS_RADAU member of the reference's collocation-scheme enum
    (polynomial_math.hpp:25).

    Per step of size h: stages at the flipped Legendre-Gauss-Radau points
    c_1..c_s (c_s = 1, s = order+1); the degree-s collocation polynomial
    interpolates (t_k, x_k) and the stage values, and the defect
    D_aug @ [x_k; X] = (h/2) f(X) is enforced at the stage rows by a
    fixed-iteration exact-Jacobian Newton solve.  Stiff accuracy means the
    last stage IS the step endpoint, so the damping R(inf) = 0 property is
    inherited exactly.  Order 2s-1.

    Returns the (num_steps+1, nx) trajectory of step endpoints.
    """
    from polympc_tpu.basis.nodes import lgr_nodes, diff_matrix
    stages, _ = lgr_nodes(order, flip=True)      # s = order+1 points, c_s = 1
    s_n = stages.shape[0]
    aug = np.concatenate([[-1.0], stages])       # interpolation grid
    D_aug = diff_matrix(aug)                     # (s+1, s+1)

    h = (tf - t0) / num_steps
    dtype = jnp.asarray(x0).dtype
    nx = jnp.asarray(x0).shape[0]
    D0 = jnp.asarray(D_aug[1:, 0], dtype)        # column hitting x_k
    DS = jnp.asarray(D_aug[1:, 1:], dtype)       # stage-coupling block
    if u is None:
        U = jnp.zeros((num_steps, 0), dtype)
        f_ = lambda x, u_, t: f(x, None, t)
    else:
        u = jnp.asarray(u, dtype)
        U = jnp.broadcast_to(u, (num_steps,) + u.shape) if u.ndim == 1 else u
        f_ = f
    c_t = jnp.asarray((stages + 1.0) * 0.5, dtype)   # stage times in [0, 1]

    def step(x, args):
        k, uk = args
        t = t0 + k * h
        ts = t + c_t * h

        def residual(X):                         # X (s, nx) stage values
            F = jax.vmap(lambda xi, ti: f_(xi, uk, ti))(X, ts)
            return (jnp.outer(D0, x) + DS @ X - 0.5 * h * F).reshape(-1)

        def newton(Xf, _):
            r = residual(Xf.reshape(s_n, nx))
            J = jax.jacfwd(lambda v: residual(v.reshape(s_n, nx)))(Xf)
            return Xf - jnp.linalg.solve(J, r), None

        X0 = jnp.tile(x[None], (s_n, 1)).reshape(-1)
        Xf, _ = jax.lax.scan(newton, X0, None, length=newton_iters)
        x_next = Xf.reshape(s_n, nx)[-1]         # stiffly accurate endpoint
        return x_next, x_next

    _, traj = jax.lax.scan(step, jnp.asarray(x0, dtype),
                           (jnp.arange(num_steps, dtype=dtype), U))
    return jnp.concatenate([jnp.asarray(x0, dtype)[None], traj], axis=0)


@full_precision
def ps_integrate(f, x0, t0, tf, mesh: SegmentedBasis, u=None,
                 newton_iters: int = 20, damping: float = 1.0):
    """Pseudospectral ODE solve: find the trajectory X on the collocation
    grid satisfying  Dg X = scale * f(X)  with X[0] = x0.

    Damped-Newton on the square system (the role of PSODESolver's Ipopt solve
    and the reference's abandoned eig_chebyshev_solver,
    chebyshev_integrator.hpp:17-170).  Returns (X (N, nx), time grid).
    """
    N = mesh.num_nodes
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    nx = x0.shape[0]
    NS = mesh.num_segments
    Dg = jnp.asarray(mesh.composite_diff_matrix(0.0, 2.0 * NS), dtype)
    tau = np.asarray(mesh.time_nodes(0.0, 1.0))
    t = t0 + (tf - t0) * jnp.asarray(tau, dtype)
    scale = (tf - t0) / (2.0 * NS)
    if u is None:
        U = jnp.zeros((N, 0), dtype)
        f_ = lambda x, u_, tk: f(x, None, tk)
    else:
        u = jnp.asarray(u, dtype)
        U = jnp.broadcast_to(u, (N,) + u.shape) if u.ndim == 1 else u
        f_ = f

    def residual(X):
        F = jax.vmap(f_)(X, U, t)
        R = Dg @ X - scale * F
        # replace the first row by the initial condition
        return R.at[0].set(X[0] - x0)

    res_flat = lambda Xf: residual(Xf.reshape(N, nx)).reshape(-1)

    def newton(Xf, _):
        r = res_flat(Xf)
        J = jax.jacfwd(res_flat)(Xf)
        step = jnp.linalg.solve(J, r)
        return Xf - damping * step, jnp.linalg.norm(r)

    X0 = jnp.tile(x0[None], (N, 1)).reshape(-1)
    Xf, rhist = jax.lax.scan(newton, X0, None, length=newton_iters)
    return Xf.reshape(N, nx), t
