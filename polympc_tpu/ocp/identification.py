"""Model parameter identification from trajectory data.

The capability behind the reference's ``CollocateIdCost`` (chebyshev.hpp:426+
collocated identification cost) and the kite-identification example
(examples/kite_identification_test.cpp): estimate dynamics parameters p from
sampled state/control trajectories.

Two stages, both collocation-based:

  * ``equation_error_fit`` — hold the trajectory at the data and solve
      min_p  sum_k || (D @ X_data)_k - f(x_k, u_k, p) ||^2
    i.e. least-squares on the collocation *defect* residuals.  For dynamics
    affine in p (the common physical case: inertias, damping, aero
    coefficients) this is one linear solve; otherwise a few Gauss-Newton
    iterations on the tiny p-only problem.  Convex where the full
    output-error landscape is badly multimodal.

  * ``identify`` — output-error refinement: the soft-defect collocation NLP
      min_{X,p} sum_k w_k ||x_k - x_data(t_k)||^2 + w_dyn ||defects(X, p)||^2
    solved with SQP, warm-started from the equation-error estimate and the
    data trajectory.  The penalty (SoftChebyshev, chebyshev_soft.hpp:15-72)
    treatment is deliberate: with *hard* defects the problem is ill-posed —
    the defect Jacobian of a free-initial-state collocation is nearly rank
    deficient (sigma_min ~ 1e-5 on a pendulum benchmark), so forcing the
    O(mesh-error) residual to exactly zero demands O(1) parameter moves and
    every exact QP step points away from the true parameters.  The penalty
    form is the well-posed maximum-likelihood trade-off between measurement
    error and model error.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis.basis import SegmentedBasis
from polympc_tpu.nlp.sqp import sqp_solve
from polympc_tpu.nlp.types import SQPSettings
from polympc_tpu.ocp.ocp import OCP
from polympc_tpu.ocp.transcription import ocp_bounds, transcribe
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

__all__ = ["IdentificationResult", "equation_error_fit", "identify"]


class IdentificationResult(NamedTuple):
    p: jnp.ndarray          # estimated parameters
    p_init: jnp.ndarray     # equation-error initial estimate
    X: jnp.ndarray          # fitted state trajectory at the nodes (N, nx)
    cost: jnp.ndarray       # final output-error cost
    status: jnp.ndarray     # SQP status of the refinement
    iters: jnp.ndarray


def equation_error_fit(dynamics: Callable, mesh: SegmentedBasis,
                       X_nodes, U_nodes, t0: float, tf: float,
                       p0, d=None, gn_iters: int = 8):
    """Least-squares parameter fit on collocation defect residuals.

    dynamics: (x, u, p, d, t) -> (nx,);  X_nodes (N, nx) / U_nodes (N, nu)
    are the measured trajectory sampled at the mesh's collocation nodes
    (resample measured data with a spline first if needed).  Returns p.
    """
    X = jnp.asarray(X_nodes)
    U = jnp.asarray(U_nodes)
    dt = X.dtype
    p0 = jnp.asarray(p0, dt)
    d = jnp.zeros(0, dt) if d is None else jnp.asarray(d, dt)
    NS = mesh.num_segments
    scale = (tf - t0) / (2.0 * NS)
    Dg = jnp.asarray(mesh.composite_diff_matrix(0.0, 2.0 * NS), dt)
    t = jnp.asarray(mesh.time_nodes(t0, tf), dt)
    dX = (Dg @ X) / scale               # spectral derivative of the data

    def residuals(p):
        f = jax.vmap(lambda xk, uk, tk: dynamics(xk, uk, p, d, tk))(X, U, t)
        return (dX - f).reshape(-1)

    Jfun = jax.jacfwd(residuals)

    # Gauss-Newton on the tiny p-problem; exact in one step when f is
    # affine in p
    def gn_step(p, _):
        r = residuals(p)
        J = Jfun(p)
        JtJ = J.T @ J + 1e-12 * jnp.eye(p.shape[0], dtype=dt)
        dp = jnp.linalg.solve(JtJ, -J.T @ r)
        return p + dp, jnp.sqrt(jnp.mean(r * r))

    p, rms = jax.lax.scan(gn_step, p0, None, length=gn_iters)
    return p, rms[-1]


def identify(dynamics: Callable, mesh: SegmentedBasis,
             x_data: Callable, u_data: Callable | None,
             t0: float, tf: float, n_params: int,
             nx: int, nu: int = 0, d=None,
             p0=None, pl=None, pu=None, Q=None,
             defect_weight: float = 10.0,
             settings: SQPSettings | None = None,
             dtype=jnp.float64) -> IdentificationResult:
    """Full output-error identification.

    dynamics: (x, u, p, d, t) -> (nx,);  x_data: t -> (nx,) measured state
    (interpolated); u_data: t -> (nu,) applied input, or None if autonomous.
    The equation-error estimate seeds the SQP refinement; defect_weight is
    the soft-dynamics penalty weight (see module docstring).
    """
    Qm = jnp.eye(nx, dtype=dtype) if Q is None else jnp.asarray(Q, dtype)

    def dyn(x, u, p, dd, t):
        uu = u if u_data is None else u_data(t)
        return dynamics(x, uu, p, dd, t)

    def lagrange(x, u, p, dd, t):
        r = x - x_data(t)
        return r @ Qm @ r

    ocp = OCP(dynamics=dyn, nx=nx, nu=nu, np_=n_params,
              nd=0 if d is None else len(np.atleast_1d(d)),
              lagrange=lagrange)
    tr = transcribe(ocp, mesh, soft_defects=defect_weight)
    prm = tr.params(d=d, t0=t0, tf=tf, dtype=dtype)
    t_nodes = jnp.asarray(mesh.time_nodes(t0, tf), dtype)
    X_nodes = jax.vmap(x_data)(t_nodes)
    U_nodes = (jnp.zeros((tr.N, nu), dtype) if u_data is None
               else jax.vmap(u_data)(t_nodes))

    p0 = jnp.zeros(n_params, dtype) if p0 is None else jnp.asarray(p0, dtype)
    p_init, _ = equation_error_fit(dyn, mesh, X_nodes, U_nodes, t0, tf,
                                   p0, d=prm["d"])
    if pl is not None or pu is not None:
        lo = jnp.full(n_params, -jnp.inf, dtype) if pl is None \
            else jnp.asarray(pl, dtype)
        hi = jnp.full(n_params, jnp.inf, dtype) if pu is None \
            else jnp.asarray(pu, dtype)
        p_init = jnp.clip(p_init, lo, hi)

    bounds = ocp_bounds(tr, pl=pl, pu=pu, dtype=dtype)
    z0 = tr.pack(X_nodes, U_nodes, p_init)
    settings = settings or SQPSettings(
        hessian="exact", reg="eigen", reg_eps=1e-8,
        line_search="merit", max_iter=80,
        qp=ADMMSettings(rho=0.1, eps_abs=1e-8, eps_rel=1e-8,
                        max_epochs=60, equil_iters=2))
    sol = sqp_solve(tr.nlp, z0, p=prm, bounds=bounds, settings=settings)
    X, _, P = tr.unpack(sol.x)
    return IdentificationResult(p=P, p_init=p_init, X=X, cost=sol.cost,
                                status=sol.status, iters=sol.iters)
