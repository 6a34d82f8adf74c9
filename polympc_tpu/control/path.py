"""Path parametrisation & localisation for path-following NMPC.

TPU-native build of the reference's race-car path toolchain
(docs/source/applications.rst:391-512):

  * ``fit_spline_qp`` — fit an equidistant cubic spline to samples as an
    equality-constrained least-squares QP (H = D D', h = -D y, continuity
    equalities; applications.rst:404-481), solved with the boxADMM QP solver.
    This is the workload behind the reference's "Spline fitting 0.02 ms"
    benchmark row (applications.rst:627).
  * ``PathFrame`` / ``track_from_curvature`` — a Cartesian path
    (X_c(s), Y_c(s), psi_c(s), kappa_c(s)) as differentiable splines.
  * ``frame_transform`` — Cartesian (X, Y, psi) -> curvilinear (s, w, theta)
    by solving the 1-D projection NLP  min_s ||p - p_c(s)||^2, 0 <= s <= s_max
    with the dense SQP solver (applications.rst:489-510; the "Frame
    Transform 0.012 ms" benchmark row), then
        w = (Y - Y_c) cos(psi_c) - (X - X_c) sin(psi_c),  theta = psi - psi_c
    (applications.rst:349-358).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis.splines import CubicSpline
from polympc_tpu.nlp.sqp import sqp_solve
from polympc_tpu.nlp.types import NLP, NLPBounds, SQPSettings
from polympc_tpu.qp.box_admm import box_admm_solve
from polympc_tpu.qp.types import ADMMSettings, QPData

__all__ = ["fit_spline_qp", "spline_fit_qp_data", "PathFrame",
           "track_from_curvature", "frame_transform", "project_on_path",
           "project_on_path_newton"]


def spline_fit_qp_data(s: np.ndarray, y: np.ndarray, n_segments: int,
                       dtype=jnp.float64) -> tuple[QPData, float]:
    """Assemble the spline-fitting QP (applications.rst:430-481).

    Decision vector P stacks 4 Horner coefficients per segment
    (n = 4*n_segments).  Objective: 1/2||D'P - y||^2 -> H = D D', h = -D y,
    with D the block-diagonal Vandermonde of local offsets.  Equalities pin
    y(0) to the first sample and enforce value + first-derivative continuity
    at the interior knots (the reference's derivative constraints,
    applications.rst:414-424).  Returns (QPData, segment_length h).
    """
    s = np.asarray(s, np.float64)
    y = np.asarray(y, np.float64)
    smax = s[-1] - s[0]
    h = smax / n_segments
    n = 4 * n_segments

    # sample matrix: row i = [1, ds, ds^2, ds^3] in the sample's segment
    seg = np.clip(((s - s[0]) / h).astype(int), 0, n_segments - 1)
    ds = s - s[0] - seg * h
    Dt = np.zeros((len(s), n))
    for k in range(4):
        Dt[np.arange(len(s)), 4 * seg + k] = ds ** k

    H = Dt.T @ Dt + 1e-9 * np.eye(n)
    hvec = -Dt.T @ y

    # continuity equalities at interior knots + initial value pin
    rows = []
    rhs = []
    r0 = np.zeros(n)
    r0[0] = 1.0
    rows.append(r0)
    rhs.append(y[0])
    for j in range(n_segments - 1):
        val = np.zeros(n)
        val[4 * j: 4 * j + 4] = [1.0, h, h ** 2, h ** 3]
        val[4 * (j + 1)] = -1.0
        rows.append(val)
        rhs.append(0.0)
        der = np.zeros(n)
        der[4 * j: 4 * j + 4] = [0.0, 1.0, 2 * h, 3 * h ** 2]
        der[4 * (j + 1) + 1] = -1.0
        rows.append(der)
        rhs.append(0.0)
    A = np.stack(rows)
    b = np.asarray(rhs)

    inf = np.inf
    qp = QPData(H=jnp.asarray(H, dtype), h=jnp.asarray(hvec, dtype),
                A=jnp.asarray(A, dtype),
                al=jnp.asarray(b, dtype), au=jnp.asarray(b, dtype),
                xl=jnp.full(n, -inf, dtype), xu=jnp.full(n, inf, dtype))
    return qp, h


def fit_spline_qp(s, y, n_segments: int,
                  settings: ADMMSettings | None = None,
                  dtype=jnp.float64) -> CubicSpline:
    """Fit an equidistant cubic spline by solving the constrained LS QP with
    boxADMM (the reference solves the same QP with its ADMM solver,
    applications.rst:483-484)."""
    settings = settings or ADMMSettings(rho=0.1, eps_abs=1e-8, eps_rel=1e-8,
                                        max_epochs=40, equil_iters=4)
    qp, h = spline_fit_qp_data(s, y, n_segments, dtype=dtype)
    sol = box_admm_solve(qp, settings=settings)
    coeffs = np.asarray(sol.x).reshape(n_segments, 4)
    return CubicSpline(x0=float(np.asarray(s)[0]), h=float(h), coeffs=coeffs)


@dataclasses.dataclass(frozen=True)
class PathFrame:
    """A Cartesian track centerline parametrised by arc length s."""
    Xc: CubicSpline
    Yc: CubicSpline
    psi_c: CubicSpline
    kappa: CubicSpline
    s_max: float

    def position(self, s):
        return jnp.stack([self.Xc(s), self.Yc(s)])


# pytree: the four splines are children (their coefficient tables are the
# leaves), s_max is static — a PathFrame can be passed as a jit argument so
# its tables become device-resident buffers instead of baked executable
# constants (see basis/splines.py registration note)
jax.tree_util.register_pytree_node(
    PathFrame,
    lambda pf: ((pf.Xc, pf.Yc, pf.psi_c, pf.kappa), (pf.s_max,)),
    lambda aux, ch: PathFrame(Xc=ch[0], Yc=ch[1], psi_c=ch[2], kappa=ch[3],
                              s_max=aux[0]),
)


def track_from_curvature(kappa: CubicSpline, s_max: float,
                         n_samples: int = 1001,
                         x0=(0.0, 0.0), psi0: float = 0.0) -> PathFrame:
    """Integrate a curvature profile into a Cartesian centerline:
    psi_c' = kappa(s), X_c' = cos(psi_c), Y_c' = sin(psi_c) (build-time
    numpy quadrature; fine grid + trapezoid)."""
    from polympc_tpu.basis.splines import fit_cubic_spline, \
        cubic_spline_eval_np
    s = np.linspace(0.0, s_max, n_samples)
    # build-time sweep in pure numpy: a single eager vmapped jax evaluation
    # here would load an executable that degrades the process's dispatch
    # floor on the remote-tunnel backend (r5, docs/applications.md)
    kap = cubic_spline_eval_np(kappa, s)
    psi = psi0 + np.concatenate([[0.0], np.cumsum(
        0.5 * (kap[1:] + kap[:-1]) * np.diff(s))])
    cx = np.cos(psi)
    sx = np.sin(psi)
    X = x0[0] + np.concatenate([[0.0], np.cumsum(
        0.5 * (cx[1:] + cx[:-1]) * np.diff(s))])
    Y = x0[1] + np.concatenate([[0.0], np.cumsum(
        0.5 * (sx[1:] + sx[:-1]) * np.diff(s))])
    hs = s[1] - s[0]
    return PathFrame(Xc=fit_cubic_spline(0.0, hs, X),
                     Yc=fit_cubic_spline(0.0, hs, Y),
                     psi_c=fit_cubic_spline(0.0, hs, psi),
                     kappa=kappa, s_max=float(s_max))


def _projection_nlp(path: PathFrame) -> NLP:
    def cost(z, p):
        d = path.position(z[0]) - p
        return jnp.sum(d * d)
    return NLP(cost=cost, n=1)


def project_on_path(path: PathFrame, point, s0=None,
                    settings: SQPSettings | None = None,
                    n_grid: int = 64, dtype=jnp.float64):
    """min_s ||p - p_c(s)||^2 s.t. 0 <= s <= s_max via the dense SQP solver
    (the reference's frame-transform NLP, applications.rst:495-505).

    Warm-startable: pass the previous s as s0 (the per-control-step usage);
    otherwise a coarse grid scan seeds the solve.  Returns (s_star, sol).
    """
    point = jnp.asarray(point, dtype)
    if s0 is None:
        grid = jnp.linspace(0.0, path.s_max, n_grid, dtype=dtype)
        d2 = jax.vmap(lambda s: jnp.sum((path.position(s) - point) ** 2))(grid)
        s0 = grid[jnp.argmin(d2)]
    nlp = _projection_nlp(path)
    bounds = NLPBounds(lbx=jnp.asarray([0.0], dtype),
                       ubx=jnp.asarray([path.s_max], dtype),
                       gl=jnp.zeros(0, dtype), gu=jnp.zeros(0, dtype))
    settings = settings or SQPSettings(
        hessian="exact", max_iter=12,
        qp=ADMMSettings(rho=1.0, eps_abs=1e-9, eps_rel=1e-9, max_epochs=8))
    sol = sqp_solve(nlp, jnp.asarray([s0], dtype).reshape(1), p=point,
                    bounds=bounds, settings=settings)
    return sol.x[0], sol


def project_on_path_newton(path: PathFrame, point, s0=None,
                           n_newton: int = 6, n_grid: int = 128,
                           dtype=jnp.float64):
    """min_s ||p - p_c(s)||^2, 0 <= s <= s_max, as one fused projected-Newton
    scan — the latency-class solver for the reference's frame-transform NLP
    (applications.rst:489-510).

    The projection is a smooth 1-D problem on a cubic-spline path; a coarse
    grid seed (or the caller's previous s) followed by a handful of clipped
    Newton steps lands on the same minimiser the dense SQP finds
    (``project_on_path``, kept as the accuracy oracle in
    tests/test_race_car.py) but compiles to one straight-line XLA program —
    no inner QP, no while_loop — so a B=1 dispatch rides the ~0.07 ms
    host->TPU floor instead of the SQP's sequential kernel chain.  Steps are
    projected onto [0, s_max] (bound-constrained stationarity: at an active
    bound the clipped step is exactly the projected-gradient fixed point).

    jit/vmap-safe; returns the scalar s*.
    """
    point = jnp.asarray(point, dtype)
    f = lambda s: jnp.sum((path.position(s) - point) ** 2)
    df = jax.grad(f)
    ddf = jax.grad(df)
    if s0 is None:
        grid = jnp.linspace(0.0, path.s_max, n_grid, dtype=dtype)
        d2 = jax.vmap(f)(grid)
        s0 = grid[jnp.argmin(d2)]
    s0 = jnp.asarray(s0, dtype).reshape(())
    max_step = 0.1 * path.s_max

    def newton(s, _):
        h = ddf(s)
        # fall back to a gradient step when the local curvature is <= 0
        # (point near the path's centre of curvature)
        step = df(s) / jnp.where(h > 1e-9, h, 1.0)
        s = jnp.clip(s - jnp.clip(step, -max_step, max_step),
                     0.0, path.s_max)
        return s, None

    s, _ = jax.lax.scan(newton, s0, None, length=n_newton)
    return s


def frame_transform(path: PathFrame, X, Y, psi, s0=None, dtype=jnp.float64,
                    method: str = "newton"):
    """Cartesian pose -> curvilinear (s, w, theta) (applications.rst:349-358).

    w > 0 left of the centerline; theta = psi - psi_c wrapped to (-pi, pi].
    ``method="newton"`` (default) uses the fused projected-Newton projection
    (latency class); ``method="sqp"`` routes through the dense SQP solver —
    the two agree to solver tolerance (tests/test_race_car.py).
    """
    if method == "newton":
        s = project_on_path_newton(path, jnp.asarray([X, Y], dtype), s0=s0,
                                   dtype=dtype)
    else:
        s, _ = project_on_path(path, jnp.asarray([X, Y], dtype), s0=s0,
                               dtype=dtype)
    psic = path.psi_c(s)
    w = (Y - path.Yc(s)) * jnp.cos(psic) - (X - path.Xc(s)) * jnp.sin(psic)
    theta = jnp.mod(psi - psic + jnp.pi, 2 * jnp.pi) - jnp.pi
    return s, w, theta
