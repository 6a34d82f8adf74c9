"""Splines: equidistant cubic splines and Lagrange interpolation, JAX-traceable.

TPU-native replacement for ``src/polynomials/splines.hpp:50-139``
(``EquidistantCubicSpline``, ``LagrangeSpline``) and the Lagrange
interpolators of ``src/polymath.h:154-286``.  Evaluation functions are pure
``jnp`` (differentiable, vmappable) so splines can sit inside dynamics — e.g.
the race car's track-curvature lookup (``docs/source/img/car_model.cpp:33-39``).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CubicSpline", "fit_cubic_spline", "lagrange_interp"]


@dataclasses.dataclass(frozen=True)
class CubicSpline:
    """Equidistant natural cubic spline y(x) on [x0, x0 + n*h].

    ``coeffs`` is (n_segments, 4) Horner coefficients [a, b, c, d] per segment:
    y = a + b*s + c*s^2 + d*s^3 with s = x - x_left(segment).
    """
    x0: float
    h: float
    coeffs: np.ndarray  # (n_segments, 4) float64
    periodic: bool = False

    @property
    def num_segments(self) -> int:
        return self.coeffs.shape[0]

    def __call__(self, x):
        return cubic_spline_eval(self, x)


# pytree registration: ``coeffs`` is the (only) leaf, (x0, h, periodic) are
# static aux data.  A spline can then cross a jit boundary as an ARGUMENT —
# important on backends where an executable with large baked constants (the
# coefficient table would otherwise be inlined/hoisted into the program)
# pays a per-dispatch penalty (r5 finding, docs/applications.md) — and can
# carry traced coefficients (e.g. a differentiable track model).
jax.tree_util.register_pytree_node(
    CubicSpline,
    lambda sp: ((sp.coeffs,), (sp.x0, sp.h, sp.periodic)),
    lambda aux, ch: CubicSpline(x0=aux[0], h=aux[1], coeffs=ch[0],
                                periodic=aux[2]),
)


def fit_cubic_spline(x0: float, h: float, y: np.ndarray,
                     periodic: bool = False) -> CubicSpline:
    """Fit a natural (or periodic) cubic spline through equidistant samples y.

    Build-time numpy: solves the standard tridiagonal moment system for the
    second derivatives M_i, then converts to per-segment Horner coefficients.
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y) - 1  # segments
    if periodic:
        # periodic: cyclic system for M_0..M_{n-1}, M_n = M_0
        A = np.zeros((n, n))
        rhs = np.zeros(n)
        for i in range(n):
            A[i, (i - 1) % n] = 1.0
            A[i, i] = 4.0
            A[i, (i + 1) % n] = 1.0
            rhs[i] = 6.0 / h**2 * (y[(i + 1) % n + 0] - 2 * y[i] + y[(i - 1) % n])
        # note: y[n] == y[0] assumed for a closed path
        M = np.zeros(n + 1)
        M[:n] = np.linalg.solve(A, rhs)
        M[n] = M[0]
    else:
        M = np.zeros(n + 1)
        if n > 1:
            A = np.diag(np.full(n - 1, 4.0)) + np.diag(np.ones(n - 2), 1) \
                + np.diag(np.ones(n - 2), -1)
            rhs = 6.0 / h**2 * (y[2:] - 2 * y[1:-1] + y[:-2])
            M[1:-1] = np.linalg.solve(A, rhs)
    coeffs = np.zeros((n, 4))
    for i in range(n):
        coeffs[i, 0] = y[i]
        coeffs[i, 1] = (y[i + 1] - y[i]) / h - h * (2 * M[i] + M[i + 1]) / 6.0
        coeffs[i, 2] = M[i] / 2.0
        coeffs[i, 3] = (M[i + 1] - M[i]) / (6.0 * h)
    return CubicSpline(x0=float(x0), h=float(h), coeffs=coeffs,
                       periodic=periodic)


def cubic_spline_eval(spline: CubicSpline, x):
    """JAX-traceable Horner evaluation with clamped/wrapped segment lookup
    (ref: splines.hpp:61-84 — AD-compatible evaluation)."""
    c = jnp.asarray(spline.coeffs)
    n = spline.num_segments
    rel = (x - spline.x0) / spline.h
    if spline.periodic:
        rel = jnp.mod(rel, n)
    idx = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, n - 1)
    s = (rel - idx) * spline.h
    ck = c[idx]
    return ck[..., 0] + s * (ck[..., 1] + s * (ck[..., 2] + s * ck[..., 3]))


def cubic_spline_eval_np(spline: CubicSpline, x: np.ndarray) -> np.ndarray:
    """Pure-numpy spline evaluation for build-time code paths.

    Identical math to :func:`cubic_spline_eval`; exists so construction-time
    sweeps (e.g. integrating a curvature profile into a centerline) never
    touch the JAX runtime — on some backends even a single eager vmapped
    evaluation degrades the process's dispatch floor (r5 finding,
    docs/applications.md)."""
    c = np.asarray(spline.coeffs)
    n = c.shape[0]
    rel = (np.asarray(x) - spline.x0) / spline.h
    if spline.periodic:
        rel = np.mod(rel, n)
    idx = np.clip(np.floor(rel).astype(int), 0, n - 1)
    s = (rel - idx) * spline.h
    ck = c[idx]
    return ck[..., 0] + s * (ck[..., 1] + s * (ck[..., 2] + s * ck[..., 3]))


def lagrange_interp(nodes, bary_w, values, t):
    """Barycentric Lagrange interpolation, JAX-traceable.

    nodes: (N,) interpolation nodes; bary_w: (N,) barycentric weights;
    values: (N, ...) data at nodes; t: scalar query.  Exactness at nodes is
    handled by the standard epsilon-free barycentric trick
    (ref: splines.hpp:101-139, polymath.h:154-286).
    """
    nodes = jnp.asarray(nodes)
    bary_w = jnp.asarray(bary_w)
    values = jnp.asarray(values)
    d = t - nodes
    exact = jnp.abs(d) < 1e-13
    any_exact = jnp.any(exact)
    d_safe = jnp.where(exact, 1.0, d)
    c = bary_w / d_safe
    w = jnp.where(any_exact, exact.astype(values.dtype), c / jnp.sum(c))
    w = w / jnp.where(any_exact, jnp.sum(w), 1.0)
    return jnp.tensordot(w, values, axes=(0, 0))
