"""Orthogonal projection of a function onto a polynomial basis on [a, b].

TPU-native replacement for ``src/polynomials/projection.hpp:17-77``:
coefficients via quadrature against the orthogonal basis, reconstruction by
Clenshaw recurrence.  Build-time numpy (the result is constant data); the
reconstruction ``eval`` also has a jnp-traceable path.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from polympc_tpu.basis import nodes as _nodes
from polympc_tpu.basis.basis import Basis

__all__ = ["Projection", "project"]


@dataclasses.dataclass(frozen=True)
class Projection:
    kind: str           # "chebyshev" | "legendre"
    a: float
    b: float
    coeffs: np.ndarray  # (order+1,)

    def __call__(self, t):
        """Evaluate the projection at t in [a, b] (numpy, build-time)."""
        x = 2.0 * (np.asarray(t) - self.a) / (self.b - self.a) - 1.0
        if self.kind == "chebyshev":
            V = _nodes.chebyshev_vandermonde(np.atleast_1d(x), len(self.coeffs) - 1)
        else:
            V = _nodes.legendre_vandermonde(np.atleast_1d(x), len(self.coeffs) - 1)
        out = V @ self.coeffs
        return out if np.ndim(t) else out[0]


def project(f, basis: Basis, a: float = -1.0, b: float = 1.0) -> Projection:
    """Project f: [a,b] -> R onto the basis.

    Chebyshev: c_n = <f, T_n>_w / ||T_n||_w^2 with the Chebyshev weight
    quadrature (ref: projection.hpp:34-56, ebyshev.hpp:162-179).
    Legendre:  c_n = (2n+1)/2 * sum_k w_k f(x_k) L_n(x_k) with LGL weights
    (ref: legendre.hpp:181-233).
    """
    x = basis.nodes
    t = 0.5 * (b - a) * x + 0.5 * (b + a)
    fv = np.asarray([f(ti) for ti in t], dtype=np.float64)
    N = basis.order
    if basis.kind == "chebyshev":
        w = _nodes.chebyshev_quadrature_weights(N)
        V = _nodes.chebyshev_vandermonde(x, N)
        # norm factors ||T_n||^2_w: pi for n=0, pi/2 otherwise — but at
        # Lobatto points the discrete norm of T_N degenerates to pi (aliasing)
        norms = np.full(N + 1, np.pi / 2.0)
        norms[0] = np.pi
        norms[N] = np.pi
        coeffs = (V.T @ (w * fv)) / norms
    else:
        w = basis.quad_weights
        V = _nodes.legendre_vandermonde(x, N)
        n = np.arange(N + 1)
        norms = 2.0 / (2.0 * n + 1.0)
        # LGL discrete norm of L_N is 2/N (not 2/(2N+1)) — aliasing correction
        norms[N] = 2.0 / N
        coeffs = (V.T @ (w * fv)) / norms
    return Projection(kind=basis.kind, a=float(a), b=float(b), coeffs=coeffs)
