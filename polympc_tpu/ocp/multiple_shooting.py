"""Multiple-shooting transcription: OCP -> NLP.

TPU-native re-design of the reference's ``MSChebyshev`` symbolic transcription
(src/chebyshev_ms.hpp:15-69): one constant control per segment
(_NUM_COLLOC_PTS_U = NumSegments, chebyshev_ms.hpp:58-60), states only at
segment boundaries, per-segment RK4 shooting, and continuity equality
constraints  x_{s+1} - Phi(x_s, u_s) = 0.

Decision vector  z = [X (NS+1, nx); U (NS, nu); P (np_,)].
The shooting map Phi and the per-segment quadrature cost run as one
``lax.scan`` inside each segment and one ``vmap`` across segments.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.nlp.types import NLP, NLPBounds
from polympc_tpu.ocp.ocp import OCP
from polympc_tpu.ocp.integrators import rk4_step

__all__ = ["MSTranscription", "transcribe_ms", "ms_bounds"]


def _split_ms(z, nx, nu, NS, np_):
    X = z[: (NS + 1) * nx].reshape(NS + 1, nx)
    U = z[(NS + 1) * nx: (NS + 1) * nx + NS * nu].reshape(NS, nu)
    P = z[(NS + 1) * nx + NS * nu:]
    return X, U, P


@dataclasses.dataclass(frozen=True)
class MSTranscription:
    ocp: OCP
    num_segments: int
    steps_per_segment: int
    nlp: NLP

    @property
    def n_vars(self) -> int:
        return self.nlp.n

    def split(self, z):
        return _split_ms(z, self.ocp.nx, self.ocp.nu, self.num_segments,
                         self.ocp.np_)

    def pack(self, X, U, P=None):
        parts = [jnp.reshape(X, (-1,)), jnp.reshape(U, (-1,))]
        if P is not None and self.ocp.np_:
            parts.append(jnp.reshape(P, (-1,)))
        return jnp.concatenate(parts)

    def initial_guess(self, x0=None, dtype=jnp.float64):
        NS = self.num_segments
        X = jnp.zeros((NS + 1, self.ocp.nx), dtype) if x0 is None else \
            jnp.tile(jnp.asarray(x0, dtype)[None], (NS + 1, 1))
        U = jnp.zeros((NS, self.ocp.nu), dtype)
        P = jnp.zeros(self.ocp.np_, dtype)
        return self.pack(X, U, P if self.ocp.np_ else None)

    def params(self, p=None, d=None, t0=0.0, tf=1.0, dtype=jnp.float64):
        return {
            "p": jnp.zeros(self.ocp.np_, dtype) if p is None
            else jnp.asarray(p, dtype),
            "d": jnp.zeros(self.ocp.nd, dtype) if d is None
            else jnp.asarray(d, dtype),
            "t0": jnp.asarray(t0, dtype),
            "tf": jnp.asarray(tf, dtype),
        }


def transcribe_ms(ocp: OCP, num_segments: int,
                  steps_per_segment: int = 4) -> MSTranscription:
    NS, K = num_segments, steps_per_segment
    nx, nu, np_, ng = ocp.nx, ocp.nu, ocp.np_, ocp.ng
    n = (NS + 1) * nx + NS * nu + np_
    ne = NS * nx
    ni = (NS + 1) * ng

    def _shoot(x_s, u_s, P, d, t_s, h):
        """RK4 shoot one segment; returns (x_end, integrated lagrange)."""
        def step(carry, k):
            x, acc = carry
            t = t_s + k * h
            if ocp.lagrange is not None:
                # trapezoid on the lagrange term along the shoot
                l0 = ocp.lagrange(x, u_s, P, d, t)
            x2 = rk4_step(lambda xx, uu, tt: ocp.dynamics(xx, uu, P, d, tt),
                          x, u_s, t, h)
            if ocp.lagrange is not None:
                l1 = ocp.lagrange(x2, u_s, P, d, t + h)
                acc = acc + 0.5 * h * (l0 + l1)
            return (x2, acc), None

        (x_end, acc), _ = jax.lax.scan(
            step, (x_s, jnp.zeros((), x_s.dtype)),
            jnp.arange(K, dtype=x_s.dtype))
        return x_end, acc

    def eq_fn(z, prm):
        X, U, P = _split_ms(z, nx, nu, NS, np_)
        d = prm["d"]
        seg_dt = (prm["tf"] - prm["t0"]) / NS
        h = seg_dt / K
        t_starts = prm["t0"] + seg_dt * jnp.arange(NS, dtype=z.dtype)
        x_ends, _ = jax.vmap(lambda xs, us, ts: _shoot(xs, us, P, d, ts, h))(
            X[:-1], U, t_starts)
        return (X[1:] - x_ends).reshape(-1)

    def cost_fn(z, prm):
        X, U, P = _split_ms(z, nx, nu, NS, np_)
        d = prm["d"]
        seg_dt = (prm["tf"] - prm["t0"]) / NS
        h = seg_dt / K
        t_starts = prm["t0"] + seg_dt * jnp.arange(NS, dtype=z.dtype)
        total = jnp.zeros((), z.dtype)
        if ocp.lagrange is not None:
            _, costs = jax.vmap(
                lambda xs, us, ts: _shoot(xs, us, P, d, ts, h))(
                X[:-1], U, t_starts)
            total = total + jnp.sum(costs)
        if ocp.mayer is not None:
            total = total + ocp.mayer(X[-1], P, d)
        return total

    ineq_fn = None
    if ocp.ineq is not None:
        def ineq_fn(z, prm):
            X, U, P = _split_ms(z, nx, nu, NS, np_)
            d = prm["d"]
            seg_dt = (prm["tf"] - prm["t0"]) / NS
            t_nodes = prm["t0"] + seg_dt * jnp.arange(NS + 1, dtype=z.dtype)
            U_ext = jnp.concatenate([U, U[-1:]], axis=0)
            G = jax.vmap(lambda xk, uk, tk: ocp.ineq(xk, uk, P, d, tk))(
                X, U_ext, t_nodes)
            return G.reshape(-1)

    nlp = NLP(cost=cost_fn, n=n, eq=eq_fn, ne=ne, ineq=ineq_fn, ni=ni)
    return MSTranscription(ocp=ocp, num_segments=NS, steps_per_segment=K,
                           nlp=nlp)


def ms_bounds(tr: MSTranscription,
              xl=None, xu=None, ul=None, uu=None, pl=None, pu=None,
              gl=None, gu=None, x0=None, xf=None,
              dtype=jnp.float64) -> NLPBounds:
    """Bound assembly for the multiple-shooting layout."""
    ocp, NS = tr.ocp, tr.num_segments
    inf = np.inf

    def _fill(v, size, default):
        return jnp.full(size, default, dtype) if v is None \
            else jnp.asarray(v, dtype)

    xl = _fill(xl, ocp.nx, -inf)
    xu = _fill(xu, ocp.nx, inf)
    Xl = jnp.tile(xl[None], (NS + 1, 1))
    Xu = jnp.tile(xu[None], (NS + 1, 1))
    if x0 is not None:
        Xl = Xl.at[0].set(jnp.asarray(x0, dtype))
        Xu = Xu.at[0].set(jnp.asarray(x0, dtype))
    if xf is not None:
        Xl = Xl.at[-1].set(jnp.asarray(xf, dtype))
        Xu = Xu.at[-1].set(jnp.asarray(xf, dtype))
    Ul = jnp.tile(_fill(ul, ocp.nu, -inf)[None], (NS, 1))
    Uu = jnp.tile(_fill(uu, ocp.nu, inf)[None], (NS, 1))
    lbx = jnp.concatenate([Xl.reshape(-1), Ul.reshape(-1),
                           _fill(pl, ocp.np_, -inf)])
    ubx = jnp.concatenate([Xu.reshape(-1), Uu.reshape(-1),
                           _fill(pu, ocp.np_, inf)])
    GL = jnp.tile(_fill(gl, ocp.ng, -inf)[None], (NS + 1, 1)).reshape(-1)
    GU = jnp.tile(_fill(gu, ocp.ng, inf)[None], (NS + 1, 1)).reshape(-1)
    return NLPBounds(lbx=lbx, ubx=ubx, gl=GL, gu=GU)
