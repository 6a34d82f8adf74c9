"""Standalone functional collocation operators.

Functional parity with the reference's legacy per-piece collocation classes —
``ode_collocation``/``sparse_ode_collocation`` (src/control/ode_collocation.hpp:21-208,
sparse_ode_collocation.hpp:24-306), ``cost_collocation``
(cost_collocation.hpp) and ``constraints_collocation``
(constraints_collocation.hpp) — for users who want the operators without
building a full NLP via :func:`polympc_tpu.ocp.transcribe`:

  * ``collocate_dynamics``  -> g(X, U) = D X - t_scale f(X, U) and its
    Jacobian structure,
  * ``collocate_cost``      -> quadrature Lagrange + Mayer cost and gradient,
  * ``collocate_constraints`` -> node-stacked inequality values and Jacobian.

All returned callables are pure jnp (jit/vmap/grad-safe); Jacobians use the
same per-node forward-mode strategy as the transcription (one ``vmap`` of
``jacfwd`` over nodes + block assembly, never whole-vector AD).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis.basis import SegmentedBasis

__all__ = ["collocate_dynamics", "collocate_cost", "collocate_constraints"]


class CollocatedDynamics(NamedTuple):
    defects: Callable    # (X (N,nx), U (N,nu), p, d, t0, tf) -> (N, nx)
    jacobian: Callable   # same args -> (N*nx, N*(nx+nu)) dense Jacobian
    N: int


class CollocatedCost(NamedTuple):
    value: Callable      # (X, U, p, d, t0, tf) -> scalar
    gradient: Callable   # same args -> ((N,nx), (N,nu)) gradients


class CollocatedConstraints(NamedTuple):
    value: Callable      # (X, U, p, d, t0, tf) -> (N, ng)
    jacobian: Callable   # same args -> (N*ng, N*(nx+nu))


def _times(mesh, t0, tf, dtype):
    tau = mesh.time_nodes(0.0, 1.0)
    return t0 + (tf - t0) * jnp.asarray(tau, dtype)


def collocate_dynamics(dynamics: Callable, mesh: SegmentedBasis,
                       nx: int, nu: int) -> CollocatedDynamics:
    """g(z) = D X - t_scale f(X, U, p, d, t) per node
    (ode_collocation.hpp:21-208)."""
    N = mesh.num_nodes
    NS = mesh.num_segments
    Dg_unit = mesh.composite_diff_matrix(0.0, 2.0 * NS)

    def defects(X, U, p=None, d=None, t0=0.0, tf=1.0):
        X = jnp.asarray(X)
        t = _times(mesh, t0, tf, X.dtype)
        f = jax.vmap(lambda xk, uk, tk: dynamics(xk, uk, p, d, tk))(X, U, t)
        scale = (tf - t0) / (2.0 * NS)
        return jnp.asarray(Dg_unit, X.dtype) @ X - scale * f

    def jacobian(X, U, p=None, d=None, t0=0.0, tf=1.0):
        X = jnp.asarray(X)
        U = jnp.asarray(U)
        t = _times(mesh, t0, tf, X.dtype)
        scale = (tf - t0) / (2.0 * NS)
        fx, fu = jax.vmap(
            lambda xk, uk, tk: jax.jacfwd(dynamics, argnums=(0, 1))(
                xk, uk, p, d, tk))(X, U, t)
        KD = jnp.asarray(np.kron(Dg_unit, np.eye(nx)), X.dtype)
        eN = jnp.eye(N, dtype=X.dtype)
        Jx = KD - scale * jnp.einsum("kij,kl->kilj", fx, eN).reshape(
            N * nx, N * nx)
        Ju = -scale * jnp.einsum("kij,kl->kilj", fu, eN).reshape(
            N * nx, N * nu)
        return jnp.concatenate([Jx, Ju], axis=1)

    return CollocatedDynamics(defects=defects, jacobian=jacobian, N=N)


def collocate_cost(lagrange: Callable | None, mayer: Callable | None,
                   mesh: SegmentedBasis) -> CollocatedCost:
    """Quadrature cost over the mesh + Mayer at the final node
    (cost_collocation.hpp)."""
    NS = mesh.num_segments
    w_unit = mesh.quadrature_weights(0.0, 2.0 * NS)

    def value(X, U, p=None, d=None, t0=0.0, tf=1.0):
        X = jnp.asarray(X)
        t = _times(mesh, t0, tf, X.dtype)
        total = jnp.zeros((), X.dtype)
        if lagrange is not None:
            L = jax.vmap(lambda xk, uk, tk: lagrange(xk, uk, p, d, tk))(
                X, U, t)
            scale = (tf - t0) / (2.0 * NS)
            total = total + scale * (jnp.asarray(w_unit, X.dtype) @ L)
        if mayer is not None:
            total = total + mayer(X[-1], p, d)
        return total

    def gradient(X, U, p=None, d=None, t0=0.0, tf=1.0):
        return jax.grad(value, argnums=(0, 1))(X, U, p, d, t0, tf)

    return CollocatedCost(value=value, gradient=gradient)


def collocate_constraints(ineq: Callable, ng: int,
                          mesh: SegmentedBasis,
                          nx: int, nu: int) -> CollocatedConstraints:
    """Node-stacked inequality constraints + block Jacobian
    (constraints_collocation.hpp)."""
    N = mesh.num_nodes

    def value(X, U, p=None, d=None, t0=0.0, tf=1.0):
        X = jnp.asarray(X)
        t = _times(mesh, t0, tf, X.dtype)
        return jax.vmap(lambda xk, uk, tk: ineq(xk, uk, p, d, tk))(X, U, t)

    def jacobian(X, U, p=None, d=None, t0=0.0, tf=1.0):
        X = jnp.asarray(X)
        U = jnp.asarray(U)
        t = _times(mesh, t0, tf, X.dtype)
        gx, gu = jax.vmap(
            lambda xk, uk, tk: jax.jacfwd(ineq, argnums=(0, 1))(
                xk, uk, p, d, tk))(X, U, t)
        eN = jnp.eye(N, dtype=X.dtype)
        Gx = jnp.einsum("kij,kl->kilj", gx, eN).reshape(N * ng, N * nx)
        Gu = jnp.einsum("kij,kl->kilj", gu, eN).reshape(N * ng, N * nu)
        return jnp.concatenate([Gx, Gu], axis=1)

    return CollocatedConstraints(value=value, jacobian=jacobian)
