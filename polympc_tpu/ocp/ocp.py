"""Optimal-control problem definition.

TPU-native replacement for the reference's CRTP ``ContinuousOCP`` user
interface (continuous_ocp.hpp:41-98 + the POLYMPC_FORWARD_DECLARATION traits
macro): the problem is a frozen dataclass of pure callables + static dims.

    min   integral_{t0}^{tf} L(x,u,p,d,t) dt  +  M(x(tf),p,d)
    s.t.  dx/dt = f(x,u,p,d,t)
          gl <= g(x,u,p,d,t) <= gu       (ng per-node inequality constraints)
          box bounds on x, u, p

``p`` (np_,) are optimised parameters (e.g. a time-scaling factor for
minimum-time problems), ``d`` (nd,) are static data parameters — the same
split as the reference's NP/ND (continuous_ocp.hpp:69-98).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OCP:
    dynamics: Callable               # (x, u, p, d, t) -> (nx,)
    nx: int
    nu: int
    np_: int = 0
    nd: int = 0
    ng: int = 0
    lagrange: Optional[Callable] = None   # (x, u, p, d, t) -> scalar
    mayer: Optional[Callable] = None      # (x, p, d) -> scalar (at t = tf)
    ineq: Optional[Callable] = None       # (x, u, p, d, t) -> (ng,)
    # trajectory-level hooks: receive whole-horizon (X, U, P, d, t, ops)
    # where ops carries the spectral derivative operators — the TPU-native
    # form of GenericOCP's norm_diff/norm_ddiff/diff/ddiff rate-constraint
    # and rate-regularisation machinery (generic_ocp.hpp:88-101)
    trajectory_cost: Optional[Callable] = None   # (...) -> scalar
    trajectory_ineq: Optional[Callable] = None   # (...) -> (ntg,)
    ntg: int = 0

    def __post_init__(self):
        if (self.ineq is None) != (self.ng == 0):
            raise ValueError("ineq callable and ng must be consistent")
        if (self.trajectory_ineq is None) != (self.ntg == 0):
            raise ValueError("trajectory_ineq and ntg must be consistent")
