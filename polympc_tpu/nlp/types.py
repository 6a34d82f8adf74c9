"""NLP problem definition and SQP settings/solution containers.

TPU-native replacement for the reference's CRTP ``ProblemBase``
(nlproblem.hpp:47-73) and ``SQPBase`` settings/info (sqp_base.hpp:24-61):
the problem is a frozen dataclass of pure callables (cost, equality,
inequality) + static dims; runtime data (bounds, parameters, warm starts)
are pytrees passed to the solver.

Problem form:

    min_x  f(x, p)
    s.t.   c_e(x, p)  = 0                    (ne equality constraints)
           gl <= c_i(x, p) <= gu             (ni general inequality)
           lbx <= x <= ubx                   (box)

``p`` is an arbitrary pytree of parameters (differentiable inputs).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from polympc_tpu.qp.types import ADMMSettings


@dataclasses.dataclass(frozen=True)
class NLP:
    """Static NLP definition (callables are hashable -> jit-friendly)."""
    cost: Callable                      # (x, p) -> scalar
    n: int                              # number of decision variables
    eq: Optional[Callable] = None       # (x, p) -> (ne,)
    ineq: Optional[Callable] = None     # (x, p) -> (ni,)
    ne: int = 0
    ni: int = 0
    gn_hessian: Optional[Callable] = None  # (x, p) -> (n, n) Gauss-Newton H
    # optional structured derivative hooks (used by sqp_solve when present,
    # replacing whole-vector jacfwd/hessian; collocation transcriptions
    # provide block-structured implementations):
    cost_grad: Optional[Callable] = None    # (x, p) -> (n,)
    eq_jac: Optional[Callable] = None       # (x, p) -> (ne, n)
    ineq_jac: Optional[Callable] = None     # (x, p) -> (ni, n)
    lag_hessian: Optional[Callable] = None  # (x, lam, p) -> (n, n), lam (m,)
    # collocation block structure (N, nx, nu, np_) when z = [X; U; P] —
    # enables the sparsity-preserving block-BFGS (hessian="block_bfgs",
    # the reference's continuous_ocp.hpp:2304-2431) and structured KKT paths
    block_structure: Optional[tuple] = None

    def __post_init__(self):
        if (self.eq is None) != (self.ne == 0):
            raise ValueError("eq callable and ne must be consistent")
        if (self.ineq is None) != (self.ni == 0):
            raise ValueError("ineq callable and ni must be consistent")

    @property
    def m(self) -> int:
        return self.ne + self.ni


class NLPBounds(NamedTuple):
    """Runtime bounds pytree."""
    lbx: jnp.ndarray  # (n,)
    ubx: jnp.ndarray  # (n,)
    gl: jnp.ndarray   # (ni,)
    gu: jnp.ndarray   # (ni,)


def unbounded(nlp: NLP, dtype=jnp.float64) -> NLPBounds:
    inf = jnp.inf
    return NLPBounds(
        lbx=jnp.full(nlp.n, -inf, dtype), ubx=jnp.full(nlp.n, inf, dtype),
        gl=jnp.full(nlp.ni, -inf, dtype), gu=jnp.full(nlp.ni, inf, dtype))


@dataclasses.dataclass(frozen=True)
class SQPSettings:
    """SQP settings (static; defaults mirror sqp_base.hpp:24-47)."""
    max_iter: int = 100
    ls_max_iter: int = 10      # line-search trial count (fixed, batched)
    tau: float = 0.5           # backtracking factor
    eta: float = 0.25          # Armijo sufficient-decrease parameter
    eps_prim: float = 1e-3     # primal step-norm termination
    eps_dual: float = 1e-3     # dual step-norm termination
    eps_viol: float = 1e-4     # max constraint violation at termination
    eps_stat: float = 1e-3     # Lagrangian-gradient (stationarity) tolerance
    hessian: str = "bfgs"      # "bfgs" | "sr1" | "block_bfgs" | "exact" | "gauss_newton"
    reg: str = "eigen"  # none|gershgorin|eigen|eigmin|mirror|clip|ridge
    reg_eps: float = 1e-6
    line_search: str = "merit"  # "merit" | "filter"
    merit_mu_safety: float = 1e-2   # mu = ||lam||_inf + safety
    merit_mu_max: float = 1e6       # cap on the l1 penalty weight
    filter_depth: int = 10          # max filter entries (line_search.hpp:30)
    filter_gamma: float = 1e-5      # filter acceptability margins
    filter_beta: float = 0.999
    # per-iteration observability: >0 records (cost, violation, primal_step,
    # dual_step) for the first trace_iters SQP iterations in
    # SQPSolution.trace — the vmap-safe analogue of the reference's
    # iteration_callback hook (sqp_base.hpp:33,685-686)
    trace_iters: int = 0
    qp: ADMMSettings = ADMMSettings(eps_abs=1e-4, eps_rel=1e-5)

    def validate(self) -> bool:
        return (self.max_iter >= 1 and self.ls_max_iter >= 1
                and 0 < self.tau < 1 and 0 < self.eta < 1
                and self.hessian in ("bfgs", "sr1", "block_bfgs", "exact",
                                     "gauss_newton")
                and self.reg in ("none", "gershgorin", "eigen", "eigmin",
                                 "mirror", "clip", "ridge")
                and self.line_search in ("merit", "filter")
                and self.filter_depth >= 1 and self.trace_iters >= 0)


class SQPSolution(NamedTuple):
    """Solution + per-instance diagnostics (vmap-safe)."""
    x: jnp.ndarray         # (n,)
    lam: jnp.ndarray       # (ne+ni,) duals of general constraints
    lam_box: jnp.ndarray   # (n,) duals of box constraints
    status: jnp.ndarray    # int32
    iters: jnp.ndarray     # int32 SQP iterations
    qp_iters: jnp.ndarray  # int32 accumulated inner QP iterations
    cost: jnp.ndarray      # final objective
    primal_step: jnp.ndarray
    dual_step: jnp.ndarray
    violation: jnp.ndarray  # max constraint violation
    # (trace_iters, 4) per-iteration [cost, violation, primal_step,
    # dual_step] record (None when trace_iters == 0); rows past the final
    # iteration hold NaN
    trace: Optional[jnp.ndarray] = None
