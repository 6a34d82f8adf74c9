"""QP problem/solution containers and ADMM settings.

Problem form (ref: qp_base.hpp:97-254):

    min  1/2 x'Hx + h'x
    s.t. al <= A x <= au          (m general constraints, duals y)
         xl <=  x  <= xu          (n box constraints, duals y_box)

All containers are pytrees of arrays (vmap/jit-compatible); settings are
static Python dataclasses captured at trace time (the analogue of the
reference's template parameters + runtime settings struct).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp


class QPData(NamedTuple):
    """Pytree of QP problem data."""
    H: jnp.ndarray   # (n, n)
    h: jnp.ndarray   # (n,)
    A: jnp.ndarray   # (m, n)
    al: jnp.ndarray  # (m,)
    au: jnp.ndarray  # (m,)
    xl: jnp.ndarray  # (n,)
    xu: jnp.ndarray  # (n,)


class QPSolution(NamedTuple):
    """Pytree of QP solution + per-instance diagnostics."""
    x: jnp.ndarray        # (n,) primal
    y: jnp.ndarray        # (m,) duals of general constraints
    y_box: jnp.ndarray    # (n,) duals of box constraints
    status: jnp.ndarray   # int32 scalar, see utils.status
    iters: jnp.ndarray    # int32 scalar, ADMM iterations executed
    res_prim: jnp.ndarray  # float scalar, final primal residual (inf-norm)
    res_dual: jnp.ndarray  # float scalar, final dual residual (inf-norm)
    rho: jnp.ndarray      # (m,) final per-constraint penalty (for warm starts)


@dataclasses.dataclass(frozen=True)
class ADMMSettings:
    """ADMM solver settings (static; ref: qp_base.hpp:17-53 defaults).

    max_iter is organised as epochs: the KKT system is (re)factorised once
    per epoch and ``check_every`` iterations run between residual checks /
    adaptive-rho updates, so max_iter = max_epochs * check_every.
    """
    rho: float = 0.1
    rho_min: float = 1e-6
    rho_max: float = 1e6
    rho_eq_scale: float = 1e3    # equality rows get rho * this
    sigma: float = 1e-6
    alpha: float = 1.6           # over-relaxation
    eps_abs: float = 1e-4
    eps_rel: float = 1e-5
    max_epochs: int = 16
    check_every: int = 25        # ADMM iterations per epoch
    adaptive_rho: bool = True
    adaptive_rho_threshold: float = 5.0  # refactor only if scale drifts > this
    eps_inf: float = 1e-5        # infeasibility certificate tolerance
    equil_iters: int = 0         # Ruiz equilibration iterations (0 = off)
    polish: bool = True          # active-set polish after ADMM (OSQP §5.5)
    polish_delta: float = 1e-8   # polish KKT regularisation
    # "lu": factor + triangular solves (best on CPU).  "inverse": explicit
    # KKT inverse once per epoch, iterations become batched matvecs.
    # "pallas": solo solves use the LU path, but under vmap (the batched-MPC
    # hot path) each epoch runs as one fused lane-batched Pallas kernel —
    # LDL^T factor + check_every iterations entirely in VMEM
    # (ops/admm_epoch.py) — the TPU-native choice for large batches.
    kkt_solver: str = "lu"       # "lu" | "inverse" | "pallas"
    # Collocation BBT structure (ops/structure.py:bbt_structure, or
    # Transcription.bbt_structure()).  When set with kkt_solver="pallas",
    # the batched epoch runs the bordered-block-tridiagonal kernel
    # (ops/bbt_kernel.py) instead of the dense LDL^T: the TPU-native
    # analogue of the reference's sparse KKT path
    # (continuous_ocp.hpp:341-376 nnz structure + SimplicialLDLT).
    # MUST come from the same Transcription that produced the QP: the
    # dispatch validates dimensions and permutation completeness, but
    # cannot detect a foreign structure with a coincidentally matching
    # layout.
    structure: object = None     # Optional[CollocStructure], hashable

    # constraint classification thresholds (ref: qp_base.hpp:124-222)
    loose_bound: float = 1e10
    eq_tol: float = 1e-4

    @property
    def max_iter(self) -> int:
        return self.max_epochs * self.check_every

    def validate(self) -> bool:
        return (self.rho > 0 and self.sigma > 0 and 0 < self.alpha < 2
                and self.eps_abs >= 0 and self.eps_rel >= 0
                and self.max_epochs >= 1 and self.check_every >= 1)


def infer_dims(qp: QPData):
    n = qp.H.shape[-1]
    m = qp.A.shape[-2]
    return n, m


def default_x0(qp: QPData):
    return jnp.zeros_like(qp.h)


def default_y0(qp: QPData):
    return jnp.zeros_like(qp.al)
