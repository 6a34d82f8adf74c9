"""polympc_tpu — a TPU-native nonlinear MPC / trajectory-optimization framework.

A from-scratch JAX re-design of the capabilities of PolyMPC
(PREDICT-EPFL/polympc, reference at /root/reference): Chebyshev/Legendre
pseudospectral collocation transcription of optimal-control problems, an SQP
solver with BFGS/Gauss-Newton/exact Hessians, OSQP-style (box)ADMM and
interior-point QP solvers, LQR/CARE Riccati routines, an MPC wrapper with
warm starting and solution interpolation, and batch/multi-chip scaling via
``jax.vmap`` + ``jax.sharding``.

Design rules (see SURVEY.md §7):
  - compile-time template dims (C++) -> static shapes under ``jax.jit``
  - Eigen AutoDiffScalar forward AD   -> ``jax.jacfwd`` / ``jax.hessian``
  - DENSE/SPARSE dual paths           -> one dense-blocks path + Pallas kernels
  - single instance                   -> ``vmap`` over instances, sharded meshes
"""
import importlib

__version__ = "0.1.0"

# Lazy top-level re-exports: submodules are imported on first attribute access
# so each layer is usable independently.
_EXPORTS = {
    "basis": ["Basis", "Chebyshev", "Legendre", "SegmentedBasis",
              "CubicSpline", "fit_cubic_spline", "lagrange_interp",
              "Projection", "project"],
    "qp": ["QPData", "ADMMSettings", "QPSolution", "box_admm_solve",
           "admm_solve", "ruiz_equilibrate", "qp_ip_solve"],
    "nlp": ["NLP", "SQPSettings", "SQPSolution", "sqp_solve"],
    "ocp": ["OCP", "Transcription", "transcribe"],
    "control": ["MPC", "lqr", "care", "lyapunov"],
}
_ATTR_TO_MOD = {a: m for m, attrs in _EXPORTS.items() for a in attrs}
__all__ = ["__version__"] + sorted(_ATTR_TO_MOD) + sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        return importlib.import_module(f"polympc_tpu.{name}")
    mod = _ATTR_TO_MOD.get(name)
    if mod is None:
        raise AttributeError(f"module 'polympc_tpu' has no attribute {name!r}")
    return getattr(importlib.import_module(f"polympc_tpu.{mod}"), name)
