"""Matmul-precision control for solver-critical linear algebra.

On TPU, JAX's default matmul precision feeds the MXU bfloat16 inputs, which
destroys LU/Cholesky factorisations and defect residuals (observed: 0/8 kite
instances converge at default precision, 8/8 at "highest").  Every solver
entry point is wrapped so its *traced region* uses full-precision matmuls —
users' global config cannot silently break the solvers.  Hot kernels that can
tolerate reduced precision opt out explicitly (Pallas kernels control their
own MXU types).
"""
from __future__ import annotations

import functools

import jax

__all__ = ["full_precision"]


def full_precision(fn):
    """Decorator: trace fn under jax.default_matmul_precision('highest')."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped
