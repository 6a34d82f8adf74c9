"""Small solver utilities (ref: src/solvers/utils.hpp:17-39).

``is_psd`` is the reference's eigenvalue positive-semidefiniteness check;
``print_qp`` pretty-prints a QPData for debugging.  ``rbf_kernel`` and its
derivative helpers replace the reference's hand-specialised AD showcase
(src/autodiff/rbf_kernel.hpp:18-95): where the C++ needed four template
specialisations (double/float/adscalar/outer_adscalar) to get value, gradient
and Hessian of the RBF, here they are one jnp function under
``jax.grad`` / ``jax.hessian``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["is_psd", "print_qp", "rbf_kernel", "rbf_grad", "rbf_hessian",
           "block_diag_scatter"]


def block_diag_scatter(blocks):
    """Dense block-diagonal matrix from per-node blocks, by direct scatter.

    ``blocks`` is (N, r, c); the result is (N*r, N*c) with blocks[k] at the
    k-th diagonal block.  This is the collocation NLP's block-diagonal
    assembly (the reference's per-node sparse inserts,
    continuous_ocp.hpp:852-876) done in O(N r c) index writes — the previous
    einsum-with-identity form spent O(N^2 r c) multiply-adds materialising
    the same zeros.
    """
    N, r, c = blocks.shape
    idx = jnp.arange(N)
    out = jnp.zeros((N, r, N, c), blocks.dtype)
    out = out.at[idx, :, idx, :].set(blocks, unique_indices=True,
                                     indices_are_sorted=True)
    return out.reshape(N * r, N * c)


def is_psd(H, tol: float = 0.0) -> bool:
    """Eigenvalue PSD check (utils.hpp:24-33)."""
    w = np.linalg.eigvalsh(np.asarray(H, np.float64))
    return bool(np.all(w >= -abs(tol)))


def print_qp(qp) -> str:
    """Human-readable QP dump (utils.hpp:17-22).  Returns the string and
    prints it."""
    with np.printoptions(precision=4, suppress=True):
        s = (f"QP(n={qp.H.shape[0]}, m={qp.A.shape[0]})\n"
             f"H =\n{np.asarray(qp.H)}\nh = {np.asarray(qp.h)}\n"
             f"A =\n{np.asarray(qp.A)}\n"
             f"al = {np.asarray(qp.al)}\nau = {np.asarray(qp.au)}\n"
             f"xl = {np.asarray(qp.xl)}\nxu = {np.asarray(qp.xu)}")
    print(s)
    return s


def rbf_kernel(x, c, gamma: float = 1.0):
    """Gaussian RBF k(x, c) = exp(-gamma ||x - c||^2)
    (rbf_kernel.hpp:18-95)."""
    d = jnp.asarray(x) - jnp.asarray(c)
    return jnp.exp(-gamma * (d @ d))


def rbf_grad(x, c, gamma: float = 1.0):
    """d k / d x — one jax.grad call replaces the adscalar specialisation."""
    return jax.grad(rbf_kernel)(jnp.asarray(x), jnp.asarray(c), gamma)


def rbf_hessian(x, c, gamma: float = 1.0):
    """d^2 k / d x^2 — replaces the outer_adscalar specialisation."""
    return jax.hessian(rbf_kernel)(jnp.asarray(x), jnp.asarray(c), gamma)
