"""Warm-start checkpoint / resume.

The reference has no on-disk persistence; its resume story is purely
in-memory warm starting (SQP keeps ``m_x``/``m_lam`` between solves,
sqp_base.hpp:613-615; the MPC facade exposes x/u/lam guesses,
mpc_wrapper.hpp:190-205).  For a long-running / fault-tolerant deployment
that is not enough: a controller restart should resume from the last warm
start rather than re-converging cold.  This module serialises solver warm
state (any pytree of arrays) to a single ``.npz`` on the host — cheap
enough to write every control step — and restores it with dtype/shape
checks.  Multi-host meshes should layer ``orbax.checkpoint`` on top for
sharded state; warm starts here are per-instance and tiny.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["save_pytree", "load_pytree"]

_SEP = "__/__"


def _normalize(path: str) -> str:
    """np.savez appends '.npz' when missing; normalise so save/load agree
    (save_state('warm') -> load_state('warm') must find the same file)."""
    return path if str(path).endswith(".npz") else str(path) + ".npz"


def save_pytree(path: str, tree) -> None:
    """Serialise a pytree of arrays/scalars to ``path`` (.npz)."""
    flat, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8)
    np.savez(_normalize(path), **arrays)


def load_pytree(path: str, like):
    """Restore a pytree saved by ``save_pytree``.

    ``like`` supplies the structure (and target dtypes); leaf count, shapes
    and the stored tree structure must match what was saved.
    """
    path = _normalize(path)
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten(like)
    if "__treedef__" in data:
        saved_repr = bytes(data["__treedef__"]).decode()
        if saved_repr != repr(treedef):
            raise ValueError(
                f"checkpoint {path} tree structure does not match 'like':\n"
                f"  saved: {saved_repr}\n  like:  {treedef!r}")
    n = len(flat)
    loaded = []
    for i in range(n):
        key = f"leaf_{i}"
        if key not in data:
            raise ValueError(
                f"checkpoint {path} has {i} leaves, expected {n}")
        arr = data[key]
        ref = flat[i]
        if hasattr(ref, "shape") and tuple(arr.shape) != tuple(ref.shape):
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != {ref.shape}")
        dtype = ref.dtype if hasattr(ref, "dtype") else None
        loaded.append(jnp.asarray(arr, dtype))
    return jax.tree_util.tree_unflatten(treedef, loaded)
