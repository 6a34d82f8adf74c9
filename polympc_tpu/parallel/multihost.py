"""Multi-host bootstrap + 2-D (batch x horizon) mesh composition.

The reference is single-process (SURVEY.md §2.3: no threads, no MPI); the
BASELINE asks for iterations/s efficiency "at 1 chip, 1 host, and N>=2
hosts".  This module supplies the missing pieces:

  * :func:`initialize_multihost` — ``jax.distributed.initialize`` wrapper
    with environment-driven defaults, safe to call unconditionally (no-op
    under a single process / inside tests);
  * :func:`mesh_2d` — a ("dp", "seg") device mesh laying the data-parallel
    axis over the *outer* (DCN / multi-host) dimension and the
    horizon-segment axis over the inner (ICI) dimension, so the
    Schur-interface all_gathers of the horizon partitioning ride ICI while
    the embarrassingly-parallel batch axis crosses hosts;
  * :func:`make_batch_dist_solver` — the composed dp x seg solver: a
    ``vmap`` of the segment-partitioned SQP (parallel/dist_sqp.py) under
    ``jit`` with NamedSharding constraints (B, S, ...) -> P("dp", "seg").
    GSPMD partitions the per-segment elimination over "seg" and the batch
    over "dp" and inserts the collectives — the scaling-book recipe (pick a
    mesh, annotate shardings, let XLA do the rest) instead of hand-written
    per-axis shard_maps;
  * :func:`process_local_batch` — per-process slice helper for building
    globally-sharded batch inputs from host-local data
    (``jax.make_array_from_process_local_data``).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_multihost", "mesh_2d", "make_batch_dist_solver",
           "process_local_batch"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Bootstrap the JAX distributed runtime for an N-host job.

    Reads ``POLYMPC_COORDINATOR`` / ``POLYMPC_NUM_PROCESSES`` /
    ``POLYMPC_PROCESS_ID`` when arguments are omitted (TPU pods populate
    the equivalents automatically, in which case a bare
    ``jax.distributed.initialize()`` suffices and this passes None
    through).  Returns True when a multi-process runtime was initialised,
    False for the single-process no-op path.  Idempotent: a second call
    (or an already-initialised runtime) is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "POLYMPC_COORDINATOR")
    if num_processes is None and "POLYMPC_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["POLYMPC_NUM_PROCESSES"])
    if process_id is None and "POLYMPC_PROCESS_ID" in os.environ:
        process_id = int(os.environ["POLYMPC_PROCESS_ID"])
    if num_processes in (None, 1) and coordinator_address is None:
        return False                      # single process: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True
    except RuntimeError:
        # already initialised (idempotence) — treat as success
        return jax.process_count() > 1


def mesh_2d(dp: int, seg: int, devices=None,
            dp_axis: str = "dp", seg_axis: str = "seg") -> Mesh:
    """A (dp, seg) mesh over ``dp*seg`` devices.

    Device order follows ``jax.devices()``, which enumerates
    process-major: consecutive devices share a host.  Putting "seg" on the
    *fastest-varying* (inner) dimension therefore keeps each segment group
    within a host/ICI domain while "dp" spans hosts over DCN — the layout
    that matches the communication pattern (interface all_gathers on seg,
    nothing on dp).
    """
    devs = list(jax.devices() if devices is None else devices)
    if len(devs) < dp * seg:
        raise ValueError(f"need {dp * seg} devices, have {len(devs)}")
    grid = np.asarray(devs[:dp * seg]).reshape(dp, seg)
    return Mesh(grid, axis_names=(dp_axis, seg_axis))


def process_local_batch(global_shape, mesh: Mesh, spec: P, local_data):
    """Assemble a globally-sharded array from per-process local batch data
    (the N-host input path: every host only materialises its own batch
    shard)."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_data), global_shape)


def make_batch_dist_solver(dtr, base_bounds, settings, mesh: Mesh,
                           d=None, dp_axis: str = "dp",
                           seg_axis: str = "seg"):
    """Composed dp x seg solver: B independent horizon-partitioned SQP
    instances, batch sharded over ``dp_axis``, segments over ``seg_axis``.

    Returns solve(x0s (B, nx), W0s (B, S, kz), P0s (B, np)) -> dict (the
    batched dist_sqp_solve output).  Each instance pins its own initial
    state into the segment-0 head slot of the bounds (the distributed
    analogue of MPC::initial_conditions).

    Implementation: ``jax.vmap`` of the *local* (mesh=None) dist SQP under
    ``jit`` with in/out shardings (B, S, ...) = P(dp, seg) — the GSPMD
    partitioner splits the per-segment linear algebra over "seg" (inserting
    the interface all_gathers the explicit shard_map path does by hand,
    parallel/horizon.py) and replicates nothing across "dp".
    """
    from polympc_tpu.parallel.dist_sqp import dist_sqp_solve

    nx = dtr.ocp.nx

    def solve_one(x0, W0, P0):
        lbw = base_bounds.lbw.at[0, :nx].set(x0)
        ubw = base_bounds.ubw.at[0, :nx].set(x0)
        b = base_bounds._replace(lbw=lbw, ubw=ubw)
        return dist_sqp_solve(dtr, b, W0, P0, d=d, settings=settings,
                              mesh=None)

    vsolve = jax.vmap(solve_one)
    s_x0 = NamedSharding(mesh, P(dp_axis))            # (B, nx)
    s_W = NamedSharding(mesh, P(dp_axis, seg_axis))   # (B, S, kz)
    s_P = NamedSharding(mesh, P(dp_axis))             # (B, np)

    def constrain_out(out):
        # keep the big per-segment outputs laid out dp x seg
        for k in ("W", "lam_loc", "lam_bw"):
            out[k] = jax.lax.with_sharding_constraint(out[k], s_W)
        return out

    jitted = jax.jit(lambda x0s, W0s, P0s: constrain_out(
        vsolve(x0s, W0s, P0s)),
        in_shardings=(s_x0, s_W, s_P))

    def solve(x0s, W0s, P0s):
        return jitted(x0s, W0s, P0s)

    return solve
