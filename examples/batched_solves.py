"""Batched MPC solving + data-parallel sharding — the TPU-native capability
the single-thread reference never had (SURVEY.md §2.3).

Solves B independent robot-MPC instances per jitted call with ``vmap``,
then shards the batch axis over every available device with a
``jax.sharding.Mesh`` (on CPU, run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 to fake 8 devices).

Run:  python examples/batched_solves.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# fp64 examples run on CPU by default (TPU fp64 linear algebra is
# unsupported); set POLYMPC_EXAMPLES_PLATFORM=tpu to target the chip
jax.config.update("jax_platforms",
                  os.environ.get("POLYMPC_EXAMPLES_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.models import robot_ocp
from polympc_tpu.nlp import SQPSettings
from polympc_tpu.ocp import transcribe, ocp_bounds
from polympc_tpu.parallel import make_batch_solver, batch_mesh
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st, time_fn


def main():
    tr = transcribe(robot_ocp(), SegmentedBasis(Chebyshev(5), 2))
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75])
    settings = SQPSettings(
        hessian="exact", max_iter=60,
        qp=ADMMSettings(eps_abs=1e-5, eps_rel=1e-5, max_epochs=20))

    B = 64
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)))

    # plain vmap batch on one device
    solve = make_batch_solver(tr, bounds, prm, settings)
    sols = solve(x0s)
    n_ok = int(np.sum(np.asarray(sols.status) == st.SOLVED))
    print(f"vmap batch: {n_ok}/{B} converged")

    stats = time_fn(solve, x0s, iters=5, batch=B)
    print(f"throughput: {stats}")

    # shard the batch axis across all devices (data parallel)
    ndev = len(jax.devices())
    if ndev > 1:
        sharded = make_batch_solver(tr, bounds, prm, settings,
                                    mesh=batch_mesh())
        sols = sharded(x0s)
        n_ok = int(np.sum(np.asarray(sols.status) == st.SOLVED))
        print(f"sharded over {ndev} devices: {n_ok}/{B} converged")
    else:
        print("1 device visible — rerun with "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "to see data-parallel sharding")


if __name__ == "__main__":
    main()
