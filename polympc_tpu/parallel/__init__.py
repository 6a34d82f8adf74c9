from polympc_tpu.parallel.batch import make_batch_solver, batch_mesh, shard_batch

__all__ = ["make_batch_solver", "batch_mesh", "shard_batch"]
