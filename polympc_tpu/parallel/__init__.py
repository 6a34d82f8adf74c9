from polympc_tpu.parallel.batch import make_batch_solver, batch_mesh, shard_batch
from polympc_tpu.parallel.dist_sqp import (
    DistSQPSettings, dist_transcribe, dist_bounds, dist_sqp_solve,
    fused_to_segments, segments_to_fused,
)
from polympc_tpu.parallel.horizon import (
    horizon_mesh, schur_horizon_solve, schur_horizon_factor,
    schur_horizon_apply,
)
from polympc_tpu.parallel.multihost import (
    initialize_multihost, mesh_2d, make_batch_dist_solver,
    process_local_batch,
)

__all__ = ["make_batch_solver", "batch_mesh", "shard_batch",
           "DistSQPSettings", "dist_transcribe", "dist_bounds",
           "dist_sqp_solve", "fused_to_segments", "segments_to_fused",
           "horizon_mesh", "schur_horizon_solve", "schur_horizon_factor",
           "schur_horizon_apply", "initialize_multihost", "mesh_2d",
           "make_batch_dist_solver", "process_local_batch"]
