"""Pallas TPU kernels: structured/batched KKT factorization and the fused
ADMM epoch (the TPU replacement for the reference's Eigen SimplicialLDLT
calls, box_admm.hpp:336-349)."""
from polympc_tpu.ops.ldlt import ldlt_factor, ldlt_solve, ldlt_factor_solve
from polympc_tpu.ops.admm_epoch import admm_epoch_batched

__all__ = ["ldlt_factor", "ldlt_solve", "ldlt_factor_solve",
           "admm_epoch_batched"]
