"""Multi-chip scale-out: design-parallel solving over a device mesh."""
from .engine import (
    DesignBatch,
    assemble_design_batch,
    batched_solve,
    design_mesh,
    shard_batch,
    sharded_residual_stats,
)

__all__ = [
    "DesignBatch",
    "assemble_design_batch",
    "batched_solve",
    "design_mesh",
    "shard_batch",
    "sharded_residual_stats",
]
