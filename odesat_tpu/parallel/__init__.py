"""Multi-device execution: mesh construction, trajectory-sharded solves
(data parallelism), and clause-sharded RHS evaluation (model parallelism
with psum over ICI). No reference counterpart exists — the reference is
single-threaded (SURVEY.md §2b)."""

from odesat_tpu.parallel.mesh import make_mesh, replicated, traj_sharding
from odesat_tpu.parallel.sharded import (
    make_sharded_chunk_runner,
    shard_state,
    simulate_batch_sharded,
)

__all__ = [
    "make_mesh",
    "make_sharded_chunk_runner",
    "replicated",
    "shard_state",
    "simulate_batch_sharded",
    "traj_sharding",
]
