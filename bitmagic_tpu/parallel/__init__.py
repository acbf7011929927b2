from .mesh import BLOCK_AXIS, block_sharding, make_mesh, replicated
from .sharded import (ShardedBitVector, scan_throughput_program,
                      sharded_and_many, sharded_and_sub)
from .plan import (TaskBatch, build_optimize_plan, build_sim_matrix_plan,
                   build_sv_serialization_plan, run_task_batch)

__all__ = [
    "BLOCK_AXIS", "block_sharding", "make_mesh", "replicated",
    "ShardedBitVector", "scan_throughput_program", "sharded_and_many",
    "sharded_and_sub", "TaskBatch", "build_optimize_plan",
    "build_sim_matrix_plan", "build_sv_serialization_plan", "run_task_batch",
]
