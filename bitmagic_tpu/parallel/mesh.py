"""Device-mesh utilities for multi-chip / multi-host scaling.

The reference is a single-node library whose only parallelism is a thread
pool (src/bmthreadpool.h) plus user-level block-range partitioning
(rank_range_split, src/bmalgo.h:394; partition-then-merge, samples/xsample04a).
The TPU framework replaces that with first-class mesh sharding (SURVEY.md
§2.7): bit-vectors partition along the *block axis* over a
``jax.sharding.Mesh``; logical ops stay local, reductions ride ICI
collectives (psum), rank/select uses an inter-shard exclusive prefix sum —
the direct analog of the rs_index super-block running counts.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: int | None = None, axis_name: str = BLOCK_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (= blocks) partitioned, words replicated within a row."""
    return NamedSharding(mesh, P(BLOCK_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_rows(n_rows: int, n_shards: int) -> int:
    return -(-n_rows // n_shards) * n_shards
