"""Mesh/sharding utilities: data parallelism over ICI + tensor parallelism
over the ``model`` axis (:mod:`dsnt_pose2d_tpu.parallel.tp`)."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
)
from .tp import leaf_sharding, state_shardings, tp_size

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "leaf_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "state_shardings",
    "tp_size",
]
