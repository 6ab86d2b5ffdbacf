"""Tensor parallelism over the mesh's ``model`` axis — the GSPMD way.

The reference has no tensor parallelism (SURVEY.md §2: hg8 ≈ 26M params fits
trivially per chip), and rounds 1–3 reserved the ``model`` mesh axis as API
only.  This module makes the axis real, idiomatically: every ≥2-D leaf of the
train state whose trailing (output-feature) dimension divides the axis size
is annotated ``P(..., 'model')`` — conv kernels ``(kh, kw, cin, cout)`` and
dense kernels ``(cin, cout)`` become Megatron-style column-parallel, and the
optimizer's second-moment/momentum mirrors inherit the same layout purely by
shape.  XLA's sharding propagation then partitions every convolution and
matmul and inserts the collectives itself (channel all-gathers forward,
reduce-scatters in the backward pass, riding ICI) — no hand-written
collectives, no model surgery, and bit-identical math to the replicated run
up to reduction order.

Scalars, PRNG keys, batch-norm scales/means (1-D per-channel vectors) and any
kernel whose feature count does not divide the axis stay replicated; GSPMD
composes mixed layouts without special cases.  Composes with data
parallelism: a ``make_mesh(n, model_parallel=t)`` mesh shards the batch over
``data`` and the features over ``model`` simultaneously.

For this model family TP is a scaling VALVE, not a win — at 26M params the
collectives cost more than the memory they save (measured posture, same as
SURVEY's "do not build it" rationale for v1) — but the axis is now load-
bearing and tested (tests/test_parallel.py::test_tensor_parallel_*), so a
future model that does not fit per-chip is a config change, not a build.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def tp_size(mesh: Mesh) -> int:
    """Size of the ``model`` axis (1 = tensor parallelism off)."""
    return int(mesh.shape.get(MODEL_AXIS, 1))


def leaf_sharding(mesh: Mesh, leaf) -> NamedSharding:
    """TP sharding for one state leaf (concrete array or ShapeDtypeStruct).

    ≥2-D with trailing dim divisible by the axis → shard the trailing
    (output-feature) dim over ``model``; everything else replicated.
    """
    tp = tp_size(mesh)
    shape = getattr(leaf, "shape", ())
    if tp > 1 and len(shape) >= 2 and shape[-1] % tp == 0:
        return NamedSharding(
            mesh, P(*([None] * (len(shape) - 1)), MODEL_AXIS))
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, state):
    """Per-leaf sharding pytree for a TrainState (or its eval_shape)."""
    return jax.tree_util.tree_map(lambda l: leaf_sharding(mesh, l), state)
