"""Parallelism: logical-axis sharding rules over the (data, model) mesh."""

from multimodal_embeddings_tpu.parallel.sharding import (
    LOGICAL_AXIS_RULES,
    batch_spec,
    logical_to_mesh_sharding,
    shard_variables,
    unbox,
)
