"""Core: device mesh, sharding helpers, dtype policy."""

from multimodal_embeddings_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    DTypePolicy,
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
