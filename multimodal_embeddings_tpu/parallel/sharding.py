"""Sharding rules: logical parameter axes → mesh axes.

The models annotate parameters with logical axis names
(``transformer.py``: embed/heads/kv_heads/head_dim/mlp/vocab). This module
resolves them onto the (data, model) mesh — the Megatron-style layout:

* attention Q/K/V project ``embed → (heads, head_dim)`` with **heads over
  model**; the output projection reduces ``(heads, head_dim) → embed`` (XLA
  inserts the psum over ICI);
* MLP up/gate shard the hidden dim over model, down-projection reduces;
* embeddings shard the vocab axis; everything else replicates.

Batch (data) sharding is applied to inputs, not parameters.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from flax import linen as nn
from flax.core import unfreeze
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_embeddings_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

# logical axis name → mesh axis (None = replicate)
LOGICAL_AXIS_RULES = (
    ("embed", None),
    ("heads", MODEL_AXIS),
    ("kv_heads", MODEL_AXIS),
    ("head_dim", None),
    ("mlp", MODEL_AXIS),
    ("vocab", MODEL_AXIS),
    ("batch", DATA_AXIS),
)


def logical_to_mesh_sharding(variables: Dict, mesh: Mesh) -> Dict:
    """PartitionSpec tree for a variable collection carrying
    ``nn.LogicallyPartitioned`` metadata (from with_logical_partitioning)."""
    logical_specs = nn.get_partition_spec(variables)
    return nn.logical_to_mesh_sharding(logical_specs, mesh, LOGICAL_AXIS_RULES)


def shard_variables(variables: Dict, mesh: Mesh) -> Dict:
    """Place every parameter on the mesh according to its logical axes and
    strip the logical metadata (so downstream code sees plain arrays)."""
    shardings = logical_to_mesh_sharding(variables, mesh)
    plain = nn.unbox(variables)

    def place(x, s):
        return jax.device_put(x, s)

    return jax.tree.map(place, unfreeze(plain), unfreeze(shardings))


def unbox(variables: Dict) -> Dict:
    """Strip logical-partitioning metadata without placing (single-device)."""
    return nn.unbox(variables)


def batch_spec(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
