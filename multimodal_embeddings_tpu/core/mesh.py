"""Device mesh and sharding helpers.

The reference's notion of distribution is per-GPU model replication with a
host-side merge (``embedder.py:54-83,190-224``). The TPU-native equivalent is
one ``jax.sharding.Mesh`` over the slice with named axes:

* ``data``  — batch dimension (pages / regions / grid views),
* ``model`` — tensor-parallel dimension (attention heads / MLP columns of
  the large embedder).

All collectives (all-gather of per-shard embeddings, psum of similarity
partials) are inserted by XLA from sharding annotations and ride ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_embeddings_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    """Build the global 2-D (data, model) mesh.

    ``shape=(-1, m)`` puts ``n_devices // m`` devices on the data axis. The
    default ``(-1, 1)`` is pure data parallelism — correct for the detector
    and small encoders; pass ``model > 1`` to tensor-shard the 11B embedder.
    """
    devices = list(devices if devices is not None else jax.devices())
    data_size, model_size = config.shape
    if model_size < 1:
        raise ValueError("model axis size must be >= 1")
    if data_size == -1:
        if len(devices) % model_size:
            raise ValueError(
                f"{len(devices)} devices not divisible by model={model_size}"
            )
        data_size = len(devices) // model_size
    mesh_devices = np.asarray(devices[: data_size * model_size]).reshape(
        data_size, model_size
    )
    return Mesh(mesh_devices, (config.data_axis, config.model_axis))


def make_hybrid_mesh(
    config: MeshConfig = MeshConfig(), host_groups: Optional[Sequence] = None
) -> Mesh:
    """Multi-host (data, model) mesh with host-major device order.

    On a pod slice spanning hosts, the batch (data) axis must be laid out
    so its OUTER dimension crosses hosts: within-host shards then ride
    ICI and only cross-host reductions touch DCN (the "How to Scale Your
    Model" hybrid recipe — the reference has no distribution at all,
    ``deprecated_package/embedder.py:190-224``). Tensor-parallel (model)
    stays strictly within a host: its collectives are per-layer and must
    never cross DCN.

    ``host_groups`` (one device list per host) defaults to grouping
    ``jax.devices()`` by ``process_index``; tests pass explicit groups to
    simulate hosts on the virtual CPU mesh.
    """
    if host_groups is None:
        by_host: dict = {}
        for d in jax.devices():
            by_host.setdefault(getattr(d, "process_index", 0), []).append(d)
        host_groups = [by_host[k] for k in sorted(by_host)]
    if len(host_groups) == 1:
        return make_mesh(config, devices=host_groups[0])

    per_host = len(host_groups[0])
    if any(len(g) != per_host for g in host_groups):
        raise ValueError("hosts must contribute equal device counts")
    req_data_size, model_size = config.shape
    if model_size < 1 or per_host % model_size:
        raise ValueError(
            f"model={model_size} must divide the {per_host} devices per "
            "host (tensor parallelism must not cross DCN)"
        )
    # host-major ordering: data axis = (host, local_data) flattened
    ordered = [d for g in host_groups for d in g]
    data_size = len(ordered) // model_size
    if req_data_size not in (-1, data_size):
        # unlike make_mesh, the hybrid layout cannot drop devices without
        # breaking the host-major (host, local_data) factorization — an
        # explicit smaller data size would silently be ignored otherwise
        raise ValueError(
            f"hybrid mesh uses all {len(ordered)} devices: data size must "
            f"be -1 or {data_size}, got {req_data_size}"
        )
    mesh_devices = np.asarray(ordered).reshape(data_size, model_size)
    return Mesh(mesh_devices, (config.data_axis, config.model_axis))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, array):
    """Place a host array with its batch dim sharded over ``data``."""
    return jax.device_put(array, data_sharding(mesh, np.ndim(array)))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """bf16 compute / f32 params+accum policy (MXU-friendly)."""

    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    accum_dtype: str = "float32"

    @property
    def compute(self):
        import jax.numpy as jnp

        return getattr(jnp, self.compute_dtype)

    @property
    def param(self):
        import jax.numpy as jnp

        return getattr(jnp, self.param_dtype)
