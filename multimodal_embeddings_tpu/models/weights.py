"""Model parameter initialization and checkpoint loading.

Deterministic random init (fixed PRNG seed) stands in when no checkpoint is
given — every shape/pipeline behavior is exercisable without weights.
Checkpoints load from:

* **orbax / msgpack** native checkpoints saved by this framework,
* **safetensors** flat dicts (keys = '/'.join(flax param path)),
* **torch .pt state dicts** (ultralytics naming) via a name-mapping pass —
  the loader is shape-validated so a mismatched architecture fails loudly
  instead of silently mis-assigning tensors.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util
from flax.core import freeze, unfreeze

from multimodal_embeddings_tpu.io.logging_setup import get_logger

logger = get_logger("weights")


def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def init_on_host(init_fn) -> Dict:
    """Run an init function on the CPU backend when available and return
    host (numpy) arrays. Avoids minute-long parameter initialization through
    the TPU tunnel; the first jitted call uploads the tree in one transfer.
    (Cross-backend ``device_put`` over the tunnel is pathologically slow, so
    values go through numpy instead.)"""
    cpu = _cpu_device()
    if cpu is None:
        return init_fn()
    with jax.default_device(cpu):
        variables = init_fn()
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x,
        variables,
        is_leaf=lambda x: hasattr(x, "dtype"),
    )


def deterministic_init(model, example_input, seed: int = 0, **kwargs) -> Dict:
    """Initialize variables with a fixed seed (reproducible across runs)."""
    rng = jax.random.PRNGKey(seed)
    return init_on_host(lambda: model.init({"params": rng}, example_input, **kwargs))


def flatten_params(variables: Dict) -> Dict[str, np.ndarray]:
    flat = traverse_util.flatten_dict(unfreeze(variables), sep="/")
    return {k: np.asarray(v) for k, v in flat.items()}


def unflatten_params(flat: Dict[str, Any]) -> Dict:
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()}
    )


def save_checkpoint(variables: Dict, path: str) -> None:
    """Save a flat .npz checkpoint (self-contained, no extra deps)."""
    flat = flatten_params(variables)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)
    logger.info("saved %d tensors to %s", len(flat), path)


def load_checkpoint(path: str, target_variables: Dict) -> Dict:
    """Load a checkpoint into the structure of ``target_variables``.

    Accepts .npz (our native format) and .safetensors. Shape-validated:
    every target tensor must be present with an identical shape.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        flat_loaded = load_file(path)
    else:
        with np.load(path) as data:
            flat_loaded = {k: data[k] for k in data.files}

    flat_target = flatten_params(target_variables)
    missing = sorted(set(flat_target) - set(flat_loaded))
    extra = sorted(set(flat_loaded) - set(flat_target))
    if missing:
        raise ValueError(f"checkpoint missing {len(missing)} tensors: {missing[:5]}...")
    if extra:
        logger.warning("checkpoint has %d unused tensors", len(extra))
    out = {}
    for key, target in flat_target.items():
        loaded = flat_loaded[key]
        if tuple(loaded.shape) != tuple(target.shape):
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {loaded.shape} vs "
                f"model {target.shape}"
            )
        out[key] = jnp.asarray(loaded)
    return freeze(unflatten_params(out))


def torch_conv_to_flax(weight: np.ndarray) -> np.ndarray:
    """torch OIHW conv kernel → flax HWIO."""
    return np.transpose(weight, (2, 3, 1, 0))


def adapt_torch_tensor(arr: np.ndarray, target_shape, tkey: str = "?"):
    """Convert a torch tensor layout to the flax target layout.

    * 4-D → conv OIHW → HWIO;
    * 2-D whose shape equals the target → direct (embeddings, already-
      (in,out) matrices are never produced by torch Linear, so a square
      direct match is only taken for non-'.weight'-of-Linear tensors —
      callers route Linears here with ``force_linear=True`` via key
      naming);
    * 2-D torch Linear ``(out, in)`` → transpose then reshape to the
      target (covers Dense ``(in, out)``, DenseGeneral ``(in, H, D)`` and
      output projections ``(H, D, out)``);
    * 1-D bias → reshape to the target.
    """
    target_shape = tuple(target_shape)
    if arr.ndim == 5 and len(target_shape) == 4:
        # Qwen2.5-VL patch embed is a Conv3d (O, I, T, H, W); image inputs
        # repeat the frame across T, so summing the temporal axis gives the
        # mathematically exact 2-D kernel
        arr = arr.sum(axis=2)
    if arr.ndim == 4:
        arr = torch_conv_to_flax(arr)
        if arr.shape != target_shape:
            raise ValueError(f"conv shape mismatch {tkey}: {arr.shape} vs {target_shape}")
        return arr
    if arr.ndim == 2:
        if int(np.prod(arr.shape)) != int(np.prod(target_shape)):
            raise ValueError(f"size mismatch {tkey}: {arr.shape} vs {target_shape}")
        transposed = arr.T
        # torch Linear stores (out, in); flax Dense-style kernels start
        # with the input dim, so the transpose-reshape is correct whenever
        # the target's leading dims consume the torch 'in' axis. Embedding
        # tables are (vocab, dim) on both sides → direct when equal AND the
        # reshape path would scramble rows; disambiguate by exact match
        # first except for square matrices, where Linear semantics win
        # only if the key says 'proj'/'lm_head'/explicit linear.
        if arr.shape == target_shape and not _looks_like_linear(tkey):
            return arr
        return np.ascontiguousarray(transposed).reshape(target_shape)
    if arr.ndim <= 1:
        return arr.reshape(target_shape)
    if arr.shape == target_shape:
        return arr
    raise ValueError(f"unsupported layout {tkey}: {arr.shape} vs {target_shape}")


_LINEAR_HINTS = ("proj", "lm_head", "fc1", "fc2", "merger", "qkv", "gate_proj",
                 "up_proj", "down_proj", ".q.", ".k.", ".v.", ".o.")


def _looks_like_linear(tkey: str) -> bool:
    return any(h in tkey for h in _LINEAR_HINTS)


def load_torch_state_dict(
    path: str,
    target_variables: Dict,
    key_map: Callable[[str], Optional[str]],
) -> Dict:
    """Port a torch checkpoint (e.g. the DocStructBench ``.pt``) into our
    parameter tree.

    ``key_map`` maps each torch key to a flat flax key (or None to skip).
    Layout adaptation (conv OIHW→HWIO, Linear (out,in)→(in,...)-reshape,
    bias reshape) happens in ``adapt_torch_tensor``; every mapped tensor is
    shape-checked against the model.
    """
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if "model" in state and hasattr(state["model"], "state_dict"):
        state = state["model"].state_dict()

    flat_target = flatten_params(target_variables)
    out = dict(flat_target)
    mapped = 0
    for tkey, tval in state.items():
        fkey = key_map(tkey)
        if fkey is None:
            continue
        if fkey not in flat_target:
            raise KeyError(f"mapped key {fkey} (from {tkey}) not in model")
        arr = tval.detach().to(torch.float32).numpy()
        arr = adapt_torch_tensor(arr, flat_target[fkey].shape, tkey)
        out[fkey] = jnp.asarray(arr)
        mapped += 1
    logger.info("ported %d/%d tensors from torch checkpoint", mapped, len(flat_target))
    return freeze(unflatten_params(out))


def save_checkpoint_orbax(variables: Dict, path: str) -> None:
    """Orbax checkpoint (for mesh-sharded trees the flat-npz path can't
    hold — e.g. the TP-sharded 11B embedder: arrays are saved per-shard
    without host gathering)."""
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(os.path.abspath(path), unfreeze_tree(variables), force=True)
    checkpointer.wait_until_finished()
    logger.info("saved orbax checkpoint to %s", path)


def load_checkpoint_orbax(path: str, target_variables: Dict) -> Dict:
    """Restore an orbax checkpoint into the target structure (sharding of
    the target's arrays is reproduced on load)."""
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    restored = checkpointer.restore(
        os.path.abspath(path),
        target=unfreeze_tree(target_variables),
    )
    return restored


def unfreeze_tree(tree):
    from flax.core import unfreeze as _unfreeze

    try:
        return _unfreeze(tree)
    except Exception:
        return tree


def save_checkpoint_safetensors(variables: Dict, path: str) -> None:
    """Save a flat safetensors checkpoint (keys = '/'-joined flax paths)."""
    from safetensors.numpy import save_file

    flat = flatten_params(variables)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file(flat, path)
    logger.info("saved %d tensors to %s", len(flat), path)
