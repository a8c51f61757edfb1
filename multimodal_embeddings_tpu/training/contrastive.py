"""Contrastive (CLIP/mmE5-style) training for the dual encoder.

The reference performs no training — its embedder is a frozen 11B model —
but a production embedding framework needs a fine-tuning path (mmE5 itself
is contrastively trained). This module provides a symmetric-InfoNCE train
step, built for the (data, model) mesh: the batch shards over ``data``,
parameters shard per the logical rules (tensor parallel over ``model``),
and the global logit matrix / loss reductions are expressed as plain jnp
ops so XLA inserts the all-gathers/psums over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_embeddings_tpu.core.mesh import DATA_AXIS
from multimodal_embeddings_tpu.models.vision_encoder import (
    DualEncoder,
    DualEncoderConfig,
)
from multimodal_embeddings_tpu.models.weights import flatten_params
from multimodal_embeddings_tpu.parallel import sharding as psharding


@dataclasses.dataclass
class TrainerConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 10_000
    b1: float = 0.9
    b2: float = 0.98
    grad_clip: float = 1.0


def make_optimizer(config: TrainerConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=config.learning_rate,
        warmup_steps=config.warmup_steps,
        decay_steps=config.total_steps,
    )
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(
            schedule, b1=config.b1, b2=config.b2, weight_decay=config.weight_decay
        ),
    )


def clip_loss(
    img_emb: jnp.ndarray, txt_emb: jnp.ndarray, scale: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Symmetric InfoNCE over the global batch. Embeddings are already
    L2-normalized, so logits = scale · cosine similarities."""
    logits = scale * jnp.dot(
        img_emb, txt_emb.T, preferred_element_type=jnp.float32
    )
    labels = jnp.arange(logits.shape[0])
    loss_i = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_t = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = (loss_i.mean() + loss_t.mean()) / 2
    accuracy = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss, {"loss": loss, "accuracy": accuracy, "scale": scale.squeeze()}


class ContrastiveTrainer:
    """Owns model, params, optimizer state; provides a jitted, mesh-aware
    ``train_step``."""

    def __init__(
        self,
        model_config: DualEncoderConfig = DualEncoderConfig.base(),
        trainer_config: TrainerConfig = TrainerConfig(),
        mesh: Optional[Mesh] = None,
        seed: int = 0,
        dtype=jnp.float32,
    ):
        self.model = DualEncoder(model_config, dtype=dtype)
        self.model_config = model_config
        self.mesh = mesh
        self.tx = make_optimizer(trainer_config)

        from multimodal_embeddings_tpu.models.weights import init_on_host

        rng = jax.random.PRNGKey(seed)
        s = model_config.vision.image_size
        l = model_config.text.max_len
        variables = init_on_host(
            lambda: self.model.init(
                {"params": rng},
                jnp.zeros((1, s, s, 3), jnp.float32),
                jnp.zeros((1, l), jnp.int32),
                jnp.ones((1, l), jnp.int32),
            )
        )
        if mesh is not None:
            variables = psharding.shard_variables(variables, mesh)
        else:
            variables = psharding.unbox(variables)
        self.params = variables["params"]
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self._train_step = self._build_train_step()

    def _build_train_step(self):
        model, tx = self.model, self.tx

        def loss_fn(params, images, token_ids, attention_mask):
            img_emb, txt_emb, scale = model.apply(
                {"params": params}, images, token_ids, attention_mask
            )
            return clip_loss(img_emb, txt_emb, scale)

        @jax.jit
        def train_step(params, opt_state, images, token_ids, attention_mask):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, token_ids, attention_mask
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return train_step

    def shard_batch(self, array):
        if self.mesh is None:
            return array
        from multimodal_embeddings_tpu.core.mesh import shard_batch as _shard

        return _shard(self.mesh, array)

    def train_step(self, images, token_ids, attention_mask) -> Dict[str, Any]:
        images = self.shard_batch(jnp.asarray(images, jnp.float32))
        token_ids = self.shard_batch(jnp.asarray(token_ids, jnp.int32))
        attention_mask = self.shard_batch(jnp.asarray(attention_mask, jnp.int32))
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, images, token_ids, attention_mask
        )
        self.step += 1
        return {k: float(v) for k, v in metrics.items()}

    def num_params(self) -> int:
        return sum(p.size for p in jax.tree.leaves(self.params))


# ---------------------------------------------------------------------------
# Trainer checkpointing
# ---------------------------------------------------------------------------


def save_trainer_checkpoint(trainer: "ContrastiveTrainer", path: str) -> None:
    """Persist params + optimizer state + step as a flat .npz (leaves keyed
    by pytree order; restore validates leaf count and shapes)."""
    import os

    import numpy as np

    flat = {}
    for prefix, tree in (("p", trainer.params), ("o", trainer.opt_state)):
        for i, leaf in enumerate(jax.tree.leaves(tree)):
            flat[f"{prefix}{i}"] = np.asarray(leaf)
    flat["step"] = np.asarray(trainer.step)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def restore_trainer_checkpoint(trainer: "ContrastiveTrainer", path: str) -> None:
    """Restore params + optimizer state + step in place (shape-validated
    against the trainer's existing pytree structure)."""
    import numpy as np

    with np.load(path, allow_pickle=False) as data:
        flat = {key: data[key] for key in data.files}
    trainer.step = int(flat.pop("step"))

    def rebuild(template, prefix):
        leaves, treedef = jax.tree.flatten(template)
        restored = []
        for i, leaf in enumerate(leaves):
            stored = flat[f"{prefix}{i}"]
            if tuple(stored.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"shape mismatch restoring {prefix}{i}: "
                    f"{stored.shape} vs {np.shape(leaf)}"
                )
            restored.append(jnp.asarray(stored, np.asarray(leaf).dtype))
        return jax.tree.unflatten(treedef, restored)

    trainer.params = rebuild(trainer.params, "p")
    trainer.opt_state = rebuild(trainer.opt_state, "o")
