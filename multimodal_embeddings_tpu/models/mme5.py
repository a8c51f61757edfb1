"""mmE5 parity embedder: an Mllama-style multimodal architecture in Flax.

The reference's embedding model is ``intfloat/mmE5-mllama-11b-instruct``
loaded through ``MllamaForConditionalGeneration`` in bf16
(``embedder.py:73-83``) with the contract: forward the prompt
``"<|image|><|begin_of_text|> Represent the given image."`` plus the image,
take ``hidden_states[-1]`` at the last attended token, L2-normalize
(``embedder.py:17-34,117-129``).

This module re-derives that architecture config-first:

* **vision tower** — ViT (patch 14) with a class token, local transformer,
  a tanh-gated global transformer, and concatenated intermediate layers
  projected into the text hidden size (the Mllama multi-modal projector);
* **text tower** — Llama-3 decoder (RMSNorm / RoPE / GQA / SwiGLU) with
  tanh-gated cross-attention blocks interleaved at fixed layer indices,
  attending over the projected vision tokens;
* **pooling** — ``last_token_pool`` (the exact ``embedder.py:17-34`` math).

The full-size config matches the 11B layout (40 text layers, cross-attn at
every 5th, 4096 hidden, GQA 32/8, vision 32+8 layers at width 1280); tests
run a tiny config. Weight porting uses ``weights.load_torch_state_dict``
with shape validation when a checkpoint is available. Tensor-parallel
sharding comes from the logical axis annotations in ``transformer.py``
resolved by ``parallel/sharding.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_embeddings_tpu.models.transformer import (
    EMBED,
    VOCAB,
    Attention,
    CrossAttentionBlock,
    EncoderBlock,
    GatedEncoderBlock,
    LlamaBlock,
    RMSNorm,
    last_token_pool,
)


@dataclasses.dataclass(frozen=True)
class MllamaVisionConfig:
    image_size: int = 560
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    global_layers: int = 8
    heads: int = 16
    mlp_ratio: float = 4.0
    intermediate_layers: Tuple[int, ...] = (3, 7, 15, 23, 30)


@dataclasses.dataclass(frozen=True)
class MllamaTextConfig:
    vocab_size: int = 128256
    hidden: int = 4096
    layers: int = 40
    heads: int = 32
    kv_heads: int = 8
    head_dim: int = 128
    mlp_hidden: int = 14336
    max_len: int = 512
    rope_theta: float = 500000.0
    cross_attn_layers: Tuple[int, ...] = (3, 8, 13, 18, 23, 28, 33, 38)


@dataclasses.dataclass(frozen=True)
class MllamaConfig:
    vision: MllamaVisionConfig = dataclasses.field(default_factory=MllamaVisionConfig)
    text: MllamaTextConfig = dataclasses.field(default_factory=MllamaTextConfig)

    @classmethod
    def tiny(cls) -> "MllamaConfig":
        return cls(
            vision=MllamaVisionConfig(
                image_size=28,
                patch_size=14,
                width=32,
                layers=2,
                global_layers=1,
                heads=2,
                intermediate_layers=(0, 1),
            ),
            text=MllamaTextConfig(
                vocab_size=256,
                hidden=64,
                layers=4,
                heads=4,
                kv_heads=2,
                head_dim=16,
                mlp_hidden=128,
                max_len=32,
                cross_attn_layers=(1, 3),
            ),
        )

    @classmethod
    def mme5_11b(cls) -> "MllamaConfig":
        """The full mmE5-mllama-11b-instruct layout."""
        return cls()


class MllamaVisionEncoder(nn.Module):
    config: MllamaVisionConfig
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: (B, S, S, 3) in [0, 1] → (B, 1+patches, out_dim)."""
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(
            cfg.width,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        cls_tok = self.param(
            "class_embedding", nn.initializers.normal(stddev=0.02), (1, 1, cfg.width)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, cfg.width)), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, 1 + (cfg.image_size // p) ** 2, cfg.width),
        )
        x = x + pos[:, : x.shape[1]]
        x = nn.LayerNorm(dtype=self.dtype, name="pre_ln")(x)

        intermediates = []
        for i in range(cfg.layers):
            # HF Mllama's intermediate_layers_indices select hidden_states[i],
            # which is the INPUT of layer i (hidden_states[0] = embeddings) —
            # capture before the layer runs
            if i in cfg.intermediate_layers:
                intermediates.append(x)
            x = EncoderBlock(
                num_heads=cfg.heads,
                mlp_ratio=cfg.mlp_ratio,
                dtype=self.dtype,
                name=f"local{i}",
            )(x)
        x = nn.LayerNorm(dtype=self.dtype, name="post_ln")(x)
        for i in range(cfg.global_layers):
            x = GatedEncoderBlock(
                num_heads=cfg.heads,
                mlp_ratio=cfg.mlp_ratio,
                dtype=self.dtype,
                name=f"global{i}",
            )(x)

        # Mllama concatenates selected intermediate states with the final
        # output before projection.
        feats = jnp.concatenate(intermediates + [x], axis=-1)
        return nn.Dense(
            self.out_dim,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (EMBED, None)
            ),
            dtype=self.dtype,
            name="multi_modal_projector",
        )(feats)


class MllamaTextModel(nn.Module):
    config: MllamaTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        vision_states: Optional[jnp.ndarray] = None,
    ):
        cfg = self.config
        x = nn.Embed(
            cfg.vocab_size,
            cfg.hidden,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (VOCAB, EMBED)
            ),
            dtype=self.dtype,
            name="tok_embed",
        )(token_ids)
        # additive self-attention mask from padding
        pad_mask = attention_mask[:, None, None, :].astype(bool)
        if vision_states is None:
            # Text-only forward: the cross-attention blocks still exist (the
            # parameter structure must not depend on inputs); they attend to
            # a single zero vision token, and the tanh gates make the
            # contribution vanish at gate==0 exactly as in the no-image path.
            vision_states = jnp.zeros((x.shape[0], 1, cfg.hidden), x.dtype)
        for i in range(cfg.layers):
            if i in cfg.cross_attn_layers:
                x = CrossAttentionBlock(
                    num_heads=cfg.heads,
                    num_kv_heads=cfg.kv_heads,
                    head_dim=cfg.head_dim,
                    mlp_hidden=cfg.mlp_hidden,
                    dtype=self.dtype,
                    name=f"cross{i}",
                )(x, vision_states)
            else:
                x = LlamaBlock(
                    num_heads=cfg.heads,
                    num_kv_heads=cfg.kv_heads,
                    head_dim=cfg.head_dim,
                    mlp_hidden=cfg.mlp_hidden,
                    max_len=cfg.max_len,
                    rope_theta=cfg.rope_theta,
                    dtype=self.dtype,
                    name=f"layer{i}",
                )(x, mask=pad_mask)
        return RMSNorm(dtype=self.dtype, name="final_norm")(x)


class MmE5Embedder(nn.Module):
    """End-to-end multimodal embedder with the mmE5 pooling contract."""

    config: MllamaConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.vision_model = MllamaVisionEncoder(
            self.config.vision, self.config.text.hidden, self.dtype
        )
        self.text_model = MllamaTextModel(self.config.text, self.dtype)

    def __call__(
        self,
        token_ids: jnp.ndarray,  # (B, L)
        attention_mask: jnp.ndarray,  # (B, L)
        images: Optional[jnp.ndarray] = None,  # (B, S, S, 3) or None for text-only
    ) -> jnp.ndarray:
        vision_states = None
        if images is not None:
            vision_states = self.vision_model(images)
        hidden = self.text_model(token_ids, attention_mask, vision_states)
        return last_token_pool(
            hidden.astype(jnp.float32), attention_mask, normalize=True
        )
