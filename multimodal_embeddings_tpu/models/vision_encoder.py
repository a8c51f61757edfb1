"""SigLIP/CLIP-style dual encoder — the pragmatic fast embedding path.

The reference's only embedder is an 11B Mllama forward per region crop
(``embedder.py:104-137``); BASELINE.json's configs name a "SigLIP/CLIP-style
region encoder" as the TPU-native batched alternative. This module provides
a config-scaled ViT image tower and a text tower with mean/last pooling,
projected into a shared L2-normalized embedding space — one jitted forward
embeds an entire region batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_embeddings_tpu.models.transformer import (
    EMBED,
    EncoderBlock,
    FastLayerNorm,
    VOCAB,
    last_token_pool,
)


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    # fused LayerNorm→matmul Pallas prologue in every block (TPU only;
    # kernels/ln_matmul.py — measured decision, see ROADMAP)
    fuse_ln: bool = False


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 32000
    max_len: int = 64
    width: int = 512
    layers: int = 6
    heads: int = 8
    mlp_ratio: float = 4.0


@dataclasses.dataclass(frozen=True)
class DualEncoderConfig:
    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    embed_dim: int = 768

    @classmethod
    def tiny(cls) -> "DualEncoderConfig":
        return cls(
            vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=2),
            text=TextConfig(vocab_size=512, max_len=16, width=64, layers=2, heads=2),
            embed_dim=64,
        )

    @classmethod
    def base(cls) -> "DualEncoderConfig":
        return cls(
            vision=VisionConfig(image_size=448, patch_size=16, width=768, layers=12, heads=12),
            text=TextConfig(vocab_size=32000, max_len=64, width=512, layers=6, heads=8),
            embed_dim=768,
        )


class ViTower(nn.Module):
    config: VisionConfig
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: (B, S, S, 3) float in [0, 1] → (B, embed_dim) L2-normed."""
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(
            cfg.width,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, (cfg.image_size // p) ** 2, cfg.width),
        )
        x = x + pos[:, : x.shape[1]]
        for i in range(cfg.layers):
            x = EncoderBlock(
                num_heads=cfg.heads,
                mlp_ratio=cfg.mlp_ratio,
                dtype=self.dtype,
                fuse_ln=cfg.fuse_ln,
                name=f"block{i}",
            )(x)
        x = FastLayerNorm(dtype=self.dtype, name="final_ln")(x)
        # attention-free MAP-style pooling: mean over patches
        pooled = jnp.mean(x, axis=1)
        out = nn.Dense(
            self.embed_dim,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (EMBED, None)
            ),
            dtype=self.dtype,
            name="proj",
        )(pooled)
        out = out.astype(jnp.float32)
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(1e-12)


class TextTower(nn.Module):
    config: TextConfig
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray, attention_mask: jnp.ndarray):
        """token_ids/attention_mask: (B, L) → (B, embed_dim) L2-normed."""
        cfg = self.config
        emb = nn.Embed(
            cfg.vocab_size,
            cfg.width,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (VOCAB, EMBED)
            ),
            dtype=self.dtype,
            name="tok_embed",
        )(token_ids)
        pos = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02), (1, cfg.max_len, cfg.width)
        )
        x = emb + pos[:, : token_ids.shape[1]]
        mask = attention_mask[:, None, None, :].astype(bool)
        for i in range(cfg.layers):
            x = EncoderBlock(
                num_heads=cfg.heads,
                mlp_ratio=cfg.mlp_ratio,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, mask=mask)
        x = FastLayerNorm(dtype=self.dtype, name="final_ln")(x)
        pooled = last_token_pool(x.astype(jnp.float32), attention_mask, normalize=False)
        out = nn.Dense(
            self.embed_dim,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (EMBED, None)
            ),
            dtype=self.dtype,
            name="proj",
        )(pooled)
        out = out.astype(jnp.float32)
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(1e-12)


class DualEncoder(nn.Module):
    """Shared-space image/text encoder with a learnable logit scale
    (contrastive-training ready)."""

    config: DualEncoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.vision = ViTower(self.config.vision, self.config.embed_dim, self.dtype)
        self.text = TextTower(self.config.text, self.config.embed_dim, self.dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), (1,)
        )

    def encode_image(self, images):
        return self.vision(images)

    def encode_text(self, token_ids, attention_mask):
        return self.text(token_ids, attention_mask)

    def __call__(self, images, token_ids, attention_mask):
        img = self.encode_image(images)
        txt = self.encode_text(token_ids, attention_mask)
        return img, txt, jnp.exp(self.logit_scale)
