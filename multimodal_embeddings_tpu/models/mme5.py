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
    FastLayerNorm,
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
    # multi-tile path (HF Mllama: large pages are split into up to
    # max_tiles 560px tiles with aspect-ratio-gated tile embeddings)
    max_tiles: int = 4
    # fused LayerNorm→matmul Pallas prologue in the local blocks (TPU
    # only; kernels/ln_matmul.py): False | True | "attn" | "mlp" — the
    # measured win is the fc1 ("mlp") site only (ROADMAP)
    fuse_ln: object = False

    @property
    def patches_per_tile(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_aspect_ratio_ids(self) -> int:
        from multimodal_embeddings_tpu.models.mllama_processor import (
            num_aspect_ratio_ids,
        )

        return num_aspect_ratio_ids(self.max_tiles)


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
    # weight-only quantized serving (models/quantized.py): False |
    # True/"int8" | "int4" | "int8-mixed". int8 stores per-channel scales
    # (~11GB for the 11B layout → fits one v5e chip; bf16 at ~22GB does
    # not); "int4" packs two values per byte with group-128 scales
    # (~5.5GB dense); "int8-mixed" keeps the VISION tower bf16 (it is
    # compute-bound at serving M ≈ 3.3k rows, where dequant-in-matmul
    # only costs) and quantizes the text stack (weight-streaming-bound
    # at M ≈ 32) — ~0.6GB more HBM than pure int8.
    quantize: Any = False

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

    @classmethod
    def mme5_11b_int8(cls) -> "MllamaConfig":
        """The 11B layout with int8 weight storage: the single-chip
        serving config (11GB params + activations fit 16GB HBM)."""
        return cls(quantize=True)

    @classmethod
    def mme5_11b_int8_mixed(cls) -> "MllamaConfig":
        """11B with bf16 VISION + int8 TEXT. The r3 11B trace shows the
        program 85% inside int8_matmul calls, dominated by the vision
        tower's M=3328 matmuls at ~16% MFU — compute-bound shapes where
        int8's in-kernel dequant only subtracts; the text stack's
        skinny-M matmuls keep int8's weight-bandwidth win. ~10.7GB
        params, still single-chip."""
        return cls(quantize="int8-mixed")

    @classmethod
    def mme5_11b_int4(cls) -> "MllamaConfig":
        """The 11B layout with packed int4 weight storage (~5.5GB dense
        params): halves int8's weight footprint AND weight bandwidth —
        the headroom config for batch-parallel single-chip serving."""
        return cls(quantize="int4")

    @classmethod
    def mme5_2b(cls) -> "MllamaConfig":
        """A ~2B single-chip serving config with the FULL Mllama vision
        tower (1280-wide, 32+8 layers — the part that defines the
        embedding contract's compute shape) over a scaled-down Llama text
        stack. ``max_tiles=1`` because the fused pipeline embeds 560px
        region crops (single-tile by construction); bf16 fits v5e HBM
        without TP, and the TP axis annotations still apply for larger
        slices."""
        return cls(
            vision=MllamaVisionConfig(max_tiles=1),
            text=MllamaTextConfig(
                hidden=2048,
                layers=16,
                heads=16,
                kv_heads=8,
                head_dim=128,
                mlp_hidden=8192,
                cross_attn_layers=(3, 8, 13),
            ),
        )


class TilePositionalEmbedding(nn.Module):
    """HF ``MllamaPrecomputedAspectRatioEmbedding``: a per-aspect-ratio,
    per-tile embedding added to every token of the tile, tanh-gated.
    Table stored in the torch layout ``(num_ids, max_tiles*width)`` so the
    checkpoint tensor ports with a direct shape match."""

    max_tiles: int
    width: int
    num_ids: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, aspect_ratio_ids: jnp.ndarray):
        """x: (B, T, L, D); aspect_ratio_ids: (B,)."""
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_ids, self.max_tiles * self.width),
        )
        gate = self.param("gate", nn.initializers.zeros, (1,))
        # jnp.asarray: params may be host numpy arrays (init_on_host) when
        # closed over by an outer jit — numpy can't index by tracer
        emb = jnp.asarray(table)[aspect_ratio_ids].reshape(
            -1, self.max_tiles, 1, self.width
        )
        # short tile stacks (t < max_tiles) use the FIRST t slots — HF
        # packs canvas tiles densely, so slot i is tile i for every
        # aspect ratio
        return x + jnp.tanh(gate) * emb[:, : x.shape[1]].astype(x.dtype)


class GatedPositionalEmbedding(nn.Module):
    """HF ``MllamaPrecomputedPositionEmbedding``: blend of a shared
    per-patch table and a per-aspect-ratio per-tile-per-patch table,
    ``x + (1-tanh(g))·pos + tanh(g)·tile_pos[ar_id]``."""

    max_tiles: int
    width: int
    num_ids: int
    num_patches: int  # includes the class token

    @nn.compact
    def __call__(self, x: jnp.ndarray, aspect_ratio_ids: jnp.ndarray):
        """x: (B, T, L, D) with L == num_patches."""
        pos = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_patches, self.width),
        )
        tile_table = self.param(
            "tile_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_ids, self.max_tiles * self.num_patches * self.width),
        )
        gate = self.param("gate", nn.initializers.zeros, (1,))
        g = jnp.tanh(gate)
        x = x + ((1.0 - g) * pos)[None, None].astype(x.dtype)
        tile_pos = jnp.asarray(tile_table)[aspect_ratio_ids].reshape(
            -1, self.max_tiles, self.num_patches, self.width
        )
        # first-t slots for short stacks (see TilePositionalEmbedding)
        return x + (g * tile_pos[:, : x.shape[1]]).astype(x.dtype)


def _pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m


class MllamaVisionEncoder(nn.Module):
    """Tiled Mllama vision tower (re-derivation of HF's MllamaVisionModel,
    the model behind ``embedder.py:73-83``): per-tile patch embedding →
    gated pre-tile embedding → class token → gated positional embedding →
    local transformer over the flattened tile sequence (padded to a
    multiple of 8, padding/invalid tiles masked) → post LN → gated
    post-tile embedding → gated global transformer → concat[final,
    channel-interleaved intermediates] → projector."""

    config: MllamaVisionConfig
    out_dim: int
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4"

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, T, S, S, 3) normalized tiles
        aspect_ratio_ids: jnp.ndarray,  # (B,) int
        tile_mask: jnp.ndarray,  # (B, T) 1 = real tile
        all_tiles_real: bool = False,  # STATIC: caller guarantees tile_mask==1
    ):
        """→ (vision_states (B, T*(1+P), out_dim), token_mask (B, T*(1+P)))."""
        cfg = self.config
        p = cfg.patch_size
        b, t = images.shape[0], images.shape[1]
        # short stacks run the tower on t tiles only: a single-tile input
        # through a max_tiles=4 model pays 1/4 of the token count (and
        # ~1/16 of the attention-score work) instead of processing three
        # masked-out zero tiles the way HF does — valid-token outputs are
        # identical because padding tiles were hard-masked as keys anyway
        assert t <= cfg.max_tiles, (
            f"tile stack ({t}) exceeds max_tiles ({cfg.max_tiles})"
        )
        x = nn.Conv(
            cfg.width,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype).reshape((b * t,) + images.shape[2:]))
        patches = x.shape[1] * x.shape[2]
        x = x.reshape(b, t, patches, cfg.width)
        x = TilePositionalEmbedding(
            cfg.max_tiles,
            cfg.width,
            cfg.num_aspect_ratio_ids,
            name="pre_tile_pos_embed",
        )(x, aspect_ratio_ids)
        cls_tok = self.param(
            "class_embedding", nn.initializers.normal(stddev=0.02), (cfg.width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(x.dtype), (b, t, 1, cfg.width)), x],
            axis=2,
        )
        seq = patches + 1
        x = GatedPositionalEmbedding(
            cfg.max_tiles,
            cfg.width,
            cfg.num_aspect_ratio_ids,
            seq,
            name="gated_pos_embed",
        )(x, aspect_ratio_ids)
        x = FastLayerNorm(dtype=self.dtype, name="pre_ln")(x)

        # pad each tile's sequence to a multiple of 8 (HF does the same;
        # also the TPU-friendly shape), flatten tiles into one sequence,
        # and mask padding positions + invalid tiles as attention keys
        padded = _pad_to_multiple(seq, 8)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, padded - seq), (0, 0)))
        pos_valid = (jnp.arange(padded) < seq)[None, None, :]  # (1, 1, Lp)
        key_valid = (tile_mask[:, :, None].astype(bool) & pos_valid).reshape(b, -1)
        attn_mask = key_valid[:, None, None, :]  # (B, 1, 1, T*Lp)
        key_valid_len = None
        if all_tiles_real and t == 1:
            # the key mask is then the STATIC prefix `< seq` (1601-of-1608)
            # shared by every batch row — express it as sdpa(key_valid_len=)
            # so the row-blocked encoder-attention kernel takes it on TPU
            # (47% faster than the XLA masked pass standalone at this
            # shape; kernel dispatch is DEFAULT ON since the chain-10/11
            # in-model win, MMTPU_ENC_ATTN=0 opts out). The round-2
            # flash(kv_lengths=...) route lost in-model (0.55 vs 0.63 p/s
            # — boundary relayouts); this kernel is a different structure,
            # measured separately.
            attn_mask, key_valid_len = None, seq
        x = x.reshape(b, t * padded, cfg.width)

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
                quantize=self.quantize,
                fuse_ln=cfg.fuse_ln,
                name=f"local{i}",
            )(x, mask=attn_mask, key_valid_len=key_valid_len)
        x = FastLayerNorm(dtype=self.dtype, name="post_ln")(x)
        x = x.reshape(b, t, padded, cfg.width)
        x = TilePositionalEmbedding(
            cfg.max_tiles,
            cfg.width,
            cfg.num_aspect_ratio_ids,
            name="post_tile_pos_embed",
        )(x, aspect_ratio_ids)
        x = x.reshape(b, t * padded, cfg.width)
        for i in range(cfg.global_layers):
            x = GatedEncoderBlock(
                num_heads=cfg.heads,
                mlp_ratio=cfg.mlp_ratio,
                dtype=self.dtype,
                quantize=self.quantize,
                name=f"global{i}",
            )(x, mask=attn_mask, key_valid_len=key_valid_len)

        # HF concatenates [final, stack(intermediates, -1).reshape(.., -1)]:
        # the intermediate block is CHANNEL-INTERLEAVED (index = c*n_int + l),
        # which the projector's kernel layout depends on.
        inter = jnp.stack(intermediates, axis=-1).reshape(b, t * padded, -1)
        feats = jnp.concatenate([x, inter], axis=-1)
        # drop the per-tile padding positions before the projector
        feats = feats.reshape(b, t, padded, -1)[:, :, :seq].reshape(
            b, t * seq, -1
        )
        out = nn.Dense(
            self.out_dim,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (EMBED, None)
            ),
            dtype=self.dtype,
            name="multi_modal_projector",
        )(feats)
        token_mask = jnp.broadcast_to(
            tile_mask[:, :, None].astype(bool), (b, t, seq)
        ).reshape(b, t * seq)
        return out, token_mask


class MllamaTextModel(nn.Module):
    config: MllamaTextConfig
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4"

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        vision_states: Optional[jnp.ndarray] = None,
        vision_mask: Optional[jnp.ndarray] = None,  # (B, Lv) 1 = real token
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
        cross_mask = None
        if vision_mask is not None:
            cross_mask = vision_mask[:, None, None, :].astype(bool)
        for i in range(cfg.layers):
            if i in cfg.cross_attn_layers:
                x = CrossAttentionBlock(
                    num_heads=cfg.heads,
                    num_kv_heads=cfg.kv_heads,
                    head_dim=cfg.head_dim,
                    mlp_hidden=cfg.mlp_hidden,
                    dtype=self.dtype,
                    quantize=self.quantize,
                    name=f"cross{i}",
                )(x, vision_states, cross_mask=cross_mask)
            else:
                x = LlamaBlock(
                    num_heads=cfg.heads,
                    num_kv_heads=cfg.kv_heads,
                    head_dim=cfg.head_dim,
                    mlp_hidden=cfg.mlp_hidden,
                    max_len=cfg.max_len,
                    rope_theta=cfg.rope_theta,
                    dtype=self.dtype,
                    quantize=self.quantize,
                    name=f"layer{i}",
                )(x, mask=pad_mask)
        return RMSNorm(dtype=self.dtype, name="final_norm")(x)


class MmE5Embedder(nn.Module):
    """End-to-end multimodal embedder with the mmE5 pooling contract."""

    config: MllamaConfig
    dtype: Any = jnp.float32

    def setup(self):
        q = self.config.quantize
        if q == "int8-mixed":
            vision_q, text_q = False, True
        elif q == "int4-mixed":
            vision_q, text_q = False, "int4"
        else:
            vision_q, text_q = q, q
        self.vision_model = MllamaVisionEncoder(
            self.config.vision,
            self.config.text.hidden,
            self.dtype,
            quantize=vision_q,
        )
        self.text_model = MllamaTextModel(
            self.config.text, self.dtype, quantize=text_q
        )

    def __call__(
        self,
        token_ids: jnp.ndarray,  # (B, L)
        attention_mask: jnp.ndarray,  # (B, L)
        images: Optional[jnp.ndarray] = None,  # (B, T, S, S, 3) tiles,
        #   or (B, S, S, 3) → treated as one (1,1)-aspect tile per image
        aspect_ratio_ids: Optional[jnp.ndarray] = None,  # (B,)
        tile_mask: Optional[jnp.ndarray] = None,  # (B, T)
    ) -> jnp.ndarray:
        vision_states = vision_mask = None
        if images is not None:
            vision_states, vision_mask = self.encode_vision(
                images, aspect_ratio_ids, tile_mask
            )
        return self.embed_from_vision(
            token_ids, attention_mask, vision_states, vision_mask
        )

    def encode_vision(
        self,
        images: jnp.ndarray,  # (B, T, S, S, 3) tiles or (B, S, S, 3)
        aspect_ratio_ids: Optional[jnp.ndarray] = None,  # (B,)
        tile_mask: Optional[jnp.ndarray] = None,  # (B, T)
    ):
        """Vision tower only → (vision_states (B, Lv, hidden), vision_mask).

        Split entry point for decoupled serving microbatches: the vision
        tower's attention transient bounds its batch to ~2 crops at 11B,
        while the weight-streaming-bound TEXT stack wants 8-16 crops per
        forward to amortize each ~5GB int8 weight read (the reference runs
        one combined forward per crop, ``embedder.py:104-137``; here the
        two halves run as separate programs over a buffered
        ``vision_states``)."""
        single_tile = images.ndim == 4
        if single_tile:
            images = images[:, None]
        b, t = images.shape[0], images.shape[1]
        # short stacks are processed AS-IS (t tiles, not padded to
        # max_tiles): the tower slices its tile tables to the first t
        # slots and valid-token outputs match the padded-stack result
        # exactly (padding tiles were masked keys) — a 4x token-count
        # saving for the dominant single-tile region-crop workload
        if aspect_ratio_ids is None:
            # id 1 = the (1,1) single-tile arrangement
            aspect_ratio_ids = jnp.ones((b,), jnp.int32)
        # a caller that passes no tile_mask asserts every tile is real
        # (the fused single-tile serving path) — a STATIC fact the
        # vision tower turns into prefix-masked kernel attention
        all_tiles_real = tile_mask is None
        if tile_mask is None:
            tile_mask = jnp.ones((b, t), jnp.int32)
        else:
            assert tile_mask.shape[1] == t, (
                f"tile_mask covers {tile_mask.shape[1]} tiles, images "
                f"carry {t}"
            )
        return self.vision_model(
            images, aspect_ratio_ids, tile_mask,
            all_tiles_real=all_tiles_real,
        )

    def embed_from_vision(
        self,
        token_ids: jnp.ndarray,  # (B, L)
        attention_mask: jnp.ndarray,  # (B, L)
        vision_states: Optional[jnp.ndarray] = None,  # (B, Lv, hidden)
        vision_mask: Optional[jnp.ndarray] = None,  # (B, Lv)
    ) -> jnp.ndarray:
        """Text stack + pooling over precomputed ``vision_states`` (the
        other half of the decoupled split; see ``encode_vision``)."""
        hidden = self.text_model(
            token_ids, attention_mask, vision_states, vision_mask
        )
        return last_token_pool(
            hidden.astype(jnp.float32), attention_mask, normalize=True
        )
