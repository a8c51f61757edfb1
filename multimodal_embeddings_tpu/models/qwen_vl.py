"""Qwen2.5-VL-style document parser VLM (the reference's stretch path).

The reference notebook (``QWEN2_5_document_parsing.ipynb``) runs
``Qwen/Qwen2.5-VL-{3B,7B,32B}-Instruct`` in bf16 with flash-attention-2 and
asks for "QwenVL HTML" — per-element ``data-bbox`` markup of the page. This
module re-derives that model family TPU-first:

* **vision tower**: 14-px patch embedding, merged 2×2 into the text hidden
  size by an MLP patch-merger (the Qwen2-VL design), transformer blocks
  with the Pallas flash-attention kernel;
* **text decoder**: Qwen2 layout — Llama-style blocks with QKV bias and
  GQA — whose input sequence splices the projected vision tokens at the
  image-placeholder position (Qwen splices embeddings, it does not
  cross-attend);
* **generation**: greedy/temperature decode with a static-shape KV cache
  under ``lax.scan`` (no data-dependent Python control flow).

Configs: ``qwen25_vl_3b/7b`` match the published layouts; ``tiny`` for
tests. Weight porting uses the shape-validated torch loader in
``weights.py`` when a checkpoint is available.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_embeddings_tpu.models.transformer import (
    EMBED,
    HEADS,
    HEAD_DIM,
    KV_HEADS,
    MLP,
    VOCAB,
    FastLayerNorm,
    GeluMLP,
    RMSNorm,
    SwiGLU,
    apply_rope,
    sdpa,
)


@dataclasses.dataclass(frozen=True)
class QwenVisionConfig:
    patch_size: int = 14
    merge_size: int = 2  # 2x2 patch merging into one text token
    width: int = 1280
    layers: int = 32
    heads: int = 16
    mlp_ratio: float = 4.0
    # Qwen2.5-VL window attention: all blocks attend within
    # window_size-pixel windows except the listed full-attention blocks
    # (HF config: window_size=112, fullatt_block_indexes=[7,15,23,31]).
    # window_size=None disables windowing everywhere.
    window_size: Optional[int] = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    rope_theta: float = 10000.0


@dataclasses.dataclass(frozen=True)
class QwenTextConfig:
    vocab_size: int = 151936
    hidden: int = 3584
    layers: int = 28
    heads: int = 28
    kv_heads: int = 4
    head_dim: int = 128
    mlp_hidden: int = 18944
    max_len: int = 4096
    rope_theta: float = 1000000.0
    # M-RoPE: frequency-group sizes (in rotary-frequency units, summing to
    # head_dim//2) assigned to the temporal/height/width position streams
    # (HF Qwen2.5-VL mrope_section [16, 24, 24])
    mrope_section: Tuple[int, int, int] = (16, 24, 24)
    # KV-cache storage dtype. bf16 matches the reference serving numerics
    # (the notebook loads the model in bf16 and HF caches K/V at the model
    # dtype) and HALVES the per-step cache stream — decode reads the whole
    # padded cache every step, so at batch 8 the f32 cache was a large
    # share of the 2.9ms step tax over the weight-stream floor, and the
    # f32 KV allocation was half the 3b-int8 batch-16 OOM. Attention
    # still computes f32 logits/softmax on the upcast (fused into the
    # dot, no f32 cache materialization).
    kv_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class QwenVLConfig:
    vision: QwenVisionConfig = dataclasses.field(default_factory=QwenVisionConfig)
    text: QwenTextConfig = dataclasses.field(default_factory=QwenTextConfig)
    image_pad_id: int = 151655  # <|image_pad|>
    eos_id: int = 151645  # <|im_end|>
    # weight-only quantized serving for the decoder Dense kernels + lm_head
    # (models/quantized.py): False | True/"int8" | "int4" — the TPU-native
    # counterpart of the notebook's bitsandbytes 4-bit (32B) / 8-bit (7B)
    # loads, cell ``39512aca``. The vision tower (~0.7B) stays bf16: it is
    # <3% of 32B-scale parameters and its window-attention access patterns
    # gain nothing from quantized storage.
    quantize: Any = False

    @classmethod
    def qwen25_vl_7b(cls) -> "QwenVLConfig":
        return cls()

    @classmethod
    def qwen25_vl_3b(cls) -> "QwenVLConfig":
        return cls(
            text=QwenTextConfig(
                hidden=2048, layers=36, heads=16, kv_heads=2, mlp_hidden=11008
            )
        )

    @classmethod
    def qwen25_vl_32b(cls) -> "QwenVLConfig":
        """The notebook's flagship configuration (cell ``39512aca`` loads
        ``Qwen/Qwen2.5-VL-32B-Instruct`` with 4-bit quantization). Published
        Qwen2.5-32B decoder layout: hidden 5120, 64 layers, 40 query / 8 KV
        heads, SwiGLU intermediate 27648, 152064-token vocabulary; the
        vision tower is the family-shared 1280-wide 32-layer design.

        Single-chip fit math (16GB v5e): 32.8B decoder+head params → 32.8GB
        int8 — does NOT fit one chip; serve int8 + pipeline-parallel
        (``models/qwen_pp.py``): 4 stages × 16 layers ≈ 8.2GB weights/stage
        + vision (1.3GB bf16, stage 0) + KV cache (bf16, 4096 ctx ≈
        0.7GB/stage) ≈ 10GB/chip peak. bf16 without PP would need 66GB."""
        return cls(
            text=QwenTextConfig(
                vocab_size=152064,
                hidden=5120,
                layers=64,
                heads=40,
                kv_heads=8,
                mlp_hidden=27648,
            )
        )

    @classmethod
    def qwen25_vl_7b_int8(cls) -> "QwenVLConfig":
        """The notebook's 7B configuration with 8-bit quantization (cell
        ``39512aca``, ``BitsAndBytesConfig(load_in_8bit=True)`` for 7B):
        ~7.6B decoder params int8 ≈ 7.6GB + bf16 vision (~0.7GB) +
        embed/lm_head — fits ONE 16GB chip with KV-cache headroom; the
        single-chip on-hardware demo config for the parse surface."""
        return dataclasses.replace(cls.qwen25_vl_7b(), quantize=True)

    @classmethod
    def qwen25_vl_3b_int8(cls) -> "QwenVLConfig":
        """3B with int8 decoder storage. Not a notebook config (the
        notebook runs 3B bf16) but the natural TPU serving point for
        batch-1 decode, which is WEIGHT-STREAMING bound at 9.0 ms/token
        bf16 (BENCH_PARSE.json): halving decoder bytes halves the floor."""
        return dataclasses.replace(cls.qwen25_vl_3b(), quantize=True)

    @classmethod
    def qwen25_vl_3b_int4(cls) -> "QwenVLConfig":
        """3B with packed-int4 decoder storage. Decode is weight-streaming
        bound (the ~5 ms/step int8 stream dominates the measured 10-13
        ms/step at batch 8-32, BENCH_PARSE.json r4-09/r4-11) — packed int4
        halves the streamed bytes again; whether the in-kernel nibble
        unpack eats the win at decode's M=B shapes is the measurement
        (the 11B embedder's int4 ties int8 at M=64 decode-like rows but
        loses 2.2x at M=3k, ROADMAP chain-10)."""
        return dataclasses.replace(cls.qwen25_vl_3b(), quantize="int4")

    @classmethod
    def qwen25_vl_32b_int8(cls) -> "QwenVLConfig":
        return dataclasses.replace(cls.qwen25_vl_32b(), quantize=True)

    @classmethod
    def qwen25_vl_32b_int4(cls) -> "QwenVLConfig":
        """The notebook's literal flagship storage class: 32B at 4-bit
        (cell ``39512aca``, ``BitsAndBytesConfig(load_in_4bit=True)``).
        Packed int4 (``kernels/quantization_int4.py``) halves int8's
        decoder bytes: ~31.2B dense decoder params → ~15.6GB packed +
        group scales (~0.5GB at G=128) → **2 PP stages** ≈ 8GB
        weights/stage + vision (1.3GB bf16, stage 0) + embed/lm_head
        (int4) + KV cache ≈ 11GB/chip peak, vs int8's 4 stages."""
        return dataclasses.replace(cls.qwen25_vl_32b(), quantize="int4")

    @classmethod
    def tiny(cls) -> "QwenVLConfig":
        return cls(
            vision=QwenVisionConfig(patch_size=14, merge_size=2, width=32, layers=2, heads=2),
            text=QwenTextConfig(
                vocab_size=512,
                hidden=64,
                layers=2,
                heads=4,
                kv_heads=2,
                head_dim=16,
                mlp_hidden=128,
                max_len=128,
                mrope_section=(2, 3, 3),
            ),
            image_pad_id=5,
            eos_id=2,
        )


def vision_rope_2d(
    gh: int, gw: int, head_dim: int, theta: float = 10000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Qwen2-VL vision 2D rotary tables: per patch (i, j) the angle vector
    is ``[row_freqs(i) | col_freqs(j)]`` of length head_dim/2 (HF
    ``VisionRotaryEmbedding(head_dim // 2)`` + ``rot_pos_emb``), consumed
    by the rotate-half convention of ``apply_rope``. Returns (cos, sin)
    of shape (gh*gw, head_dim//2), row-major patch order."""
    dim = head_dim // 2  # rotary dim per VisionRotaryEmbedding
    inv_freq = 1.0 / (
        theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    )  # (head_dim//4,)
    hfreqs = np.outer(np.arange(gh, dtype=np.float64), inv_freq)  # (gh, d4)
    wfreqs = np.outer(np.arange(gw, dtype=np.float64), inv_freq)  # (gw, d4)
    ang = np.concatenate(
        [
            np.broadcast_to(hfreqs[:, None, :], (gh, gw, hfreqs.shape[1])),
            np.broadcast_to(wfreqs[None, :, :], (gh, gw, wfreqs.shape[1])),
        ],
        axis=-1,
    ).reshape(gh * gw, head_dim // 2)
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(
        np.sin(ang), jnp.float32
    )


def _window_attention(q, k, v, gh: int, gw: int, win: int):
    """Attention restricted to win×win patch windows of the (gh, gw) grid.

    q/k/v: (B, gh*gw, H, D) in row-major patch order (RoPE already
    applied — window partition is position-independent). Grids that are
    not multiples of ``win`` are padded and the pad keys masked; pad
    queries are discarded on un-partition. With one window covering the
    whole grid this is exactly full attention (bit-identical path modulo
    an identity reshape)."""
    b, length, h, d = q.shape
    nwh = -(-gh // win)
    nww = -(-gw // win)
    ph, pw = nwh * win - gh, nww * win - gw

    def part(x):
        x = x.reshape(b, gh, gw, h, d)
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0), (0, 0)))
        x = x.reshape(b, nwh, win, nww, win, h, d)
        x = x.transpose(0, 1, 3, 2, 4, 5, 6)  # (b, nwh, nww, win, win, h, d)
        return x.reshape(b * nwh * nww, win * win, h, d)

    qw, kw, vw = part(q), part(k), part(v)
    if ph or pw:
        valid = jnp.ones((gh, gw), bool)
        valid = jnp.pad(valid, ((0, ph), (0, pw)))
        valid = (
            valid.reshape(nwh, win, nww, win)
            .transpose(0, 2, 1, 3)
            .reshape(nwh * nww, win * win)
        )
        mask = jnp.broadcast_to(
            valid[None, :, None, None, :], (b, nwh * nww, 1, 1, win * win)
        ).reshape(b * nwh * nww, 1, 1, win * win)
        out = sdpa(qw, kw, vw, mask=mask)
    else:
        out = sdpa(qw, kw, vw)
    out = out.reshape(b, nwh, nww, win, win, h, d).transpose(0, 1, 3, 2, 4, 5, 6)
    out = out.reshape(b, nwh * win, nww * win, h, d)[:, :gh, :gw]
    return out.reshape(b, length, h, d)


def mrope_tables(
    position_ids: jnp.ndarray,  # (3, B, L) t/h/w position streams
    head_dim: int,
    theta: float,
    sections: Tuple[int, int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """M-RoPE cos/sin of shape (B, L, head_dim//2): frequency index f
    rotates by ``pos[axis(f)] * inv_freq[f]`` where axis(f) walks the
    t/h/w sections (HF Qwen2.5-VL ``apply_multimodal_rotary_pos_emb``).
    With t == h == w everywhere this equals standard RoPE exactly."""
    d2 = head_dim // 2
    assert sum(sections) == d2, (sections, head_dim)
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )  # (d2,)
    axis_of = np.concatenate(
        [np.full(s, i, np.int32) for i, s in enumerate(sections)]
    )  # (d2,)
    pos = position_ids[jnp.asarray(axis_of)]  # (d2, B, L)
    ang = pos.transpose(1, 2, 0).astype(jnp.float32) * jnp.asarray(
        inv_freq, jnp.float32
    )
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_batched(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """rotate-half RoPE with per-batch tables: x (B, L, H, D),
    cos/sin (B, L, D//2)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def qwen_mrope_position_ids(
    token_ids: jnp.ndarray,  # (B, L)
    image_pad_id: int,
    grid_hw: Optional[Tuple[int, int]],  # MERGED vision grid (gh', gw')
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(t, h, w) position streams per HF ``get_rope_index`` for sequences
    with at most one contiguous image span: text tokens advance all three
    streams together; image tokens keep t at the span start and spread
    h/w over the merged grid; text after the image resumes at
    ``start + max(gh', gw')``. Returns (position_ids (3, B, L),
    mrope_delta (B,)) where delta = (max position + 1) − seq_len, the
    offset decode steps add to their scalar position."""
    b, length = token_ids.shape
    idx = jnp.arange(length)[None, :]
    if grid_hw is None:
        pos = jnp.broadcast_to(idx, (b, length))
        return jnp.stack([pos] * 3), jnp.zeros((b,), jnp.int32)
    gh, gw = grid_hw
    is_pad = token_ids == image_pad_id
    has = jnp.any(is_pad, axis=1)
    first = jnp.argmax(is_pad, axis=1)  # (B,)
    npad = jnp.sum(is_pad, axis=1)
    rank = jnp.cumsum(is_pad, axis=1) - 1  # within-image index
    row = rank // gw
    col = rank % gw
    after = idx >= (first + npad)[:, None]
    after_pos = first[:, None] + max(gh, gw) + (idx - (first + npad)[:, None])
    t = jnp.where(is_pad, first[:, None], jnp.where(after, after_pos, idx))
    h = jnp.where(
        is_pad, first[:, None] + row, jnp.where(after, after_pos, idx)
    )
    w = jnp.where(
        is_pad, first[:, None] + col, jnp.where(after, after_pos, idx)
    )
    pos = jnp.stack([t, h, w]).astype(jnp.int32)
    plain = jnp.broadcast_to(idx, (b, length)).astype(jnp.int32)
    pos = jnp.where(has[None, :, None], pos, plain[None])
    delta = jnp.where(
        has,
        first + max(gh, gw) + (length - first - npad) - length,
        0,
    ).astype(jnp.int32)
    return pos, delta


class QwenVisionTower(nn.Module):
    """Qwen2.5-VL vision encoder: 2D rotary position embedding (no learned
    positions — matches the checkpoint's parameter set) and window
    attention everywhere except ``fullatt_block_indexes`` (notebook cell
    ``39512aca`` loads this architecture with flash-attention-2)."""

    config: QwenVisionConfig
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, S, S, 3), CLIP-normalized (doc_parser.preprocess_page)
        → (B, (S/p/m)^2, out_dim)."""
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
        head_dim = cfg.width // cfg.heads
        cos, sin = vision_rope_2d(gh, gw, head_dim, cfg.rope_theta)
        win = None
        if cfg.window_size is not None:
            win = max(1, cfg.window_size // cfg.patch_size)
        for i in range(cfg.layers):
            h = FastLayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            qkv = nn.DenseGeneral(
                (3, cfg.heads, head_dim),
                axis=-1,
                dtype=self.dtype,
                name=f"qkv_{i}",
            )(h)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            full = (
                win is None
                or i in cfg.fullatt_block_indexes
                or win >= max(gh, gw)
            )
            if full:
                attn = sdpa(q, k, v)
            else:
                attn = _window_attention(q, k, v, gh, gw, win)
            h = nn.DenseGeneral(
                cfg.width, axis=(-2, -1), dtype=self.dtype, name=f"proj_{i}"
            )(attn)
            x = x + h
            h = FastLayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            x = x + GeluMLP(int(cfg.width * cfg.mlp_ratio), dtype=self.dtype, name=f"mlp_{i}")(h)
        x = FastLayerNorm(dtype=self.dtype, name="final_ln")(x)

        # 2x2 patch merger → text hidden (Qwen2-VL PatchMerger)
        m = cfg.merge_size
        x = x.reshape(b, gh // m, m, gw // m, m, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (gh // m) * (gw // m), m * m * c)
        x = nn.Dense(m * m * c, dtype=self.dtype, name="merger_fc1")(x)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="merger_fc2")(x)


class QwenBlock(nn.Module):
    """Qwen2 decoder block: RMSNorm + GQA attention (QKV bias) + SwiGLU.

    ``quantize=True``/``"int8"`` stores every Dense kernel int8 with
    per-channel f32 scales; ``"int4"`` stores packed group-wise int4
    (``models/quantized.py``) — the TPU-native counterparts of the
    notebook's 8-bit (7B) and 4-bit (32B) bitsandbytes serving
    (cell ``39512aca``)."""

    config: QwenTextConfig
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4"

    @nn.compact
    def __call__(self, x, cos, sin, mask=None, cache=None, position=None):
        cfg = self.config
        if self.quantize:
            from multimodal_embeddings_tpu.models.quantized import (
                quant_dense_cls,
            )

            qcls = quant_dense_cls(self.quantize)
            dense = lambda feat, name, axes, bias=True, ax=-1: (  # noqa: E731
                qcls(
                    features=feat, axis=ax, use_bias=bias, dtype=self.dtype,
                    name=name,
                )
            )
        else:
            dense = lambda feat, name, axes, bias=True, ax=-1: (  # noqa: E731
                nn.DenseGeneral(
                    feat,
                    axis=ax,
                    use_bias=bias,
                    kernel_init=nn.with_logical_partitioning(
                        nn.initializers.normal(stddev=0.02), axes
                    ),
                    dtype=self.dtype,
                    name=name,
                )
            )
        h = RMSNorm(dtype=self.dtype, name="attn_norm")(x)
        q = dense((cfg.heads, cfg.head_dim), "q", (EMBED, HEADS, HEAD_DIM))(h)
        k = dense(
            (cfg.kv_heads, cfg.head_dim), "k", (EMBED, KV_HEADS, HEAD_DIM)
        )(h)
        v = dense(
            (cfg.kv_heads, cfg.head_dim), "v", (EMBED, KV_HEADS, HEAD_DIM)
        )(h)

        # cos/sin are the per-token M-RoPE tables for THIS call:
        # (B, L, d/2) on prefill, (B, 1, d/2) on decode
        q = apply_rope_batched(q, cos, sin)
        k = apply_rope_batched(k, cos, sin)
        kvd = jnp.dtype(cfg.kv_dtype)
        if position is None:
            new_cache = (k.astype(kvd), v.astype(kvd))
            attn = sdpa(q, k, v, mask=mask, causal=True)
        elif jnp.ndim(position) == 0:
            # single-step decode against a static cache (shared slot)
            k_cache, v_cache = cache
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k.astype(k_cache.dtype), position, axis=1
            )
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v.astype(v_cache.dtype), position, axis=1
            )
            new_cache = (k_cache, v_cache)
            valid = (
                jnp.arange(k_cache.shape[1])[None, None, None, :] <= position
            )
            attn = sdpa(q, k_cache, v_cache, mask=valid)
        else:
            # PER-ROW slot decode: position is (B,) — rows admitted at
            # different times sit at different cache depths (continuous
            # batching, models/qwen_serve.py). One-row scatter per batch
            # row; the per-step cost is dominated by the full-cache KV
            # read either way.
            k_cache, v_cache = cache
            rows = jnp.arange(k_cache.shape[0])
            k_cache = k_cache.at[rows, position].set(
                k.astype(k_cache.dtype)[:, 0]
            )
            v_cache = v_cache.at[rows, position].set(
                v.astype(v_cache.dtype)[:, 0]
            )
            new_cache = (k_cache, v_cache)
            valid = (
                jnp.arange(k_cache.shape[1])[None, None, None, :]
                <= position[:, None, None, None]
            )
            attn = sdpa(q, k_cache, v_cache, mask=valid)

        h = dense(
            x.shape[-1], "o", (HEADS, HEAD_DIM, EMBED), bias=False,
            ax=(-2, -1),
        )(attn)
        x = x + h
        h = RMSNorm(dtype=self.dtype, name="mlp_norm")(x)
        x = x + SwiGLU(
            cfg.mlp_hidden, dtype=self.dtype, quantize=self.quantize,
            name="mlp",
        )(h)
        return x, new_cache


class QwenVLModel(nn.Module):
    """Full VLM: embed tokens, splice vision tokens at image-pad positions,
    run the decoder; ``decode_step`` serves cached generation."""

    config: QwenVLConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.vision = QwenVisionTower(cfg.vision, cfg.text.hidden, self.dtype)
        self.tok_embed = nn.Embed(
            cfg.text.vocab_size,
            cfg.text.hidden,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (VOCAB, EMBED)
            ),
            dtype=self.dtype,
            name="tok_embed",
        )
        self.blocks = [
            QwenBlock(cfg.text, self.dtype, quantize=cfg.quantize, name=f"layer{i}")
            for i in range(cfg.text.layers)
        ]
        self.final_norm = RMSNorm(dtype=self.dtype, name="final_norm")
        if cfg.quantize:
            from multimodal_embeddings_tpu.models.quantized import (
                quant_dense_cls,
            )

            self.lm_head = quant_dense_cls(cfg.quantize)(
                features=cfg.text.vocab_size, dtype=self.dtype, name="lm_head"
            )
        else:
            self.lm_head = nn.Dense(
                cfg.text.vocab_size,
                use_bias=False,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(stddev=0.02), (EMBED, VOCAB)
                ),
                dtype=self.dtype,
                name="lm_head",
            )

    def _merged_grid(self, images) -> Optional[Tuple[int, int]]:
        if images is None:
            return None
        cfg = self.config.vision
        m = cfg.patch_size * cfg.merge_size
        return int(images.shape[1]) // m, int(images.shape[2]) // m

    def _mrope(self, position_ids):
        cfg = self.config.text
        return mrope_tables(
            position_ids, cfg.head_dim, cfg.rope_theta, cfg.mrope_section
        )

    def embed_multimodal(
        self, token_ids: jnp.ndarray, images: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        """Token embeddings with vision tokens scattered into the
        ``image_pad_id`` slots, in order."""
        x = self.tok_embed(token_ids)
        if images is None:
            return x
        vis = self.vision(images)  # (B, T, hidden)
        is_pad = token_ids == self.config.image_pad_id  # (B, L)
        # k-th pad position receives the k-th vision token
        pad_rank = jnp.cumsum(is_pad, axis=1) - 1
        pad_rank = jnp.clip(pad_rank, 0, vis.shape[1] - 1)
        gathered = jnp.take_along_axis(
            vis, pad_rank[..., None].astype(jnp.int32), axis=1
        )
        return jnp.where(is_pad[..., None], gathered.astype(x.dtype), x)

    def __call__(
        self,
        token_ids: jnp.ndarray,
        images: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        cache_len: Optional[int] = None,
        last_only: bool = False,
    ):
        """Prefill forward: returns (logits, kv_caches padded to
        ``cache_len`` — default ``max_len`` — and mrope_delta (B,), the
        position offset decode steps must add).

        ``cache_len`` tightens the static KV allocation to what the
        caller will actually decode (prompt + max_new): every decode step
        reads the WHOLE padded cache under the position mask, so a
        4096-slot cache behind a 1600-token parse streams 2.5× the KV
        bytes for nothing — material once batched decode amortizes the
        weight stream (B × layers × 2 × kv_heads × head_dim × cache_len
        per step).

        ``last_only=True`` computes lm_head logits for the FINAL position
        only (all greedy generation needs) — the full (B, L, vocab_size)
        tensor is multi-GB at parse shapes (b16 × 551 × 152k vocab f32 =
        5.4GB, the measured 3b-int8 batch-16 prefill OOM) and XLA does
        not reliably push the caller's ``[:, -1]`` slice through the
        matmul."""
        cfg = self.config.text
        x = self.embed_multimodal(token_ids, images)
        position_ids, delta = qwen_mrope_position_ids(
            token_ids, self.config.image_pad_id, self._merged_grid(images)
        )
        cos, sin = self._mrope(position_ids)
        mask = None
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :].astype(bool)
        caches = []
        for block in self.blocks:
            x, (k, v) = block(x, cos, sin, mask=mask)
            b, l, kvh, d = k.shape
            pad = (cache_len or cfg.max_len) - l
            caches.append(
                (
                    jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))),
                    jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))),
                )
            )
        if last_only:
            x = x[:, -1:]
        x = self.final_norm(x)
        return self.lm_head(x), caches, delta

    def decode_step(
        self,
        token_ids: jnp.ndarray,
        caches,
        position: jnp.ndarray,
        mrope_delta: Optional[jnp.ndarray] = None,
    ):
        """One cached decode step: token_ids (B, 1) at cache slot
        ``position`` — a scalar (all rows at the same depth, the batched
        one-shot generate) or a (B,) vector (per-row depths, continuous
        batching); the rotary angle uses ``position + mrope_delta``
        (text after an image sits at higher M-RoPE positions than its
        cache slot)."""
        x = self.tok_embed(token_ids)
        b = token_ids.shape[0]
        pos = jnp.broadcast_to(
            jnp.asarray(position, jnp.int32), (b,)
        )
        if mrope_delta is not None:
            pos = pos + mrope_delta
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, b, 1))
        cos, sin = self._mrope(pos3)
        new_caches = []
        for block, cache in zip(self.blocks, caches):
            x, new_cache = block(x, cos, sin, cache=cache, position=position)
            new_caches.append(new_cache)
        x = self.final_norm(x)
        return self.lm_head(x), new_caches


_GENERATE_CACHE: dict = {}


def build_generate_fns(
    model: QwenVLModel,
    prompt_len: int,
    max_new_tokens: int,
    early_stop: bool = True,
    prefill_chunk: int = 0,
):
    """Jitted (prefill, decode) pair for greedy generation.

    Both take the parameter tree as their FIRST ARGUMENT — closed-over
    multi-GB weight trees are inlined into the HLO as constants, which
    stalls/kills the remote compiler at 3B+ parse scale (CLAUDE.md; the
    same rule the mme5 embed path follows in ``pipeline/fused.py``).

    ``prefill(variables, tokens, imgs) -> (last_logits, caches, delta)``;
    ``decode(variables, last_logits, caches, delta) -> (B, T) token ids``
    — the whole ``max_new_tokens`` greedy loop is ONE on-device program
    (no per-token host dispatch; through the axon tunnel a per-token loop
    would pay the ~4ms dispatch floor 1024×).

    ``early_stop=True`` (default) runs it as a ``lax.while_loop`` that
    exits once EVERY batch row has emitted EOS — the HF ``generate``
    stopping contract (reference notebook cell ``d43bacc8``), worth real
    wall-clock on short pages. ``early_stop=False`` runs the fixed
    ``lax.scan`` — what benchmarks use, so the measured decode cost is
    the honest full-length figure independent of what the (synthetic)
    weights emit. Emitted tokens are IDENTICAL (post-EOS slots are
    EOS-padded either way; test-locked).

    ``prefill_chunk=C`` (0 = off) runs prefill C pages at a time and
    concatenates the per-chunk caches/logits along the batch axis —
    token-identical (prefill is batch-row-independent). This decouples
    the DECODE batch (whose per-step cost amortizes the weight stream
    near-flat: 10.3/11.2/12.9 ms at b8/16/32, r4-11) from the PREFILL
    batch, whose b×heads×L×L attention logits transient is what OOMs
    first — so bulk decode can run at batches prefill alone could
    never fit.

    The decode fns take an optional trailing ``force_steps`` argument —
    an (B,) int32 array; row i is forced to emit EOS at output position
    ``force_steps[i]`` and after (omit it for real decoding). This is
    the MEASUREMENT knob for the early-stop upside: synthetic random
    weights never emit a real EOS, so without injection the while_loop
    path can only ever measure its overhead, never its exit. Token
    output is identical between the scan and while_loop variants for
    the same ``force_steps`` (EOS-padded); only wall-clock differs —
    while_loop exits at ``max(force_steps)``, scan always runs
    ``max_new_tokens`` steps."""
    eos = model.config.eos_id
    # tight static cache: prompt + generation, rounded to the lane width —
    # NOT max_len (every decode step reads the whole padded cache; at
    # max_len=4096 behind a 1600-token parse that is 2.5× dead KV traffic)
    cache_len = min(
        model.config.text.max_len,
        -(-(prompt_len + max_new_tokens) // 128) * 128,
    )

    @jax.jit
    def _prefill(variables, tokens, imgs):
        logits, caches, delta = model.apply(
            variables, tokens, imgs, cache_len=cache_len, last_only=True
        )
        return logits[:, -1], caches, delta

    if prefill_chunk and prefill_chunk > 0:

        def prefill(variables, tokens, imgs):
            b = tokens.shape[0]
            c = prefill_chunk
            if b <= c:
                return _prefill(variables, tokens, imgs)
            if b % c:
                raise ValueError(
                    f"batch {b} not divisible by prefill_chunk {c} — one "
                    "chunk program per shape; pad the batch instead"
                )
            parts = [
                _prefill(
                    variables,
                    tokens[i : i + c],
                    None if imgs is None else imgs[i : i + c],
                )
                for i in range(0, b, c)
            ]
            return jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *parts
            )

    else:
        prefill = _prefill

    def _advance(variables, token, caches, done, delta, t, force_steps):
        """One greedy step: emit ``token``'s successor, EOS-pin done rows."""
        logits, caches = model.apply(
            variables,
            token[:, None],
            caches,
            prompt_len + t,
            delta,
            method=model.decode_step,
        )
        next_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        if force_steps is not None:
            # next_token lands at output position t+1
            next_token = jnp.where(t + 1 >= force_steps, eos, next_token)
        next_token = jnp.where(done, eos, next_token)
        return next_token, caches, done | (next_token == eos)

    def _first(last_logits, force_steps):
        first_token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        if force_steps is not None:
            first_token = jnp.where(force_steps <= 0, eos, first_token)
        return first_token

    def decode(variables, last_logits, caches, delta, force_steps=None):
        first_token = _first(last_logits, force_steps)

        def step(carry, t):
            token, caches, done = carry
            next_token, caches, done = _advance(
                variables, token, caches, done, delta, t, force_steps
            )
            return (next_token, caches, done), token

        init = (first_token, caches, first_token == eos)
        (_, _, _), tokens = jax.lax.scan(
            step, init, jnp.arange(max_new_tokens)
        )
        return tokens.transpose(1, 0)  # (B, T)

    def decode_early(variables, last_logits, caches, delta, force_steps=None):
        first_token = _first(last_logits, force_steps)
        b = first_token.shape[0]
        out0 = jnp.full((b, max_new_tokens), eos, jnp.int32)

        def cond(carry):
            t, _, _, done, _ = carry
            return (t < max_new_tokens) & ~jnp.all(done)

        def body(carry):
            t, token, caches, done, out = carry
            out = jax.lax.dynamic_update_slice_in_dim(
                out, token[:, None], t, axis=1
            )
            next_token, caches, done = _advance(
                variables, token, caches, done, delta, t, force_steps
            )
            return t + 1, next_token, caches, done, out

        init = (0, first_token, caches, first_token == eos, out0)
        *_, out = jax.lax.while_loop(cond, body, init)
        return out

    return prefill, jax.jit(decode_early if early_stop else decode)


def greedy_generate(
    model: QwenVLModel,
    variables,
    token_ids: np.ndarray,
    images: Optional[np.ndarray] = None,
    max_new_tokens: int = 128,
    early_stop: bool = True,
    prefill_chunk: int = 0,
) -> np.ndarray:
    """Greedy decoding with a static KV cache in one on-device program.

    Returns the generated token ids (B, max_new_tokens); positions after
    EOS are padded with EOS. ``early_stop`` exits the loop once every row
    has emitted EOS (HF ``generate`` semantics; identical tokens either
    way). Jitted prefill/decode programs are cached per (model, shapes)
    so repeated page parses reuse compiles; weights travel as jit
    arguments (``build_generate_fns``).
    """
    prompt = jnp.asarray(token_ids)
    b, prompt_len = prompt.shape
    if prompt_len + max_new_tokens > model.config.text.max_len:
        raise ValueError(
            f"prompt_len {prompt_len} + max_new_tokens {max_new_tokens} "
            f"exceeds max_len {model.config.text.max_len} — the KV cache and "
            "RoPE tables would silently clamp"
        )

    img_shape = None if images is None else tuple(np.shape(images))
    cache_key = (
        id(model), b, prompt_len, max_new_tokens, img_shape, early_stop,
        prefill_chunk,
    )
    cached = _GENERATE_CACHE.get(cache_key)
    if cached is None:
        cached = build_generate_fns(
            model, prompt_len, max_new_tokens, early_stop=early_stop,
            prefill_chunk=prefill_chunk,
        )
        _GENERATE_CACHE[cache_key] = cached
    prefill, decode = cached
    last_logits, caches, delta = prefill(
        variables, prompt, None if images is None else jnp.asarray(images)
    )
    return np.asarray(decode(variables, last_logits, caches, delta))
