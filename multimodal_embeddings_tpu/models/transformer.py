"""Shared transformer primitives (Flax, TPU-first).

Used by the vision/text dual encoder (``vision_encoder.py``) and the
Mllama-style mmE5 parity model (``mme5.py``). Everything is static-shape,
NHWC/NLD, bf16-compute friendly, and shardable: attention heads and MLP
hidden dims carry ``nn.with_logical_partitioning`` axis names that the
parallel layer maps onto the (data, model) mesh for tensor parallelism.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Logical axis names resolved by parallel/sharding.py
EMBED = "embed"
HEADS = "heads"
KV_HEADS = "kv_heads"
HEAD_DIM = "head_dim"
MLP = "mlp"
VOCAB = "vocab"


def _dense_init():
    return nn.initializers.normal(stddev=0.02)


class RMSNorm(nn.Module):
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.epsilon)
        return (normed * scale).astype(self.dtype)


def rope_frequencies(head_dim: int, max_len: int, theta: float = 500000.0):
    """Llama-3-style RoPE tables (cos, sin) of shape (max_len, head_dim//2)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, L, H, D); rotate pairs (x[..., :D/2], x[..., D/2:])."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[None, : x.shape[1], None, :]
    sin = sin[None, : x.shape[1], None, :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


_FLASH_MIN_LEN = 2048


def _f32_logits_forced() -> bool:
    import os

    return os.environ.get("MMTPU_F32_LOGITS") == "1"


def _enc_attn_kernel_enabled() -> bool:
    """Gate for the whole-row single-pass encoder attention kernel
    (kernels/encoder_attention.py) at short unmasked self-attention
    shapes. DEFAULT ON since the measured in-model win: the headline
    split program runs 5.82 vs 5.42 pages/sec (+7.4%, chain-10 A/B,
    2026-08-18) — the XLA path spends ~38 ms/page materializing and
    re-reading (B, H, L, L) logits (r3 trace). ``MMTPU_ENC_ATTN=0``
    opts out (A/B hygiene)."""
    import os

    return os.environ.get("MMTPU_ENC_ATTN", "1") != "0"


# whole-row kernel domain: the (L, L) f32 score matrix must fit VMEM next
# to the (heads_per_block, L, D) operand blocks; 2048² f32 = 16MB already
# exceeds it, and below ~256 tokens the XLA path's logits are cheap
_ENC_ATTN_MIN_LEN = 256
_ENC_ATTN_MAX_LEN = 1664


def _enc_attn_eligible(q, k, v, mask, causal, pad_to_16: bool = False) -> bool:
    if not _enc_attn_kernel_enabled():
        return False
    if causal or mask is not None:
        return False
    if q.shape[1] != k.shape[1] or q.shape[2] != k.shape[2]:
        return False  # self-attention, no GQA broadcast
    if v.shape[:3] != q.shape[:3]:
        return False  # kernel handles Dv ≠ Dk, but batch/len/heads must match
    l = q.shape[1]
    if pad_to_16:
        l = -(-l // 16) * 16  # the prefix-masked dispatch pads to sublanes
    if not (_ENC_ATTN_MIN_LEN <= l <= _ENC_ATTN_MAX_LEN) or l % 16:
        return False
    if q.shape[3] > 128 or v.shape[3] > 128:
        return False
    return _on_tpu_backend()


def _enc_attn_proj_mode() -> Optional[str]:
    """Proj-to-BHLD encoder attention: the q/k/v projections emit
    (B, H, L, D) DIRECTLY and the whole-row kernel consumes the slab
    without head transposes (``encoder_attention(bhld_inputs=True)``) —
    the relayout copies become matmul output indexing. Chain r4-06 probe:
    +7.1% at the ViT-B shape (5.04 vs 5.42ms), −7% at the detector PSA
    shape (which is untouched: the PSA calls ``sdpa`` directly, not this
    module). **DEFAULT ON since the in-model win: headline 5.9563 vs
    5.8491 pages/sec (+1.8%, chain r4-07 A/B, 2026-08-19).**
    ``MMTPU_ENC_ATTN_PROJ=0`` opts out (A/B hygiene). Returns "tpu" on
    the TPU backend, "interpret" under the CPU test override, else
    None."""
    import os

    if os.environ.get("MMTPU_ENC_ATTN_PROJ_INTERPRET") == "1":
        return "interpret"
    if os.environ.get("MMTPU_ENC_ATTN_PROJ", "1") != "0" and _on_tpu_backend():
        return "tpu"
    return None


def _enc_attn_blf_mode() -> Optional[str]:
    """Lane-folded zero-transpose encoder attention: q/k/v projected as
    plain GEMMs to (B, L, H·D) and ``encoder_attention_blf`` reading
    per-head (L, D) views as static lane slices — no transpose anywhere
    (the 4-D true-BLHD forms all died on Mosaic's sublane 8-divisibility
    at H=12; folding heads onto lanes sidesteps the constraint).
    **DEFAULT ON since the in-model win: headline 6.4375 vs the r4-07
    proj-BHLD default's 5.9486 pages/sec (+8.2%, chain r5-03 A/B,
    2026-08-20; standalone probe 3.77 vs 5.04 ms at the ViT-B shape).**
    ``MMTPU_ENC_ATTN_BLF=0`` opts out (A/B hygiene); when BLF is off or
    unsupported at a site, dispatch falls through to proj-BHLD.
    Returns "tpu"/"interpret"/None."""
    import os

    if os.environ.get("MMTPU_ENC_ATTN_BLF_INTERPRET") == "1":
        return "interpret"
    if os.environ.get("MMTPU_ENC_ATTN_BLF", "1") != "0" and _on_tpu_backend():
        return "tpu"
    return None


def _ln_fuse_mode() -> Optional[str]:
    """Where the fused LayerNorm→matmul prologue can run: ``"tpu"`` when
    the Pallas kernel can lower, ``"interpret"`` under the CPU test
    override (MMTPU_LN_FUSE_INTERPRET=1), else None (XLA fallback)."""
    import os

    if os.environ.get("MMTPU_LN_FUSE_INTERPRET") == "1":
        return "interpret"
    return "tpu" if _on_tpu_backend() else None


class _LNParams(nn.Module):
    """Param holder mirroring ``nn.LayerNorm``'s tree ({scale, bias}, f32,
    ones/zeros init) without applying it — the fused prologue path needs
    the raw parameters (kernels/ln_matmul.py) while keeping checkpoints
    and hf_port maps bit-identical."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """Param holder mirroring ``nn.Dense``/``nn.DenseGeneral``'s kernel
    (and optional bias) with the same logical-partitioning metadata."""

    shape: tuple
    axes: tuple
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.with_logical_partitioning(_dense_init(), self.axes), self.shape
        )
        if not self.use_bias:
            return kernel, None
        n = int(np_prod(self.shape[1:]))
        bias = self.param("bias", nn.initializers.zeros, (n,))
        return kernel, bias


def np_prod(xs) -> int:
    out = 1
    for v in xs:
        out *= int(v)
    return out


def _on_tpu_backend() -> bool:
    import jax

    try:
        if jax.default_backend() != "tpu":
            return False
        # host-side init runs under jax.default_device(cpu) while the
        # default backend is still TPU — Pallas can't lower there
        device = jax.config.jax_default_device
        if device is not None and getattr(device, "platform", "tpu") != "tpu":
            return False
        return True
    except Exception:  # pragma: no cover
        return False


def _ln_stats_kernel_enabled() -> bool:
    """Gate for the Pallas LayerNorm-stats kernel (kernels/ln_stats.py).
    Opt-in via MMTPU_LN_STATS=1 while the in-model A/B is measured: the
    chain-12 trace shows 27 standalone XLA LN-stats reduces costing
    27.8 ms/page in the headline embed program (~29GB/s effective — the
    enc-attn custom-call boundary keeps them from fusing)."""
    import os

    return os.environ.get("MMTPU_LN_STATS") == "1"


class FastLayerNorm(nn.Module):
    """Drop-in ``nn.LayerNorm`` (param tree identical: {scale, bias})
    whose row-stats reduce runs as a Pallas kernel on TPU when enabled.

    The normalize+affine stays XLA elementwise math so it fuses into the
    consumer matmul's prologue exactly as before; only the stats reduce
    is replaced. The fallback replicates flax's arithmetic (f32
    reductions, fast-variance formula, result cast to ``dtype``)."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        # the kernel row-chunks its grid (rows are independent for LN
        # stats), so the only VMEM requirement is that SOME multiple-of-8
        # row block dividing L fits the scoped budget (pick_row_block).
        fits = False
        if x.ndim == 3 and x.shape[1] % 8 == 0:
            from multimodal_embeddings_tpu.kernels.ln_stats import pick_row_block

            fits = pick_row_block(x.shape[1], x.shape[2], x.dtype.itemsize) > 0
        use_kernel = _ln_stats_kernel_enabled() and fits and _on_tpu_backend()
        xf = x.astype(jnp.float32)
        if use_kernel:
            import os

            from multimodal_embeddings_tpu.kernels.ln_stats import ln_stats

            method = os.environ.get("MMTPU_LN_STATS_METHOD", "reduce")
            mean, rstd = ln_stats(x, eps=self.epsilon, method=method)
        else:
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0
            )
            rstd = jax.lax.rsqrt(var + self.epsilon)
        y = (xf - mean) * (rstd * scale.astype(jnp.float32))
        y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


def _flash_eligible(q, k, mask, causal) -> bool:
    """Dispatch to the Pallas flash kernel only where it wins: very long
    unmasked self-attention on TPU, where the XLA path's (B, H, L, L) f32
    logits dominate HBM. Measured at ViT-448 scale (L=785) XLA's fused
    attention is faster (113 ms vs 200 ms per 48-crop embed batch) — the
    kernel's per-program full-K/V VMEM residency and 64-wide head dim
    waste lanes — so the threshold sits above encoder scale and the
    kernel serves the long-context generation path."""
    if mask is not None:
        return False
    if q.shape[1] != k.shape[1] or q.shape[1] < _FLASH_MIN_LEN:
        return False
    return _on_tpu_backend()


# lengths-masked flash dispatch threshold: the kernel wins standalone at
# L=1608 (7.4 vs 9.2 ms) but loses inside fused programs where XLA fuses
# the head transposes away (mme5 bench 0.55 vs 0.63 p/s) — so the
# threshold matches the unmasked one and the call sites decide
_FLASH_LENGTHS_MIN_LEN = 2048


def sdpa(
    q: jnp.ndarray,  # (B, Lq, H, D)
    k: jnp.ndarray,  # (B, Lk, KVH, D)
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # (B, 1, Lq, Lk) additive or bool
    causal: bool = False,
    kv_lengths: Optional[jnp.ndarray] = None,  # (B,) valid K prefix lengths
    key_valid_len: Optional[int] = None,  # STATIC shared valid K prefix
) -> jnp.ndarray:
    """Scaled dot-product attention with GQA head-broadcast; f32 softmax.

    Long unmasked self-attention dispatches to the Pallas flash kernel
    (``kernels/flash_attention.py``) on TPU; everything else takes the XLA
    einsum path. ``kv_lengths`` expresses a per-batch VALID-PREFIX key
    mask (mutually exclusive with ``mask``): on TPU at ≥2048 tokens it
    dispatches to the flash kernel's native length masking; elsewhere it
    falls back to an equivalent boolean mask on the XLA path (test-locked
    equality). ``key_valid_len`` is the STATIC analogue — every batch row
    shares the same valid prefix (the Mllama single-tile 1601-of-1608
    pattern): at encoder scale it dispatches to the whole-row kernel's
    native prefix masking (padding L to sublanes), else it lowers to the
    same boolean mask.
    """
    if key_valid_len is not None:
        assert mask is None and kv_lengths is None and not causal, (
            "key_valid_len is mutually exclusive with mask/kv_lengths/causal"
        )
        if key_valid_len >= k.shape[1]:
            key_valid_len = None  # nothing masked — plain unmasked path
        elif _enc_attn_eligible(q, k, v, None, False, pad_to_16=True):
            from multimodal_embeddings_tpu.kernels.encoder_attention import (
                encoder_attention_padded,
            )

            return encoder_attention_padded(q, k, v, valid_len=key_valid_len)
        else:
            mask = (
                jnp.arange(k.shape[1]) < key_valid_len
            )[None, None, None, :]
            key_valid_len = None
    if kv_lengths is not None:
        assert mask is None, "kv_lengths and mask are mutually exclusive"
        if (
            not causal
            and q.shape[1] == k.shape[1]
            and q.shape[1] >= _FLASH_LENGTHS_MIN_LEN
            and _on_tpu_backend()
        ):
            from multimodal_embeddings_tpu.kernels.flash_attention import (
                flash_attention,
            )

            return flash_attention(
                q, k, v, lengths=kv_lengths, block_q=256, block_k=256
            )
        mask = (
            jnp.arange(k.shape[1])[None, :] < kv_lengths[:, None]
        )[:, None, None, :]
    if _flash_eligible(q, k, mask, causal):
        from multimodal_embeddings_tpu.kernels.flash_attention import (
            flash_attention,
        )

        return flash_attention(q, k, v, causal=causal)
    if _enc_attn_eligible(q, k, v, mask, causal):
        import os

        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            blhd_supported,
            encoder_attention,
            encoder_attention_blhd,
        )

        if os.environ.get("MMTPU_ENC_ATTN_BLHD") == "1" and blhd_supported(
            q, v
        ):
            # transpose-free BLHD variant (opt-in pending the in-model
            # A/B): kills the ~7.5 ms/page of relayout copies around the
            # BHLD call at the cost of strided slab reads
            return encoder_attention_blhd(q, k, v)
        return encoder_attention(q, k, v)

    b, lq, h, d = q.shape
    kvh = k.shape[2]
    if kvh != h and lq == 1 and not causal and (
        mask is None or mask.shape[2] == 1
    ):
        # GQA DECODE fold: the repeat path below materializes the repeated
        # K/V — rep × the ENTIRE cache per layer per step (3B decode:
        # 16q/2kv ⇒ 8 × 36 layers × (B, L, 2, 128) ≈ 9.7GB/step at
        # batch 8, the r4-08 batched-parse sublinearity). Fold the query
        # heads into the query-length axis per kv group instead — same
        # per-head dot products, K/V stream ONCE. Requires the mask to be
        # query-position-independent (decode's valid-prefix mask is).
        rep = h // kvh
        qf = q.reshape(b, lq, kvh, rep, d).transpose(0, 1, 3, 2, 4)
        qf = qf.reshape(b, lq * rep, kvh, d)
        out = sdpa(qf, k, v, mask=mask)
        out = out.reshape(b, lq, rep, kvh, d).transpose(0, 1, 3, 2, 4)
        return out.reshape(b, lq, h, d)
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # bf16 inputs materialize bf16 QK logits (the (B, H, L, L) tensor is
    # the dominant HBM write of encoder attention — trace-measured 33
    # ms/page at ViT-448 scale in f32); softmax still runs in f32 on the
    # upcast. MMTPU_F32_LOGITS=1 forces full-precision logits.
    pref = jnp.float32
    if q.dtype == jnp.bfloat16 and not _f32_logits_forced():
        pref = jnp.bfloat16
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=pref)
    if pref == jnp.bfloat16:
        # bf16 path: every (B, H, L, L)-sized tensor that XLA materializes
        # stays HALF width — masks are applied to the bf16 logits (the
        # einsum already rounded them to bf16, so masking before vs after
        # the f32 upcast is bit-identical), and the upcast+scale convert
        # duplicates into the max/exp consumers instead of materializing
        # an f32 copy (a 21.5GB transient at 11B batch-8 vision scale).
        # The exp output is materialized ONCE in bf16; normalization
        # happens after the PV matmul with an f32-accumulated denominator.
        if causal:
            causal_mask = jnp.tril(jnp.ones((lq, k.shape[1]), bool))
            logits = jnp.where(causal_mask[None, None], logits, -1e30)
        if mask is not None:
            if mask.dtype == jnp.bool_:
                logits = jnp.where(mask, logits, -1e30)
            else:
                # additive masks are biases in SCALED-logit space; the
                # scale divide happens below, so pre-multiply
                logits = logits + (mask * jnp.sqrt(d)).astype(logits.dtype)
        lf = logits.astype(jnp.float32) / jnp.sqrt(d).astype(jnp.float32)
        m = jnp.max(lf, axis=-1, keepdims=True)
        p16 = jnp.exp(lf - m).astype(v.dtype)
        denom = jnp.sum(p16, axis=-1, dtype=jnp.float32)  # (B, H, L)
        out = jnp.einsum(
            "bhlm,bmhd->blhd", p16, v, preferred_element_type=jnp.float32
        )
        out = out / denom.transpose(0, 2, 1)[..., None]
        return out.astype(v.dtype)
    logits = logits.astype(jnp.float32) / jnp.sqrt(d).astype(jnp.float32)
    if causal:
        causal_mask = jnp.tril(jnp.ones((lq, k.shape[1]), bool))
        logits = jnp.where(causal_mask[None, None], logits, -1e30)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, -1e30)
        else:
            logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v)


class Attention(nn.Module):
    """Multi-head attention with optional GQA, RoPE and cross-attention."""

    num_heads: int
    head_dim: int
    num_kv_heads: Optional[int] = None
    use_rope: bool = False
    use_qk_norm: bool = False
    rope_theta: float = 500000.0
    max_len: int = 4096
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4" (serving; models/quantized.py)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
        kv_lengths: Optional[jnp.ndarray] = None,
        key_valid_len: Optional[int] = None,  # static shared valid K prefix
        pre_ln: Optional[tuple] = None,  # (scale, bias, mode) fused prologue
    ):
        if pre_ln is not None and kv is None and not self.quantize:
            return self._fused_prologue(
                x, mask, causal, kv_lengths, pre_ln, key_valid_len
            )
        if (
            pre_ln is None
            and kv is None
            and mask is None
            and not causal
            and kv_lengths is None
            and key_valid_len is None
            and not self.use_rope
            and not self.use_qk_norm
            and not self.quantize
            and (self.num_kv_heads or self.num_heads) == self.num_heads
        ):
            l = x.shape[1]
            if _ENC_ATTN_MIN_LEN <= l <= _ENC_ATTN_MAX_LEN and l % 16 == 0 \
                    and self.head_dim <= 128:
                blf_mode = _enc_attn_blf_mode()
                if blf_mode is not None:
                    from multimodal_embeddings_tpu.kernels.encoder_attention import (  # noqa: E501
                        blf_supported,
                    )

                    if blf_supported(
                        l, self.num_heads, self.head_dim, self.head_dim,
                        self.dtype,
                    ):
                        return self._proj_blf(x, blf_mode)
                proj_mode = _enc_attn_proj_mode()
                if proj_mode is not None:
                    return self._proj_bhld(x, proj_mode)
        kv = x if kv is None else kv
        kvh = self.num_kv_heads or self.num_heads
        if self.quantize:
            from multimodal_embeddings_tpu.models.quantized import (
                quant_dense_cls,
            )

            qcls = quant_dense_cls(self.quantize)
            dense = lambda feat, name, axes: qcls(  # noqa: E731
                features=feat, axis=-1, dtype=self.dtype, name=name
            )
        else:
            dense = lambda feat, name, axes: nn.DenseGeneral(  # noqa: E731
                features=feat,
                axis=-1,
                use_bias=False,
                kernel_init=nn.with_logical_partitioning(
                    _dense_init(), (EMBED,) + axes
                ),
                dtype=self.dtype,
                name=name,
            )
        q = dense((self.num_heads, self.head_dim), "q", (HEADS, HEAD_DIM))(x)
        k = dense((kvh, self.head_dim), "k", (KV_HEADS, HEAD_DIM))(kv)
        v = dense((kvh, self.head_dim), "v", (KV_HEADS, HEAD_DIM))(kv)
        if self.use_qk_norm:
            q = RMSNorm(dtype=self.dtype, name="q_norm")(q)
            k = RMSNorm(dtype=self.dtype, name="k_norm")(k)
        if self.use_rope:
            cos, sin = rope_frequencies(self.head_dim, self.max_len, self.rope_theta)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        out = sdpa(
            q, k, v, mask=mask, causal=causal, kv_lengths=kv_lengths,
            key_valid_len=key_valid_len,
        )
        return self._out_proj(x, out)

    def _fused_prologue(
        self, x, mask, causal, kv_lengths, pre_ln, key_valid_len=None
    ):
        """Self-attention with the pre-LN fused into the q/k/v projections
        as ONE LayerNorm→matmul Pallas kernel over the concatenated
        [Wq|Wk|Wv] (kernels/ln_matmul.py). Param tree identical to the
        unfused path (_DenseParams mirrors DenseGeneral's kernel)."""
        from multimodal_embeddings_tpu.kernels.ln_matmul import ln_matmul

        scale, ln_bias, mode = pre_ln
        kvh = self.num_kv_heads or self.num_heads
        b, l, d = x.shape
        wq, _ = _DenseParams(
            (d, self.num_heads, self.head_dim), (EMBED, HEADS, HEAD_DIM), name="q"
        )()
        wk, _ = _DenseParams(
            (d, kvh, self.head_dim), (EMBED, KV_HEADS, HEAD_DIM), name="k"
        )()
        wv, _ = _DenseParams(
            (d, kvh, self.head_dim), (EMBED, KV_HEADS, HEAD_DIM), name="v"
        )()
        wcat = jnp.concatenate(
            [w.reshape(d, -1).astype(self.dtype) for w in (wq, wk, wv)], axis=-1
        )
        fused = ln_matmul(
            x.reshape(-1, d).astype(self.dtype),
            scale.astype(jnp.float32),
            ln_bias.astype(jnp.float32),
            wcat,
            interpret=(mode == "interpret"),
        )
        nq = self.num_heads * self.head_dim
        nk = kvh * self.head_dim
        q = fused[:, :nq].reshape(b, l, self.num_heads, self.head_dim)
        k = fused[:, nq : nq + nk].reshape(b, l, kvh, self.head_dim)
        v = fused[:, nq + nk :].reshape(b, l, kvh, self.head_dim)
        if self.use_qk_norm:
            q = RMSNorm(dtype=self.dtype, name="q_norm")(q)
            k = RMSNorm(dtype=self.dtype, name="k_norm")(k)
        if self.use_rope:
            cos, sin = rope_frequencies(self.head_dim, self.max_len, self.rope_theta)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        out = sdpa(
            q, k, v, mask=mask, causal=causal, kv_lengths=kv_lengths,
            key_valid_len=key_valid_len,
        )
        return self._out_proj(x, out)

    def _proj_bhld(self, x, mode):
        """Self-attention with q/k/v projected DIRECTLY to (B, H, L, D)
        and the whole-row kernel consuming the slab without head
        transposes (``encoder_attention(bhld_inputs=True)``); the out
        projection contracts straight from (B, H, L, Dv). Param tree
        identical to the default path (_DenseParams mirrors
        DenseGeneral's kernel)."""
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention,
        )

        d_model = x.shape[-1]
        h, hd = self.num_heads, self.head_dim
        wq, _ = _DenseParams(
            (d_model, h, hd), (EMBED, HEADS, HEAD_DIM), name="q"
        )()
        wk, _ = _DenseParams(
            (d_model, h, hd), (EMBED, KV_HEADS, HEAD_DIM), name="k"
        )()
        wv, _ = _DenseParams(
            (d_model, h, hd), (EMBED, KV_HEADS, HEAD_DIM), name="v"
        )()
        xd = x.astype(self.dtype)
        q = jnp.einsum("blc,chd->bhld", xd, wq.astype(self.dtype))
        k = jnp.einsum("blc,chd->bhld", xd, wk.astype(self.dtype))
        v = jnp.einsum("blc,chd->bhld", xd, wv.astype(self.dtype))
        o = encoder_attention(
            q, k, v, bhld_inputs=True, interpret=(mode == "interpret")
        )
        wo, _ = _DenseParams(
            (h, hd, d_model), (HEADS, HEAD_DIM, EMBED), name="o"
        )()
        return jnp.einsum("bhld,hdc->blc", o, wo.astype(self.dtype))

    def _proj_blf(self, x, mode):
        """Self-attention with q/k/v as PLAIN matmuls to (B, L, H·D) and
        the lane-folded kernel reading per-head views as static lane
        slices (``encoder_attention_blf``) — zero transposes end to end:
        unlike ``_proj_bhld`` (whose projection einsum writes a
        (B, H, L, D) layout), every GEMM here keeps its natural output
        layout. Param tree identical to the default path (the reshape of
        DenseGeneral's (C, H, D) kernel to (C, H·D) is a view)."""
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blf,
        )

        d_model = x.shape[-1]
        h, hd = self.num_heads, self.head_dim
        wq, _ = _DenseParams(
            (d_model, h, hd), (EMBED, HEADS, HEAD_DIM), name="q"
        )()
        wk, _ = _DenseParams(
            (d_model, h, hd), (EMBED, KV_HEADS, HEAD_DIM), name="k"
        )()
        wv, _ = _DenseParams(
            (d_model, h, hd), (EMBED, KV_HEADS, HEAD_DIM), name="v"
        )()
        xd = x.astype(self.dtype)
        q = xd @ wq.reshape(d_model, h * hd).astype(self.dtype)
        k = xd @ wk.reshape(d_model, h * hd).astype(self.dtype)
        v = xd @ wv.reshape(d_model, h * hd).astype(self.dtype)
        o = encoder_attention_blf(
            q, k, v, heads=h, interpret=(mode == "interpret")
        )
        wo, _ = _DenseParams(
            (h, hd, d_model), (HEADS, HEAD_DIM, EMBED), name="o"
        )()
        return o @ wo.reshape(h * hd, d_model).astype(self.dtype)

    def _out_proj(self, x, out):
        if self.quantize:
            from multimodal_embeddings_tpu.models.quantized import (
                quant_dense_cls,
            )

            return quant_dense_cls(self.quantize)(
                features=x.shape[-1], axis=(-2, -1), dtype=self.dtype, name="o"
            )(out)
        return nn.DenseGeneral(
            features=x.shape[-1],
            axis=(-2, -1),
            use_bias=False,
            kernel_init=nn.with_logical_partitioning(
                _dense_init(), (HEADS, HEAD_DIM, EMBED)
            ),
            dtype=self.dtype,
            name="o",
        )(out)


class SwiGLU(nn.Module):
    hidden_dim: int
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4"

    @nn.compact
    def __call__(self, x):
        if self.quantize:
            from multimodal_embeddings_tpu.models.quantized import (
                quant_dense_cls,
            )

            qcls = quant_dense_cls(self.quantize)
            dense = lambda feat, name, axes: qcls(  # noqa: E731
                features=feat, dtype=self.dtype, name=name
            )
        else:
            dense = lambda feat, name, axes: nn.Dense(  # noqa: E731
                feat,
                use_bias=False,
                kernel_init=nn.with_logical_partitioning(_dense_init(), axes),
                dtype=self.dtype,
                name=name,
            )
        gate = dense(self.hidden_dim, "gate", (EMBED, MLP))(x)
        up = dense(self.hidden_dim, "up", (EMBED, MLP))(x)
        return dense(x.shape[-1], "down", (MLP, EMBED))(nn.silu(gate) * up)


class GeluMLP(nn.Module):
    hidden_dim: int
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4"

    @nn.compact
    def __call__(self, x, pre_ln: Optional[tuple] = None):
        if pre_ln is not None and not self.quantize:
            from multimodal_embeddings_tpu.kernels.ln_matmul import ln_matmul

            scale, ln_bias, mode = pre_ln
            d = x.shape[-1]
            w1, b1 = _DenseParams(
                (d, self.hidden_dim), (EMBED, MLP), use_bias=True, name="fc1"
            )()
            h = ln_matmul(
                x.reshape(-1, d).astype(self.dtype),
                scale.astype(jnp.float32),
                ln_bias.astype(jnp.float32),
                w1.astype(self.dtype),
                bias=b1.astype(self.dtype),
                interpret=(mode == "interpret"),
            ).reshape(*x.shape[:-1], self.hidden_dim)
            h = nn.gelu(h, approximate=True)
            return nn.Dense(
                d,
                kernel_init=nn.with_logical_partitioning(_dense_init(), (MLP, EMBED)),
                dtype=self.dtype,
                name="fc2",
            )(h)
        if self.quantize:
            from multimodal_embeddings_tpu.models.quantized import (
                quant_dense_cls,
            )

            qcls = quant_dense_cls(self.quantize)
            dense = lambda feat, name, axes: qcls(  # noqa: E731
                features=feat, use_bias=True, dtype=self.dtype, name=name
            )
        else:
            dense = lambda feat, name, axes: nn.Dense(  # noqa: E731
                feat,
                kernel_init=nn.with_logical_partitioning(_dense_init(), axes),
                dtype=self.dtype,
                name=name,
            )
        h = dense(self.hidden_dim, "fc1", (EMBED, MLP))(x)
        h = nn.gelu(h, approximate=True)
        return dense(x.shape[-1], "fc2", (MLP, EMBED))(h)


class EncoderBlock(nn.Module):
    """Pre-LN ViT/BERT-style block (LayerNorm + MHA + GELU MLP).

    ``fuse_ln`` routes pre-LNs through the fused LayerNorm→matmul Pallas
    prologue (``kernels/ln_matmul.py``) on TPU, eliminating the
    normalized-activation HBM round trip before the projection. Values:
    ``False`` (off), ``True`` (both sites), ``"attn"`` / ``"mlp"``
    (one site — the measured win is site-dependent: the mme5 tower's
    fc1 site gains 16%, its qkv site loses; see ROADMAP). The param
    tree is identical either way, and non-TPU backends silently fall
    back to the unfused path."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4"
    fuse_ln: Any = False  # False | True | "attn" | "mlp"

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jnp.ndarray] = None,
        kv_lengths: Optional[jnp.ndarray] = None,
        key_valid_len: Optional[int] = None,
    ):
        d = x.shape[-1]
        mode = _ln_fuse_mode() if self.fuse_ln and not self.quantize else None
        fuse = mode is not None and x.dtype == jnp.bfloat16 and d % 128 == 0
        fuse_attn = fuse and self.fuse_ln in (True, "attn")
        fuse_mlp = fuse and self.fuse_ln in (True, "mlp")
        attn = Attention(
            num_heads=self.num_heads,
            head_dim=d // self.num_heads,
            dtype=self.dtype,
            quantize=self.quantize,
            name="attn",
        )
        mlp = GeluMLP(
            int(d * self.mlp_ratio),
            dtype=self.dtype,
            quantize=self.quantize,
            name="mlp",
        )
        if fuse_attn:
            scale1, bias1 = _LNParams(d, name="ln1")()
            h = attn(
                x, mask=mask, kv_lengths=kv_lengths,
                key_valid_len=key_valid_len, pre_ln=(scale1, bias1, mode),
            )
        else:
            h = FastLayerNorm(dtype=self.dtype, name="ln1")(x)
            h = attn(
                h, mask=mask, kv_lengths=kv_lengths,
                key_valid_len=key_valid_len,
            )
        x = x + h
        if fuse_mlp:
            scale2, bias2 = _LNParams(d, name="ln2")()
            h = mlp(x, pre_ln=(scale2, bias2, mode))
        else:
            h = FastLayerNorm(dtype=self.dtype, name="ln2")(x)
            h = mlp(h)
        return x + h


class GatedEncoderBlock(nn.Module):
    """Mllama global-transformer layer: each residual branch is tanh-gated
    separately (``x += tanh(gate_attn)·attn; x += tanh(gate_ffn)·mlp``)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4"

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jnp.ndarray] = None,
        kv_lengths: Optional[jnp.ndarray] = None,
        key_valid_len: Optional[int] = None,
    ):
        d = x.shape[-1]
        gate_attn = self.param("gate_attn", nn.initializers.zeros, (1,))
        gate_ffn = self.param("gate_ffn", nn.initializers.zeros, (1,))
        h = FastLayerNorm(dtype=self.dtype, name="ln1")(x)
        h = Attention(
            num_heads=self.num_heads,
            head_dim=d // self.num_heads,
            dtype=self.dtype,
            quantize=self.quantize,
            name="attn",
        )(h, mask=mask, kv_lengths=kv_lengths, key_valid_len=key_valid_len)
        x = x + jnp.tanh(gate_attn) * h
        h = FastLayerNorm(dtype=self.dtype, name="ln2")(x)
        h = GeluMLP(
            int(d * self.mlp_ratio),
            dtype=self.dtype,
            quantize=self.quantize,
            name="mlp",
        )(h)
        return x + jnp.tanh(gate_ffn) * h


class LlamaBlock(nn.Module):
    """Llama-3 decoder block: RMSNorm + GQA-RoPE attention + SwiGLU."""

    num_heads: int
    num_kv_heads: int
    head_dim: int
    mlp_hidden: int
    max_len: int = 4096
    rope_theta: float = 500000.0
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        h = RMSNorm(dtype=self.dtype, name="attn_norm")(x)
        h = Attention(
            num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            use_rope=True,
            max_len=self.max_len,
            rope_theta=self.rope_theta,
            dtype=self.dtype,
            quantize=self.quantize,
            name="attn",
        )(h, mask=mask, causal=True)
        x = x + h
        h = RMSNorm(dtype=self.dtype, name="mlp_norm")(x)
        h = SwiGLU(
            self.mlp_hidden, dtype=self.dtype, quantize=self.quantize, name="mlp"
        )(h)
        return x + h


class CrossAttentionBlock(nn.Module):
    """Mllama-style gated cross-attention decoder block: the text stream
    attends to vision states through tanh-gated residuals."""

    num_heads: int
    num_kv_heads: int
    head_dim: int
    mlp_hidden: int
    dtype: Any = jnp.float32
    quantize: Any = False  # False | True/"int8" | "int4"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        vision_states: jnp.ndarray,
        cross_mask: Optional[jnp.ndarray] = None,
    ):
        attn_gate = self.param("attn_gate", nn.initializers.zeros, (1,))
        mlp_gate = self.param("mlp_gate", nn.initializers.zeros, (1,))
        h = RMSNorm(dtype=self.dtype, name="attn_norm")(x)
        h = Attention(
            num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            use_qk_norm=True,
            dtype=self.dtype,
            quantize=self.quantize,
            name="cross_attn",
        )(h, kv=vision_states, mask=cross_mask)
        x = x + jnp.tanh(attn_gate) * h
        h = RMSNorm(dtype=self.dtype, name="mlp_norm")(x)
        h = SwiGLU(
            self.mlp_hidden, dtype=self.dtype, quantize=self.quantize, name="mlp"
        )(h)
        return x + jnp.tanh(mlp_gate) * h


def last_token_pool(
    hidden: jnp.ndarray, attention_mask: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """The mmE5 embedding contract (``embedder.py:17-34``): take the hidden
    state at index ``sum(attention_mask) - 1`` per row, optionally
    L2-normalize."""
    idx = jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1
    pooled = jnp.take_along_axis(
        hidden, idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    if normalize:
        pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True).clip(1e-12)
    return pooled
