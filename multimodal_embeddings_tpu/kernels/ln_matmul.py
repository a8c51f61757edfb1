"""Fused LayerNorm→matmul prologue as a Pallas TPU kernel.

Every pre-LN transformer block in the pipeline (``models/transformer.py``
``EncoderBlock``: ln1→q/k/v, ln2→mlp.fc1) materializes the normalized
activations in HBM between the LayerNorm fusion and the projection matmul
— at ViT-B/448 fused-page scale that is a (48·784, 768) bf16 tensor
(~55 MB) written and re-read per LN site, ~24 sites/page. This kernel
computes the row statistics in-register and feeds normalized tiles
straight into the MXU dot, eliminating the round trip.

Replaces the torch ``nn.LayerNorm → nn.Linear`` sequences inside the
reference's HF model stack (e.g. the mmE5 Mllama vision tower,
``/root/reference/deprecated_package/embedder.py:124-137``) with a fused
TPU-native prologue. Grid is (M-blocks, N-blocks), N innermost: the x
block stays VMEM-resident across the N sweep (same index map), and the
LN is recomputed per N block on the VPU — ~0.8% of the dot's FLOPs, free
next to the MXU work.

Numerics: statistics and scale/shift in f32 (matching
``flax.linen.LayerNorm`` with the model's bf16 compute dtype: normalize
in f32, cast to bf16, then a bf16 MXU dot with f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_mm_kernel(x_ref, g_ref, b_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (BM, K)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.dot(
        xn.astype(x_ref.dtype), w_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _ln_mm_bias_kernel(x_ref, g_ref, b_ref, w_ref, d_ref, o_ref, *, eps: float):
    """Variant with the projection's own bias fused into the epilogue
    (flax ``nn.Dense(use_bias=True)``: bias added in the compute dtype
    after the dot)."""
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    acc = jnp.dot(
        xn.astype(x_ref.dtype), w_ref[...], preferred_element_type=jnp.float32
    )
    o_ref[...] = (
        acc.astype(o_ref.dtype) + d_ref[...].astype(o_ref.dtype)
    )


def _pad_rows(x, m_pad):
    if m_pad == x.shape[0]:
        return x
    return jnp.pad(x, ((0, m_pad - x.shape[0]), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "eps", "interpret")
)
def ln_matmul(
    x: jnp.ndarray,  # (M, K)
    gamma: jnp.ndarray,  # (K,)
    beta: jnp.ndarray,  # (K,)
    w: jnp.ndarray,  # (K, N)
    bias: jnp.ndarray | None = None,  # (N,) projection bias
    block_m: int = 256,
    block_n: int = 512,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """``LayerNorm(x; gamma, beta) @ w [+ bias]`` in one kernel → (M, N)
    in x.dtype.

    K must be lane-aligned (a multiple of 128 — true for every model dim
    in the pipeline); M and N are padded internally to the block sizes.
    """
    m, k = x.shape
    n = w.shape[1]
    assert w.shape[0] == k, (x.shape, w.shape)
    assert k % 128 == 0, f"K={k} must be lane-aligned"
    bn = min(block_n, n)
    bm = min(block_m, m)
    m_pad = int((m + bm - 1) // bm * bm)
    n_pad = int((n + bn - 1) // bn * bn)
    xp = _pad_rows(x, m_pad)
    wp = w if n_pad == n else jnp.pad(w, ((0, 0), (0, n_pad - n)))

    x_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    operands = [xp, gamma.reshape(1, k), beta.reshape(1, k), wp]
    in_specs = [x_spec, vec_spec, vec_spec, w_spec]
    kernel = _ln_mm_kernel
    if bias is not None:
        bp = bias if n_pad == n else jnp.pad(bias, (0, n_pad - n))
        operands.append(bp.reshape(1, n_pad))
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        )
        kernel = _ln_mm_bias_kernel

    out = pl.pallas_call(
        functools.partial(kernel, eps=eps),
        grid=(m_pad // bm, n_pad // bn),  # N innermost: x block stays resident
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        interpret=interpret,
    )(*operands)
    return out[:m, :n]
