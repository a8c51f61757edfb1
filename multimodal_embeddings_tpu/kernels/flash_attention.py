"""Blockwise flash attention as a Pallas TPU kernel.

The reference leans on flash-attn CUDA for its Qwen2.5-VL stretch path
(notebook cell ``39512aca``); this is the TPU equivalent: online-softmax
blockwise attention that never materializes the (L, L) score matrix,
streaming K/V blocks through VMEM with f32 running max/sum accumulators.

Layout: q/k/v are (batch*heads, L, D); the grid walks (bh, q_block) and an
inner ``fori_loop`` streams K/V blocks. Supports causal masking and a
padding length. Falls back to the XLA ``sdpa`` for shapes below the block
size (where a kernel has no advantage).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(
    q_ref,  # (1, BQ, Dk)
    k_ref,  # (1, L, Dk)
    v_ref,  # (1, L, Dv)
    len_ref,  # (B*H, 1) valid K lengths in SMEM (unblocked)
    o_ref,  # (1, BQ, Dv)
    *,
    block_k: int,
    causal: bool,
    sm_scale: float,
):
    q_block_idx = pl.program_id(1)
    bq = q_ref.shape[1]
    dv = v_ref.shape[2]
    l = k_ref.shape[1]
    n_kblocks = l // block_k

    # Dots run in the INPUT precision (bf16 inputs → bf16 MXU mode with f32
    # accumulation; an f32 upcast before the dot forces the 4×-slower f32
    # MXU path). sm_scale is applied to the f32 scores, not to bf16 q.
    mxu_dtype = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32
    q = q_ref[0].astype(mxu_dtype)  # (BQ, Dk)
    valid_len = len_ref[pl.program_id(0), 0]

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    s0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, dv), jnp.float32)

    q_positions = q_block_idx * bq + jax.lax.broadcasted_iota(
        jnp.int32, (bq, block_k), 0
    )

    def body(kb, carry):
        m_prev, s_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(mxu_dtype)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(mxu_dtype)
        scores = (
            jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
        )  # (BQ, BK) f32

        k_positions = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1
        )
        mask = k_positions < valid_len
        if causal:
            mask &= k_positions <= q_positions
        scores = jnp.where(mask, scores, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        s_new = s_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jnp.dot(
            p.astype(mxu_dtype), v, preferred_element_type=jnp.float32
        )
        return m_new, s_new, acc

    if causal:
        # only stream K blocks at or before this Q block
        last = (q_block_idx + 1) * bq
        n_needed = (last + block_k - 1) // block_k
        upper = jnp.minimum(n_needed, n_kblocks)
    else:
        upper = n_kblocks
    m, s, acc = jax.lax.fori_loop(0, upper, body, (m0, s0, acc0))
    o_ref[0] = (acc / jnp.maximum(s, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, length, axis):
    pad = length - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,  # (B, L, H, Dk)
    k: jnp.ndarray,  # (B, L, KVH, Dk)
    v: jnp.ndarray,  # (B, L, KVH, Dv)
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid K lengths
    causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention with GQA broadcast, padding mask, and independent
    Q/K vs V head dims (PSA-style attention uses Dk != Dv).

    Returns (B, L, H, Dv) in q's dtype. L is padded internally to the block
    size; ``lengths`` masks padded keys (defaults to full length).
    """
    b, l, h, dk = q.shape
    dv = v.shape[3]
    kvh = k.shape[2]
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    if lengths is None:
        lengths = jnp.full((b,), l, jnp.int32)

    unit = math.lcm(block_q, block_k)
    l_pad = int(math.ceil(l / unit) * unit)
    # (B, L, H, D) → (B*H, L, D)
    def to_bh(x, d):
        x = _pad_to(x, l_pad, axis=1)
        return x.transpose(0, 2, 1, 3).reshape(b * h, l_pad, d)

    qb, kb, vb = to_bh(q, dk), to_bh(k, dk), to_bh(v, dv)
    len_bh = jnp.repeat(lengths.astype(jnp.int32), h).reshape(b * h, 1)

    sm_scale = 1.0 / math.sqrt(dk)
    n_qblocks = l_pad // block_q

    grid = (b * h, n_qblocks)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, causal=causal, sm_scale=sm_scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, dk), lambda bh, qb_: (bh, qb_, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, l_pad, dk), lambda bh, qb_: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, l_pad, dv), lambda bh, qb_: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths, unblocked
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dv), lambda bh, qb_: (bh, qb_, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, dv), q.dtype),
        interpret=interpret,
    )(qb, kb, vb, len_bh)

    out = out.reshape(b, h, l_pad, dv).transpose(0, 2, 1, 3)
    return out[:, :l]


def _flash_kernel_v2(
    q_ref,  # (1, L, Dk)
    k_ref,  # (1, L, Dk)
    v_ref,  # (1, L, Dv)
    len_ref,  # (B*H, 1) SMEM
    o_ref,  # (1, L, Dv)
    *,
    block_q: int,
    block_k: int,
    causal: bool,
    sm_scale: float,
):
    """One program per batch-head: K/V are resident for ALL q-blocks, so
    HBM traffic per (batch, head) is one K/V read instead of one per
    q-block. Measured round 3 (scripts/attn_candidates_results.json):
    still LOSES to the XLA bf16-logits path at encoder scale (13.3 vs
    6.4 ms at B48 L784 H12 D64; 10.2 vs 5.6 ms at B8 L1608 H16 D80) —
    the head transposes at the kernel boundary stay materialized. It wins
    12x at the masked 6432-token 4-tile shape (32.7 vs 407 ms), but short
    tile stacks (models/mme5.py) removed that shape from the serving
    path; kept for long-context generation and future shapes."""
    l = k_ref.shape[1]
    dv = v_ref.shape[2]
    n_qblocks = l // block_q
    n_kblocks = l // block_k
    valid_len = len_ref[pl.program_id(0), 0]
    # bf16 inputs → bf16 MXU dots with f32 accumulation (see _flash_kernel)
    mxu_dtype = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32

    def q_body(qb, _):
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(mxu_dtype)
        q_positions = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )

        def k_body(kb, carry):
            m_prev, s_prev, acc = carry
            k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(mxu_dtype)
            v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(mxu_dtype)
            scores = (
                jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
            )
            k_positions = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = k_positions < valid_len
            if causal:
                mask &= k_positions <= q_positions
            scores = jnp.where(mask, scores, NEG_INF)
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
            correction = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)
            s_new = s_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * correction + jnp.dot(
                p.astype(mxu_dtype), v, preferred_element_type=jnp.float32
            )
            return m_new, s_new, acc

        if causal:
            upper = jnp.minimum((qb * block_q + block_q + block_k - 1) // block_k, n_kblocks)
        else:
            upper = n_kblocks
        m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
        s0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, dv), jnp.float32)
        m, s, acc = jax.lax.fori_loop(0, upper, k_body, (m0, s0, acc0))
        o_ref[0, pl.ds(qb * block_q, block_q), :] = (
            acc / jnp.maximum(s, 1e-30)
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_qblocks, q_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret"),
)
def flash_attention_v2(
    q: jnp.ndarray,  # (B, L, H, Dk)
    k: jnp.ndarray,
    v: jnp.ndarray,  # (B, L, KVH, Dv)
    lengths: Optional[jnp.ndarray] = None,
    causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """K/V-resident flash attention (see ``_flash_kernel_v2``). Same
    numerics/contract as ``flash_attention``; preferable whenever one
    (L, Dk+2·Dv) working set fits VMEM (true through multi-thousand-token
    encoders)."""
    b, l, h, dk = q.shape
    dv = v.shape[3]
    kvh = k.shape[2]
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if lengths is None:
        lengths = jnp.full((b,), l, jnp.int32)

    unit = math.lcm(block_q, block_k)
    l_pad = int(math.ceil(l / unit) * unit)

    def to_bh(x, d):
        x = _pad_to(x, l_pad, axis=1)
        return x.transpose(0, 2, 1, 3).reshape(b * h, l_pad, d)

    qb, kb, vb = to_bh(q, dk), to_bh(k, dk), to_bh(v, dv)
    len_bh = jnp.repeat(lengths.astype(jnp.int32), h).reshape(b * h, 1)
    sm_scale = 1.0 / math.sqrt(dk)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_v2,
            block_q=block_q,
            block_k=block_k,
            causal=causal,
            sm_scale=sm_scale,
        ),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, l_pad, dk), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, dk), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, dv), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, l_pad, dv), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, dv), q.dtype),
        interpret=interpret,
    )(qb, kb, vb, len_bh)
    out = out.reshape(b, h, l_pad, dv).transpose(0, 2, 1, 3)
    return out[:, :l]
