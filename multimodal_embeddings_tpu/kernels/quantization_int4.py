"""Weight-only int4 quantization kernels (Pallas TPU).

The reference's flagship document-parsing configuration loads
Qwen2.5-VL-32B with **4-bit** quantization
(``QWEN2_5_document_parsing.ipynb`` cell ``39512aca``:
``BitsAndBytesConfig(load_in_4bit=True)``; the 7B variant uses 8-bit).
This module is the TPU-native counterpart: symmetric group-wise int4
weight storage (two values per byte, packed on the host) with per-group
per-output-channel f32 scales, dequantized inside a Pallas matmul so the
bf16 weight copy never exists in HBM. 32B decoder weights drop from
~64GB (bf16) / ~32GB (int8) to **~16GB packed int4** — a 2-stage
pipeline instead of int8's 4 stages (see SCALING.md fit math).

Layout
------
A ``(K, N)`` weight quantizes in groups of ``G`` rows (default 128, the
standard weight-only group size; falls back to one group when ``K < G``
or ``K % G != 0``). Within each group the first ``G/2`` rows live in the
low nibbles and the last ``G/2`` rows in the high nibbles of a
``(G/2, N)`` uint8 block, so the in-kernel unpack is two shifts + one
sublane concatenate (no interleave relayout). Nibbles store ``q + 8``
(offset binary, q ∈ [-8, 7]).

The Pallas kernel walks one group per k-step: unpack → bf16 → MXU dot →
scale the f32 partial product by the group's ``(1, N)`` scale row. The
off-TPU fallback dequantizes in f32 (matching the kernel's f32
accumulator rounding) and lets XLA fuse the matmul.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_embeddings_tpu.kernels.quantization import _on_tpu, _pad_to


class Q4Tensor(NamedTuple):
    """Packed int4 values + per-(group, output-channel) scales.

    ``packed``: uint8 ``(K//2, N)`` — two offset-binary nibbles per byte.
    ``scale``: f32 ``(n_groups, N)``; group size ``G = K // n_groups``.
    """

    packed: jnp.ndarray
    scale: jnp.ndarray


def int4_group_size(k: int, group_size: int = 128) -> int:
    """The scale-group size actually used for a ``K``-row weight: the
    requested ``group_size`` when it divides ``K``, else one group."""
    if k % 2:
        raise ValueError(f"int4 packing needs an even contraction dim, got {k}")
    if k >= group_size and k % group_size == 0 and group_size % 2 == 0:
        return group_size
    return k


def quantize_tensor_int4(
    w: jnp.ndarray, group_size: int = 128
) -> Q4Tensor:
    """Symmetric group-wise int4 quantization of a 2-D ``(K, N)`` weight.

    ``q = clip(round(w / scale), -8, 7)`` with ``scale = max|w|_group / 7``;
    stored as offset-binary nibbles (``q + 8``) packed two-per-byte with
    the group's first half in low nibbles (see module docstring).
    """
    if w.ndim != 2:
        raise ValueError(f"expected a 2-D weight, got shape {w.shape}")
    k, n = w.shape
    g = int4_group_size(k, group_size)
    n_groups = k // g
    wg = w.astype(jnp.float32).reshape(n_groups, g, n)
    amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)  # (n_groups, 1, N)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -8, 7).astype(jnp.int32) + 8
    lo = q[:, : g // 2, :]
    hi = q[:, g // 2 :, :]
    packed = (lo | (hi << 4)).astype(jnp.uint8).reshape(k // 2, n)
    return Q4Tensor(packed=packed, scale=scale.reshape(n_groups, n))


def unpack_int4(qt: Q4Tensor) -> jnp.ndarray:
    """Offset-binary unpack to signed int32 values in [-8, 7], ``(K, N)``."""
    k2, n = qt.packed.shape
    n_groups = qt.scale.shape[0]
    g2 = k2 // n_groups
    p = qt.packed.reshape(n_groups, g2, n).astype(jnp.int32)
    lo = (p & 15) - 8
    hi = (p >> 4) - 8
    return jnp.concatenate([lo, hi], axis=1).reshape(2 * k2, n)


def dequantize_int4(qt: Q4Tensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """``(K, N)`` dequantized weight; f32 scale multiply, then cast."""
    k2, n = qt.packed.shape
    n_groups = qt.scale.shape[0]
    vals = unpack_int4(qt).reshape(n_groups, -1, n).astype(jnp.float32)
    w = vals * qt.scale.reshape(n_groups, 1, n)
    return w.reshape(2 * k2, n).astype(dtype)


# ---------------------------------------------------------------------------
# int4 weight matmul
# ---------------------------------------------------------------------------


def _mm4_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, n_kb: int, gs: int, g: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # unpack in VMEM: two shifts + one sublane concat per group; the bf16
    # copy of each weight group only ever exists in registers feeding the
    # MXU. ``gs`` groups per k-step (static unroll) amortize per-step
    # overhead — one group per step ran the K=4096 text matmuls as 32
    # 8KB-block steps, the int4-slower-than-int8 pathology (chain 10).
    acc = acc_ref[...]
    for t in range(gs):
        p = p_ref[t * (g // 2) : (t + 1) * (g // 2)].astype(jnp.int32)
        lo = ((p & 15) - 8).astype(jnp.bfloat16)
        hi = ((p >> 4) - 8).astype(jnp.bfloat16)
        w = jnp.concatenate([lo, hi], axis=0)
        part = jnp.dot(
            x_ref[:, t * g : (t + 1) * g].astype(jnp.bfloat16),
            w,
            preferred_element_type=jnp.float32,
        )
        # scale block is (gs, 1, block_n): 3-D so its (sublane, lane)
        # dims satisfy Mosaic's (8, 128)-divisible-or-full rule for
        # every group count
        acc = acc + part * s_ref[t].astype(jnp.float32)
    acc_ref[...] = acc

    @pl.when(kb == n_kb - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def pick_blocks4(m: int, k: int, n: int, n_groups: int) -> tuple[int, int, int]:
    """(block_m, block_n, groups_per_step) for the int4 matmul, mirroring
    the int8 ``pick_blocks`` lesson (chain 19: whole-K × wide-N blocks
    beat tiny ones by 31-56% — per-grid-step overhead dominates): stream
    ≥512-wide N blocks and cover 8 scale groups (K=1024) per k-step."""
    if n % 128 or k < 512 or n_groups < 2:
        return 128, 128, 1
    gs = 1
    for cand in (8, 4, 2):
        if n_groups % cand == 0:
            gs = cand
            break
    return 128, min(512, n), gs


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_m", "block_n", "groups_per_step")
)
def int4_matmul(
    x: jnp.ndarray,  # (M, K) bf16/f32
    packed: jnp.ndarray,  # (K//2, N) uint8
    scale: jnp.ndarray,  # (n_groups, N) f32
    *,
    interpret: bool | None = None,
    block_m: int = 128,
    block_n: int = 128,
    groups_per_step: int = 1,
) -> jnp.ndarray:
    """``x @ dequant(packed, scale)`` — ``groups_per_step`` scale groups
    per k-step (must divide the group count)."""
    if interpret is None:
        interpret = not _on_tpu()
    out_dtype = x.dtype
    m, k = x.shape
    n = packed.shape[1]
    n_groups = scale.shape[0]
    g = k // n_groups
    assert g * n_groups == k and g % 2 == 0, (k, n_groups)
    gs = groups_per_step
    assert n_groups % gs == 0, (n_groups, gs)

    block_m = min(block_m, max(8, 1 << (m - 1).bit_length()))
    xp = _pad_to(x, 0, block_m)
    pp = _pad_to(packed, 1, block_n)
    # (n_groups, 1, N): a (gs, 1, block_n) block's trailing two dims are
    # (1, block_n) with the sublane dim FULL — Mosaic rejects (1, block_n)
    # blocks of a 2-D (n_groups, N) array when n_groups > 1
    sp = _pad_to(scale, 1, block_n).reshape(n_groups, 1, -1)
    mp = xp.shape[0]
    np_ = pp.shape[1]

    out = pl.pallas_call(
        functools.partial(_mm4_kernel, n_kb=n_groups // gs, gs=gs, g=g),
        grid=(mp // block_m, np_ // block_n, n_groups // gs),
        in_specs=[
            pl.BlockSpec((block_m, g * gs), lambda i, j, kb: (i, kb)),
            pl.BlockSpec(((g // 2) * gs, block_n), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((gs, 1, block_n), lambda i, j, kb: (kb, 0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kb: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, pp, sp)
    return out[:m, :n]


def int4_apply(
    x: jnp.ndarray, qt: Q4Tensor, *, use_kernel: bool | None = None
) -> jnp.ndarray:
    """Apply a packed int4 2-D weight to the last axis of ``x``.

    ``use_kernel=None`` auto-selects: Pallas on TPU, XLA dequant-matmul
    elsewhere. Both paths dequantize in f32, so the CPU path the parity
    tests lock shares the TPU path's rounding behavior.
    """
    if use_kernel is None:
        use_kernel = _on_tpu()
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if use_kernel:
        bm, bn, gs = pick_blocks4(
            x2.shape[0], 2 * qt.packed.shape[0], qt.packed.shape[1],
            qt.scale.shape[0],
        )
        out = int4_matmul(
            x2,
            qt.packed,
            qt.scale,
            interpret=False,
            block_m=bm,
            block_n=bn,
            groups_per_step=gs,
        )
    else:
        out = x2 @ dequantize_int4(qt, x.dtype)
    return out.reshape(*lead, qt.packed.shape[-1])
