"""Weight-only int8 quantization kernels (Pallas TPU).

The serving path for the reference's full-size embedder
(``intfloat/mmE5-mllama-11b-instruct``, loaded bf16-per-GPU at
``deprecated_package/embedder.py:73-83``) does not fit one 16GB v5e chip
in bf16 (~22GB). Weight-only int8 halves both HBM capacity and weight
bandwidth: parameters are stored as int8 with per-output-channel f32
scales and dequantized inside the matmul kernel — the bf16 copy never
exists in HBM.

Three pieces:

* :func:`quantize_tensor` — symmetric per-channel scales (host or traced),
  deterministic round-to-nearest.
* :func:`stochastic_round_quantize` — Pallas kernel using the TPU PRNG
  (``pltpu.prng_random_bits``): unbiased rounding for quantized training /
  repeated requantization (E[q·scale] = w).
* :func:`int8_matmul` — tiled Pallas matmul ``bf16 × int8 → bf16`` with
  f32 accumulation; int8 tiles convert to bf16 in VMEM registers feeding
  the MXU. Falls back to an XLA dequant-matmul off-TPU (and under
  ``interpret=True`` for CPU tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QTensor(NamedTuple):
    """int8 values + per-output-channel scales (a jax pytree)."""

    q: jnp.ndarray  # int8, same shape as the source tensor
    scale: jnp.ndarray  # f32, source shape with contraction axes reduced to 1


def _on_tpu() -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
        device = jax.config.jax_default_device
        return device is None or getattr(device, "platform", "tpu") == "tpu"
    except Exception:  # pragma: no cover
        return False


def compute_scale(w: jnp.ndarray, contract_axes: Sequence[int]) -> jnp.ndarray:
    """Symmetric per-channel scale: max|w| over the contraction axes / 127."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=tuple(contract_axes), keepdims=True)
    return jnp.maximum(amax, 1e-8) / 127.0


def quantize_tensor(w: jnp.ndarray, contract_axes: Sequence[int] = (0,)) -> QTensor:
    """Deterministic symmetric int8 quantization (round-to-nearest-even)."""
    scale = compute_scale(w, contract_axes)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale)


def dequantize(qt: QTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qt.q.astype(jnp.float32) * qt.scale).astype(dtype)


# ---------------------------------------------------------------------------
# Stochastic rounding (Pallas, TPU PRNG)
# ---------------------------------------------------------------------------


def _sr_kernel(w_ref, scale_ref, u_ref, q_ref):
    # uniforms arrive as an input (jax.random threefry): the TPU interpret
    # mode used by the CPU test mesh returns zeros from the on-chip PRNG,
    # and quantization is a one-time conversion pass, not a hot loop —
    # one code path everywhere beats a faster untestable fork
    w = w_ref[...].astype(jnp.float32) / scale_ref[...]
    q = jnp.floor(w + u_ref[...])
    q_ref[...] = jnp.clip(q, -127, 127).astype(jnp.int8)


def stochastic_round_quantize(
    w: jnp.ndarray,
    contract_axes: Sequence[int] = (0,),
    seed: int = 0,
    *,
    interpret: bool | None = None,
) -> QTensor:
    """Unbiased int8 quantization: ``E[q] = w/scale`` via stochastic
    rounding with the on-chip PRNG. 2-D inputs only (matmul weights);
    reshape higher-rank kernels first."""
    if interpret is None:
        interpret = not _on_tpu()
    orig_shape = w.shape
    scale = compute_scale(w, contract_axes)
    if w.ndim != 2:
        # collapse to (rows, channels): channels = product of kept axes
        kept = [a for a in range(w.ndim) if a not in set(c % w.ndim for c in contract_axes)]
        perm = [a for a in range(w.ndim) if a not in kept] + kept
        w2 = jnp.transpose(w, perm).reshape(-1, int(np.prod([orig_shape[a] for a in kept])))
        s2 = jnp.broadcast_to(
            jnp.transpose(scale, perm).reshape(1, -1), (1, w2.shape[1])
        )
        qt2 = _sr_quantize_2d(w2, s2, seed, interpret)
        q = jnp.transpose(
            qt2.reshape([orig_shape[a] for a in perm]), np.argsort(perm)
        )
        return QTensor(q=q, scale=scale)
    s2 = jnp.broadcast_to(scale.reshape(1, -1), (1, w.shape[1]))
    q = _sr_quantize_2d(w, s2, seed, interpret)
    return QTensor(q=q, scale=scale)


def _sr_quantize_2d(w, scale_row, seed, interpret):
    rows, cols = w.shape
    block = min(rows, 256)
    pad = (-rows) % block
    if pad:
        w = jnp.pad(w, ((0, pad), (0, 0)))
    # uniform in [0, 1) from the high 24 bits (exact in f32)
    u = jax.random.uniform(jax.random.key(seed), w.shape, jnp.float32)
    grid = (w.shape[0] // block,)
    q = pl.pallas_call(
        _sr_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, cols), lambda i: (i, 0)),
            pl.BlockSpec((1, cols), lambda i: (0, 0)),
            pl.BlockSpec((block, cols), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(w.shape, jnp.int8),
        interpret=interpret,
    )(w, scale_row, u)
    return q[:rows]


# ---------------------------------------------------------------------------
# int8 weight matmul
# ---------------------------------------------------------------------------


def _mm_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 → bf16 conversion happens in VMEM/registers feeding the MXU;
    # HBM only ever sees the int8 bytes
    acc_ref[...] += jnp.dot(
        x_ref[...],
        q_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % multiple
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def pick_blocks(m: int, k: int, n: int) -> tuple[int, int, int]:
    """Measured (block_m, block_n, block_k) per serving-shape class
    (`scripts/int8_tune_results.json`, chain 19; 16-call amortized
    timing). The original fixed (128, 128, 512) runs the M=3328 vision
    matmuls as ~3120 grid steps of 64KB weight blocks — per-step
    overhead, not DMA or MXU, dominates; whole-K × wide-N blocks
    measured 31-56% faster (vision MLP 71-83 TFLOP/s, text skinny-M
    gate-up 124 GB/s weight streaming).

    Legacy blocks for shapes outside the measured classes (tiny test
    configs, odd N) — the chain-19 sweep covered the 11B text (M≈32)
    and vision (M≈3.3k) families; the round-5 sweep added the
    decoupled-text M=256/512 classes (text_chunk 8/16 ran these
    OFF-TABLE in the chain r4-01 A/B — the fall-through blocks measure
    5-27% behind the per-class winners below)."""
    if n % 128 or k < 512:
        return 128, 128, 512
    if m <= 64:  # skinny-M decoder/prompt stack: stream weights wide
        bn = min(512, n)
        return 128, bn, (k if k <= 4096 else _largest_divisor_block(k))
    if n <= 1280 and k >= 4096:  # vision MLP-down class
        return 128, n, _largest_divisor_block(k, cap=1024)
    if m <= 256:  # mid-M text class (text_chunk 8 → M=256)
        if max(k, n) >= 8192:  # gate-up / down projections
            return 128, min(2048, n), _largest_divisor_block(k, cap=1024)
        return 256, min(512, n), _largest_divisor_block(k, cap=1024)
    if m <= 512:  # mid-M text class (text_chunk 16 → M=512)
        if max(k, n) >= 8192:
            return 512, min(512, n), _largest_divisor_block(k, cap=1024)
        return 128, min(1024, n), _largest_divisor_block(k, cap=2048)
    bn = min(512, n)
    return 128, bn, (k if k <= 2048 else _largest_divisor_block(k))


def _largest_divisor_block(k: int, cap: int = 2048) -> int:
    for cand in (cap, 2048, 1024, 512):
        if cand <= cap and k % cand == 0:
            return cand
    return 512


@functools.partial(jax.jit, static_argnames=("interpret", "block_m", "block_n", "block_k"))
def int8_matmul(
    x: jnp.ndarray,  # (M, K) bf16/f32
    q: jnp.ndarray,  # (K, N) int8
    scale: jnp.ndarray,  # (N,) or (1, N) f32
    *,
    interpret: bool | None = None,
    block_m: int = 128,
    block_n: int = 128,
    block_k: int = 512,
) -> jnp.ndarray:
    """``x @ (q * scale)`` with the bf16 weight copy never materialized."""
    if interpret is None:
        interpret = not _on_tpu()
    out_dtype = x.dtype
    m, k = x.shape
    n = q.shape[1]
    scale_row = scale.reshape(1, -1)

    block_m = min(block_m, max(8, 1 << (m - 1).bit_length()))
    block_k = min(block_k, k)
    xp = _pad_to(_pad_to(x, 0, block_m), 1, block_k)
    qp = _pad_to(_pad_to(q, 0, block_k), 1, block_n)
    sp = _pad_to(scale_row, 1, block_n)
    mp, kp = xp.shape
    np_ = qp.shape[1]
    n_k = kp // block_k

    out = pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k),
        grid=(mp // block_m, np_ // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kb: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kb: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, qp, sp)
    return out[:m, :n]


def int8_apply(x: jnp.ndarray, qt: QTensor, *, use_kernel: bool | None = None) -> jnp.ndarray:
    """Apply a quantized 2-D weight to the last axis of ``x``.

    ``use_kernel=None`` auto-selects: Pallas on TPU, XLA dequant-matmul
    elsewhere (XLA fuses the int8→bf16 convert into the dot read)."""
    if use_kernel is None:
        use_kernel = _on_tpu()
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if use_kernel:
        bm, bn, bk = pick_blocks(x2.shape[0], qt.q.shape[0], qt.q.shape[1])
        out = int8_matmul(
            x2,
            qt.q,
            qt.scale,
            interpret=False,
            block_m=bm,
            block_n=bn,
            block_k=bk,
        )
    else:
        # dequantize in f32 like the Pallas kernel (which multiplies the
        # f32 scales into the f32 accumulator) so the CPU path the parity
        # tests lock shares the TPU path's rounding behavior
        w = (qt.q.astype(jnp.float32) * qt.scale.astype(jnp.float32)).astype(
            x.dtype
        )
        out = x2 @ w
    return out.reshape(*lead, qt.q.shape[-1])
