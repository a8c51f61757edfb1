"""Row-wise LayerNorm statistics as a Pallas TPU kernel.

The r3 headline trace (chain 12, after the encoder-attention kernel
landed) shows the embed program spending **27.8 ms/page in 27
`convert_reduce_fusion` ops** — XLA's LayerNorm mean/variance reduces at
(48, 784, 768), each reading ~58MB of bf16 activations at ~29GB/s, ~25×
below HBM speed of light. The custom-call boundary around the attention
kernel keeps XLA from fusing these stats into neighboring ops, so they
stand alone and pay full-precision conversion + strided-reduce overhead.

This kernel computes per-row mean and rsqrt(var + eps) in one pass over
a (B, L/rb) grid of row-block programs, each (rb, D) tile upcast in
VMEM, lane-dimension reduces on the VPU — pure bandwidth. The
*normalize* (subtract/scale) is deliberately left to XLA, which fuses it
into the consumer matmul's prologue exactly as it does today; only the
stats reduce is replaced.

Measured in-model (chain 14): a WASH at the headline ViT-B shape
(5.77 vs 5.80 p/s) — 27 sites × 48 one-row programs of 1.2MB each pay
too much per-program overhead for the 24 ms/page they chase. The mme5
Mllama shape is the real target: its trace shows ~40 LN-stats reduces
at (8, 1608, 1280) — 33MB/site at ~18GB/s — totalling **35% of mme5
device time**, and the row-chunked grid (rb=536) amortizes far better.

Replaces the stats half of the torch ``nn.LayerNorm`` inside the
reference's encoder stacks (``embedder.py:73-83``'s Mllama vision tower
and the ViT dual encoder). Uses flax's exact formula (f32 reductions,
mean-of-squares variance clamped at 0) so the host fallback matches
``nn.LayerNorm`` bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_sum(x: jnp.ndarray, method: str) -> jnp.ndarray:
    """Sum a (rb, D) f32 tile over its lane dimension → (rb, 1).

    "reduce": plain jnp.sum — Mosaic's cross-lane reduction.
    "chunk":  unrolled static 128-lane slices accumulated with VPU adds
              (lane offsets at multiples of 128 are register selects),
              then ONE cross-lane reduce of the final (rb, 128) tile.
    "dot":    ones-matmul on the MXU (f32, N padded to 128 lanes).
    """
    rb, d = x.shape
    if method == "chunk" and d % 128 == 0 and d > 128:
        acc = x[:, :128]
        for off in range(128, d, 128):
            acc = acc + x[:, off : off + 128]
        return jnp.sum(acc, axis=1, keepdims=True)
    if method == "dot":
        ones = jnp.ones((d, 128), jnp.float32)
        return jax.lax.dot(x, ones)[:, :1]
    return jnp.sum(x, axis=1, keepdims=True)


def _ln_stats_kernel(x_ref, mean_ref, rstd_ref, *, eps: float, method: str):
    x = x_ref[0].astype(jnp.float32)  # (rb, D)
    d = x.shape[1]
    m = _row_sum(x, method) / d  # (rb, 1)
    m2 = _row_sum(x * x, method) / d
    var = jnp.maximum(m2 - m * m, 0.0)  # flax use_fast_variance formula
    mean_ref[0] = m
    rstd_ref[0] = jax.lax.rsqrt(var + eps)


# per-program VMEM budget for the (rb, D) tile: input dtype bytes + f32
# upcast + f32 square (conservatively itemsize+8 bytes/element), kept
# well under the ~16MB scoped limit (the chain-11 lesson).
_VMEM_TILE_BUDGET = 12 * 1024 * 1024


def pick_row_block(l: int, d: int, itemsize: int) -> int:
    """Largest row-block that divides L, is a multiple of 8 (f32 output
    sublane tile), and fits the per-program VMEM budget. 0 if none.

    Rows are independent for LayerNorm statistics, so row-chunking is
    exact — unlike attention, where columns couple through the softmax.
    The mme5 Mllama shape (1608, 1280) picks rb=536 (6.9MB); the ViT-B
    (784, 768) shape fits whole (rb=784)."""
    per_row = d * (itemsize + 8)
    best = 0
    for rb in range(8, l + 1, 8):
        if l % rb == 0 and rb * per_row <= _VMEM_TILE_BUDGET:
            best = rb
    return best


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "method"))
def ln_stats(
    x: jnp.ndarray,  # (B, L, D)
    eps: float = 1e-6,
    interpret: bool = False,
    method: str = "reduce",
):
    """→ (mean, rstd), each (B, L, 1) float32. Grid is (B, L/rb) row
    blocks; L must be a multiple of 8 (sublane tile of the f32 outputs)
    and some multiple-of-8 row block must fit VMEM (pick_row_block).
    ``method`` picks the in-kernel lane-sum strategy (see _row_sum)."""
    b, l, d = x.shape
    assert l % 8 == 0, l
    rb = pick_row_block(l, d, x.dtype.itemsize)
    assert rb, (l, d, x.dtype)

    def spec(depth):
        return pl.BlockSpec(
            (1, rb, depth), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )

    out_shape = jax.ShapeDtypeStruct((b, l, 1), jnp.float32)
    mean, rstd = pl.pallas_call(
        functools.partial(_ln_stats_kernel, eps=eps, method=method),
        grid=(b, l // rb),
        in_specs=[spec(d)],
        out_specs=(spec(1), spec(1)),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(x)
    return mean, rstd
