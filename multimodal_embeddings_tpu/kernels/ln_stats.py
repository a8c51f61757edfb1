"""Row-wise LayerNorm statistics as a Pallas TPU kernel.

The r3 headline trace (chain 12, after the encoder-attention kernel
landed) shows the embed program spending **27.8 ms/page in 27
`convert_reduce_fusion` ops** — XLA's LayerNorm mean/variance reduces at
(48, 784, 768), each reading ~58MB of bf16 activations at ~29GB/s, ~25×
below HBM speed of light. The custom-call boundary around the attention
kernel keeps XLA from fusing these stats into neighboring ops, so they
stand alone and pay full-precision conversion + strided-reduce overhead.

This kernel computes per-row mean and rsqrt(var + eps) in one pass: one
program per batch row, the (L, D) tile upcast in VMEM, lane-dimension
reduces on the VPU — pure bandwidth. The *normalize* (subtract/scale) is
deliberately left to XLA, which fuses it into the consumer matmul's
prologue exactly as it does today; only the stats reduce is replaced.

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


def _ln_stats_kernel(x_ref, mean_ref, rstd_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (L, D)
    m = jnp.mean(x, axis=1, keepdims=True)  # (L, 1)
    m2 = jnp.mean(x * x, axis=1, keepdims=True)
    var = jnp.maximum(m2 - m * m, 0.0)  # flax use_fast_variance formula
    mean_ref[0] = m
    rstd_ref[0] = jax.lax.rsqrt(var + eps)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ln_stats(
    x: jnp.ndarray,  # (B, L, D)
    eps: float = 1e-6,
    interpret: bool = False,
):
    """→ (mean, rstd), each (B, L, 1) float32. One program per batch row;
    L must be a multiple of 8 (sublane tile of the f32 outputs)."""
    b, l, d = x.shape
    assert l % 8 == 0, l

    def spec(depth):
        return pl.BlockSpec(
            (1, l, depth), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    out_shape = jax.ShapeDtypeStruct((b, l, 1), jnp.float32)
    mean, rstd = pl.pallas_call(
        functools.partial(_ln_stats_kernel, eps=eps),
        grid=(b,),
        in_specs=[spec(d)],
        out_specs=(spec(1), spec(1)),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(x)
    return mean, rstd
