"""Direct 3×3 convolution as a Pallas TPU kernel (spatial-on-lanes).

Why: the DocLayout-YOLO backbone's hot convs run 48-96 channels at
256²/128² spatial over 30 views (trace: 81% of page time, ~5-10% MFU).
XLA's conv emitter puts CHANNELS on the 128 MXU lanes, so C=48 wastes
5/8 of every tile. This kernel keeps the data NCHW and puts the WIDTH
dimension on lanes instead: each 8-row output group is one
``(C_out, 9·C_in) @ (9·C_in, 8·W)`` matmul whose patch operand is built
in VMEM from lane-rolled row slices — full lane utilization and a
432-deep contraction for C_in=48.

TPU alignment: vector loads from VMEM must start at sublane multiples of
8, so the kernel loads one aligned 24-row block per 8-row output group
(the input is pre-padded by 8 top / 16 bottom rows) and takes the halo
rows as static in-register slices.

Scope: stride-1 SAME 3×3, NCHW, optional fused bias + SiLU (the YOLO
ConvBlock epilogue). Falls back to ``lax.conv_general_dilated`` off-TPU.
Measured use is gated: models keep XLA convs unless the standalone
microbench and the fused pipeline both win (see ROADMAP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # output rows per grid step (sublane alignment unit)


def _conv3x3_kernel(
    x_ref, w_ref, b_ref, o_ref, patch_ref, *, act: str, h: int, rows: int
):
    """Grid (N, H/rows). x_ref: (1, C, H+rows+16, W) padded image (``rows``
    zero rows on top, 16 below); o_ref: (1, Cout, rows, W) aligned output
    group; patch scratch: (9·C, rows·W)."""
    ROWS = rows
    c = x_ref.shape[1]
    w = x_ref.shape[3]
    hi = pl.program_id(1)
    base = hi * ROWS

    # one aligned load covering every row this group needs: output
    # y = base+r takes padded rows base+r+ROWS-1 .. base+r+ROWS+1, all
    # inside [base, base+blk) with blk = ceil8(2·ROWS+1)
    blk = -(-(2 * ROWS + 1) // 8) * 8
    block = x_ref[0, :, pl.ds(base, blk), :]  # (C, blk, W)

    # column index within each W-row of the flattened (C, ROWS·W) layout
    colw = jax.lax.broadcasted_iota(jnp.int32, (c, ROWS, w), 2).reshape(
        c, ROWS * w
    )
    for dy in range(3):
        # the dy-plane for ALL output rows at once: padded rows
        # [ROWS-1+dy, 2·ROWS-1+dy) flattened row-major to (C, ROWS·W) —
        # exactly the patch column layout (r, x)
        sub = block[:, ROWS - 1 + dy : 2 * ROWS - 1 + dy, :].reshape(
            c, ROWS * w
        )
        for dx in (-1, 0, 1):
            # position x reads input x+dx. One roll over the flattened
            # axis serves every row: the wrap leaks only into each row's
            # edge column, which the SAME-padding mask zeroes anyway.
            # Mosaic only rotates 32-bit data — round-trip through f32
            # (exact for bf16).
            if dx:
                v = pltpu.roll(
                    sub.astype(jnp.float32), (-dx) % (ROWS * w), axis=1
                ).astype(sub.dtype)
                if dx == 1:
                    v = jnp.where(colw < w - 1, v, 0)
                else:
                    v = jnp.where(colw >= 1, v, 0)
            else:
                v = sub
            patch_ref[pl.ds((dy * 3 + dx + 1) * c, c), :] = v

    acc = jnp.dot(
        w_ref[...], patch_ref[...], preferred_element_type=jnp.float32
    )  # (Cout, ROWS·W)
    acc = acc + b_ref[...].astype(jnp.float32)
    if act == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    o_ref[0] = acc.reshape(o_ref.shape[1], ROWS, w).astype(o_ref.dtype)


def _on_tpu() -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
        device = jax.config.jax_default_device
        return device is None or getattr(device, "platform", "tpu") == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("act", "interpret", "rows"))
def conv3x3_nchw(
    x: jnp.ndarray,  # (N, C, H, W)
    w: jnp.ndarray,  # (Cout, C, 3, 3)
    bias: jnp.ndarray | None = None,  # (Cout,)
    *,
    act: str = "none",  # "none" | "silu"
    interpret: bool | None = None,
    rows: int = ROWS,  # output rows per grid step (multiple of 8)
) -> jnp.ndarray:
    """Stride-1 SAME 3×3 conv (+ optional bias/SiLU) in NCHW layout."""
    if interpret is None:
        interpret = not _on_tpu()
    n, c, h, width = x.shape
    cout = w.shape[0]
    if h % rows:
        pad_h = rows - h % rows
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        return conv3x3_nchw(
            xp, w, bias, act=act, interpret=interpret, rows=rows
        )[:, :, :h, :]
    # (Cout, 9·C) with patch-row order (dy, dx, ci)
    w_flat = jnp.transpose(w, (0, 2, 3, 1)).reshape(cout, 9 * c)
    b = jnp.zeros((cout, 1), jnp.float32) if bias is None else bias.reshape(cout, 1)
    # zero-padding for SAME semantics + alignment: ``rows`` rows on top
    # (so row y-1 of group r=0 sits at padded index base+rows-1) and
    # enough below that the last group's aligned blk-row load stays in
    # bounds (blk = ceil8(2·rows+1), matching the kernel's load)
    blk = -(-(2 * rows + 1) // 8) * 8
    xpad = jnp.pad(x, ((0, 0), (0, 0), (rows, blk - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_conv3x3_kernel, act=act, h=h, rows=rows),
        grid=(n, h // rows),
        in_specs=[
            pl.BlockSpec((1, c, h + blk, width), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((cout, 9 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, rows, width), lambda i, j: (i, 0, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, cout, h, width), x.dtype),
        scratch_shapes=[pltpu.VMEM((9 * c, rows * width), x.dtype)],
        # the per-image input block (~7MB at 48×280×256) double-buffers
        # past the conservative 16MB default scoped-vmem limit
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xpad, w_flat.astype(x.dtype), b)
    return out


def conv3x3_reference(x, w, bias=None, act="none"):
    """lax.conv oracle in the same NCHW convention (for tests/benches)."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    return out
