"""Direct 3×3 convolution as a Pallas TPU kernel (spatial-on-lanes).

TPU-native counterpart of the torch/CUDA convs behind the reference's
detector (``1_doclayout_bboxes.py:205-215`` runs YOLOv10 through
PyTorch's cuDNN kernels; SURVEY §2.3 row 1).

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
    x_ref, w_ref, b_ref, o_ref, patch_ref, *, act: str, h: int, rows: int,
    dilation: int = 1,
):
    """Grid (N, H/rows). x_ref: (1, C, H+blk, W) padded image (``rows``
    zero rows on top, blk-rows below); o_ref: (1, Cout, rows, W) aligned
    output group; patch scratch: (9·C, rows·W). ``dilation`` moves the taps
    to ±d (SAME semantics with pad=d) — the GL-CRM blocks' "global
    perception" conv is a d=2 dilated 3×3 (layers.py::CRMBottleneck)."""
    ROWS = rows
    d = dilation
    c = x_ref.shape[1]
    w = x_ref.shape[3]
    hi = pl.program_id(1)
    base = hi * ROWS

    # one aligned load covering every row this group needs: output
    # y = base+r takes padded rows base+r+ROWS-d .. base+r+ROWS+d, all
    # inside [base, base+blk) with blk = ceil8(2·ROWS+d)
    blk = -(-(2 * ROWS + d) // 8) * 8
    block = x_ref[0, :, pl.ds(base, blk), :]  # (C, blk, W)

    # column index within each W-row of the flattened (C, ROWS·W) layout
    colw = jax.lax.broadcasted_iota(jnp.int32, (c, ROWS, w), 2).reshape(
        c, ROWS * w
    )
    for dy in range(3):
        # the dy-plane for ALL output rows at once: padded rows
        # [ROWS+(dy-1)·d, 2·ROWS+(dy-1)·d) flattened row-major to
        # (C, ROWS·W) — exactly the patch column layout (r, x)
        lo = ROWS + (dy - 1) * d
        sub = block[:, lo : lo + ROWS, :].reshape(c, ROWS * w)
        for dxi, dx in enumerate((-d, 0, d)):
            # position x reads input x+dx. One roll over the flattened
            # axis serves every row: the wrap leaks only into each row's
            # d edge columns, which the SAME-padding mask zeroes anyway.
            # Mosaic only rotates 32-bit data — round-trip through f32
            # (exact for bf16).
            if dx:
                v = pltpu.roll(
                    sub.astype(jnp.float32), (-dx) % (ROWS * w), axis=1
                ).astype(sub.dtype)
                if dx > 0:
                    v = jnp.where(colw < w - d, v, 0)
                else:
                    v = jnp.where(colw >= d, v, 0)
            else:
                v = sub
            patch_ref[pl.ds((dy * 3 + dxi) * c, c), :] = v

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


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "rows", "dilation")
)
def conv3x3_nchw(
    x: jnp.ndarray,  # (N, C, H, W)
    w: jnp.ndarray,  # (Cout, C, 3, 3)
    bias: jnp.ndarray | None = None,  # (Cout,)
    *,
    act: str = "none",  # "none" | "silu"
    interpret: bool | None = None,
    rows: int = ROWS,  # output rows per grid step (multiple of 8)
    dilation: int = 1,  # tap spacing (SAME with pad=dilation); must be <= rows
) -> jnp.ndarray:
    """Stride-1 SAME 3×3 conv (+ optional bias/SiLU) in NCHW layout."""
    if interpret is None:
        interpret = not _on_tpu()
    assert dilation <= rows, (dilation, rows)
    n, c, h, width = x.shape
    cout = w.shape[0]
    if h % rows:
        pad_h = rows - h % rows
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        return conv3x3_nchw(
            xp, w, bias, act=act, interpret=interpret, rows=rows,
            dilation=dilation,
        )[:, :, :h, :]
    # (Cout, 9·C) with patch-row order (dy, dx, ci)
    w_flat = jnp.transpose(w, (0, 2, 3, 1)).reshape(cout, 9 * c)
    b = jnp.zeros((cout, 1), jnp.float32) if bias is None else bias.reshape(cout, 1)
    # zero-padding for SAME semantics + alignment: ``rows`` rows on top
    # (so row y-d of group r=0 sits at padded index base+rows-d) and
    # enough below that the last group's aligned blk-row load stays in
    # bounds (blk = ceil8(2·rows+dilation), matching the kernel's load)
    blk = -(-(2 * rows + dilation) // 8) * 8
    xpad = jnp.pad(x, ((0, 0), (0, 0), (rows, blk - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _conv3x3_kernel, act=act, h=h, rows=rows, dilation=dilation
        ),
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


def conv3x3_reference(x, w, bias=None, act="none", dilation=1):
    """lax.conv oracle in the same NCHW convention (for tests/benches)."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(1, 1),
        padding=[(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    return out


def _conv3x3_s2_kernel(
    p00_ref, p01_ref, p10_ref, p11_ref, w_ref, b_ref, o_ref, patch_ref,
    *, act: str, rows: int
):
    """Stride-2 via even/odd plane decomposition. Each plane
    P[rp][cp][c, i, j] = x[2i+rp, 2j+cp] has the OUTPUT's spatial extent,
    so tap (dy, dx) reads plane (dy%2, dx%2) at static offsets
    (dy//2, dx//2) — the same aligned-load + lane-roll machinery as the
    stride-1 kernel, with W' on lanes. Planes are padded one extra
    row/col of zeros by the wrapper (the dy=2 / dx=2 taps at the edge)."""
    ROWS = rows
    c = p00_ref.shape[1]
    w = p00_ref.shape[3]  # W' + lane padding handled by mask
    hi = pl.program_id(1)
    base = hi * ROWS

    planes = ((p00_ref, p01_ref), (p10_ref, p11_ref))
    blk = -(-(ROWS + 2) // 8) * 8
    loaded = {
        (rp, cp): planes[rp][cp][0, :, pl.ds(base, blk), :]
        for rp in (0, 1)
        for cp in (0, 1)
    }
    colw = jax.lax.broadcasted_iota(jnp.int32, (c, ROWS, w), 2).reshape(
        c, ROWS * w
    )
    for dy in range(3):
        rp, roff = dy % 2, dy // 2
        for dx in range(3):
            cp, coff = dx % 2, dx // 2
            sub = loaded[(rp, cp)][:, roff : roff + ROWS, :].reshape(
                c, ROWS * w
            )
            if coff:
                # column x'+1: roll left by one lane; the wrapped edge
                # column corresponds to input col ≥ W and is zeroed
                v = pltpu.roll(
                    sub.astype(jnp.float32), (ROWS * w) - 1, axis=1
                ).astype(sub.dtype)
                v = jnp.where(colw < w - 1, v, 0)
            else:
                v = sub
            patch_ref[pl.ds((dy * 3 + dx) * c, c), :] = v

    acc = jnp.dot(
        w_ref[...], patch_ref[...], preferred_element_type=jnp.float32
    )
    acc = acc + b_ref[...].astype(jnp.float32)
    if act == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    o_ref[0] = acc.reshape(o_ref.shape[1], ROWS, w).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "interpret", "rows"))
def conv3x3_s2_nchw(
    x: jnp.ndarray,  # (N, C, H, W), H and W even
    w: jnp.ndarray,  # (Cout, C, 3, 3)
    bias: jnp.ndarray | None = None,
    *,
    act: str = "none",
    interpret: bool | None = None,
    rows: int = ROWS,
) -> jnp.ndarray:
    """Stride-2 SAME 3×3 conv (+ optional bias/SiLU), NCHW. SAME with
    even H/W and stride 2 pads 0 on top/left and 1 on bottom/right
    (lax/torch semantics): out[y', x'] covers input rows 2y'..2y'+2."""
    if interpret is None:
        interpret = not _on_tpu()
    n, c, h, width = x.shape
    assert h % 2 == 0 and width % 2 == 0, "stride-2 path expects even H, W"
    cout = w.shape[0]
    ho, wo = h // 2, width // 2
    if ho % rows:
        pad_h = (rows - ho % rows) * 2
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        return conv3x3_s2_nchw(
            xp, w, bias, act=act, interpret=interpret, rows=rows
        )[:, :, :ho, :]
    # patch-row order (dy, dx, ci) — NOTE: tap index dy*3+dx (no +1 lane
    # shift like stride-1; the coff roll covers dx parity instead)
    w_flat = jnp.transpose(w, (0, 2, 3, 1)).reshape(cout, 9 * c)
    b = jnp.zeros((cout, 1), jnp.float32) if bias is None else bias.reshape(cout, 1)

    # even/odd planes with one extra zero row (for the dy=2 edge tap) and
    # one extra zero col folded into the roll mask; then pad rows so the
    # kernel's aligned blk-row loads stay in bounds
    blk = -(-(rows + 2) // 8) * 8
    planes = []
    for rp in (0, 1):
        for cp in (0, 1):
            p = x[:, :, rp::2, cp::2]
            p = jnp.pad(p, ((0, 0), (0, 0), (0, blk - 0), (0, 0)))
            planes.append(p)
    p00, p01, p10, p11 = planes

    out = pl.pallas_call(
        functools.partial(_conv3x3_s2_kernel, act=act, rows=rows),
        grid=(n, ho // rows),
        in_specs=[
            pl.BlockSpec((1, c, ho + blk, wo), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, c, ho + blk, wo), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, c, ho + blk, wo), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, c, ho + blk, wo), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((cout, 9 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, rows, wo), lambda i, j: (i, 0, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, cout, ho, wo), x.dtype),
        scratch_shapes=[pltpu.VMEM((9 * c, rows * wo), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(p00, p01, p10, p11, w_flat.astype(x.dtype), b)
    return out


def conv3x3_s2_reference(x, w, bias=None, act="none"):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(2, 2),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    return out
