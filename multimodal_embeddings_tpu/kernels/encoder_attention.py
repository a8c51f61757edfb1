"""Single-pass whole-row encoder attention as a Pallas TPU kernel.

The pipeline's embedders run SHORT unmasked self-attention (ViT-B @448 →
L=784 patches, 48 crops/page; Mllama vision → L=1608), where the XLA path
materializes the (B, H, L, L) logits in HBM and re-reads them for the
softmax row-stats and the PV matmul — trace-measured ~38 ms/page of the
headline program (``utils/trace_analysis`` on the r3 detector-closure
profile). The flash kernels (``flash_attention.py``) lose at this scale
(13.3 vs 6.4 ms standalone): with L≈784 the online-softmax q/k block loop
degenerates into ~28k tiny (128, 64) MXU ops plus rescaling VPU traffic.

Here the ENTIRE (L, L) score matrix for one head lives in VMEM (784² f32
≈ 2.5 MB « 16 MB/core), so softmax is one plain max/exp/sum pass — no
online rescaling, no score HBM round-trips. One program per BATCH row
(grid B) loops over the heads, giving each program ~1.9 GFLOP — big
enough to amortize program launch, unlike one-program-per-(b,h).

Per head: NT dot (L,D)x(L,D) → f32 scores, row softmax in VMEM, NN dot
(L,L)x(L,D) with f32 accumulation, normalize, cast to the input dtype.
Replaces the CUDA flash-attn dependency of the reference's embedding hot
path (``embedder.py:124-129``) at encoder shapes; longer/causal shapes
stay on ``flash_attention``/XLA per the measured dispatch thresholds.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _enc_attn_kernel(
    q_ref,  # (H, L, D)
    k_ref,  # (H, L, D)
    v_ref,  # (H, L, Dv)
    o_ref,  # (H, L, Dv)
    *,
    sm_scale: float,
    heads: int,
    valid_len: Optional[int],
    row_block: Optional[int],
):
    l = q_ref.shape[1]
    # bf16 inputs → bf16 MXU dots with f32 accumulation (an f32 upcast
    # before the dot would force the 4×-slower f32 MXU path)
    mxu_dtype = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32
    # row blocking: softmax is per-row, so q-row chunks are EXACT (no
    # online rescaling) — required when the whole (L, L) f32 scores +
    # bf16 exp (~6·L² bytes) would blow the ~16MB scoped VMEM (the
    # Mllama 1616-token shape OOM'd whole-row: 15.7MB of intermediates
    # on top of the head blocks)
    rb = row_block or l
    n_rb = -(-l // rb)

    def head_body(h, _):
        k = k_ref[h].astype(mxu_dtype)  # (L, D)
        v = v_ref[h].astype(mxu_dtype)  # (L, Dv)

        # STATIC unrolled row chunks (n_rb is a trace-time constant, ~3 at
        # the Mllama shape): every offset is a compile-time literal —
        # no dynamic-offset stores for Mosaic to reject. All chunks are rb
        # rows; the last one is shifted back in-bounds (overlapping rows
        # recompute identical values — idempotent store).
        for start in sorted({min(i * rb, l - rb) for i in range(n_rb)}):
            q = q_ref[h, start : start + rb, :].astype(mxu_dtype)  # (rb, D)
            # NT contraction: scores[i, j] = q_i · k_j, f32 accumulate
            scores = (
                jax.lax.dot_general(
                    q,
                    k,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * sm_scale
            )  # (rb, L) f32, VMEM-resident
            if valid_len is not None and valid_len < l:
                cols = jax.lax.broadcasted_iota(jnp.int32, (rb, l), 1)
                scores = jnp.where(cols < valid_len, scores, NEG_INF)
            m = jnp.max(scores, axis=1, keepdims=True)
            e = jnp.exp(scores - m)
            denom = jnp.sum(e, axis=1, keepdims=True)  # f32 (rb, 1)
            o = jnp.dot(
                e.astype(mxu_dtype), v, preferred_element_type=jnp.float32
            )
            o_ref[h, start : start + rb, :] = (
                o / jnp.maximum(denom, 1e-30)
            ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, head_body, 0)


def _blhd_pick_hpb(l, h, d, dv, dtype):
    """Largest LEGAL head block fitting the VMEM budget, or None.

    Mosaic requires a block's last two dims be (8, 128)-divisible OR
    equal to the full array dims — so a (1, L, hpb, D) block needs hpb
    to be a multiple of 8 or hpb == H (the headline chain-23 crash:
    hpb=2 of H=4 was rejected)."""
    ib = 6 if dtype == jnp.bfloat16 else 8
    elem = jnp.dtype(dtype).itemsize
    inter = ib * l * l
    legal = {h} | {c for c in range(8, h, 8) if h % c == 0}
    fitting = [
        hpb
        for hpb in legal
        if 2 * l * hpb * (2 * d + 2 * dv) * elem + inter <= 14e6
    ]
    return max(fitting) if fitting else None


def blhd_supported(q, v) -> bool:
    """Whether the transpose-free BLHD variant can run at these shapes."""
    _, l, h, d = q.shape
    return _blhd_pick_hpb(l, h, d, v.shape[3], q.dtype) is not None


def _enc_attn_blhd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, heads):
    """Per-head attention over a (1, L, hpb, D) BLHD slab — no host-side
    (B,L,H,D)→(B,H,L,D) transpose feeding the call (the r3 headline trace
    pays ~7.5 ms/page of relayout copies around the BHLD kernel); the
    per-head (L, D) extraction happens as strided VMEM reads instead."""
    l = q_ref.shape[1]
    mxu_dtype = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32

    def head_body(h, _):
        q = q_ref[0, :, h, :].astype(mxu_dtype)  # (L, D)
        k = k_ref[0, :, h, :].astype(mxu_dtype)
        v = v_ref[0, :, h, :].astype(mxu_dtype)
        scores = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        o = jnp.dot(e.astype(mxu_dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, h, :] = (o / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, head_body, 0)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "heads_per_block", "interpret")
)
def encoder_attention_blhd(
    q: jnp.ndarray,  # (B, L, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,  # (B, L, H, Dv)
    sm_scale: Optional[float] = None,
    heads_per_block: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Transpose-free variant: operands stay (B, L, H, D) end to end.

    Same math as ``encoder_attention`` (whole-row softmax, unmasked);
    the head dim is blocked so each program's slab + (L, L) score/exp
    intermediates fit scoped VMEM. HBM reads are strided per L-row
    (hpb·D contiguous bytes) — the A/B against transpose+BHLD is a
    measured question, not a foregone win."""
    b, l, h, d = q.shape
    dv = v.shape[3]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if heads_per_block is None:
        heads_per_block = _blhd_pick_hpb(l, h, d, dv, q.dtype)
        if heads_per_block is None:
            raise ValueError(
                f"no legal BLHD head block fits VMEM at {q.shape} — guard "
                "with blhd_supported() before dispatching"
            )
    assert h % heads_per_block == 0, (h, heads_per_block)

    def spec(depth):
        return pl.BlockSpec(
            (1, l, heads_per_block, depth),
            lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(
            _enc_attn_blhd_kernel, sm_scale=sm_scale, heads=heads_per_block
        ),
        grid=(b, h // heads_per_block),
        in_specs=[spec(d), spec(d), spec(dv)],
        out_specs=spec(dv),
        out_shape=jax.ShapeDtypeStruct((b, l, h, dv), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out


def _enc_attn_blf_kernel(
    q_ref,  # (1, L, hpb*D)
    k_ref,  # (1, L, hpb*D)
    v_ref,  # (1, L, hpb*Dv)
    o_ref,  # (1, L, hpb*Dv)
    *,
    sm_scale: float,
    heads: int,
    d: int,
    dv: int,
):
    """Heads folded onto the LANE axis: every prior true-BLHD form died in
    Mosaic because the head axis sat on sublanes (needs 8-divisibility;
    H=12 fails — chains 23/r4-01/r4-02b). Here q/k/v arrive as (B, L, H·D)
    — the natural GEMM output layout — and the per-head (L, D) views are
    STATIC lane slices at multiples of D, so there is no transpose
    anywhere in the whole attention block: projections are plain matmuls,
    the DMA streams contiguous slabs, and the out-projection contracts the
    (B, L, H·Dv) result directly."""
    mxu_dtype = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32
    for h in range(heads):
        q = q_ref[0, :, h * d : (h + 1) * d].astype(mxu_dtype)  # (L, D)
        k = k_ref[0, :, h * d : (h + 1) * d].astype(mxu_dtype)
        v = v_ref[0, :, h * dv : (h + 1) * dv].astype(mxu_dtype)
        scores = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        o = jnp.dot(e.astype(mxu_dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * dv : (h + 1) * dv] = (
            o / jnp.maximum(denom, 1e-30)
        ).astype(o_ref.dtype)


def _enc_attn_blf_scratch_kernel(
    q_ref, k_ref, v_ref, o_ref, s_ref, *, sm_scale, heads, d, dv
):
    """Lane-folded kernel with ONE shared (L, L) f32 score scratch reused
    in place across the head unroll. The plain unrolled kernel keeps a
    live f32 score value PER head body (measured: 19.14M scoped at the
    ViT shape, hpb=6 — chain r5-02), capping hpb at 2; routing scores
    through an explicit scratch ref bounds the score footprint at one
    buffer regardless of hpb. Math identical: exp overwrites the scores
    in place (both f32), the denominator sums in f32, and the PV dot
    reads the scratch cast to the MXU dtype — same ops as the unrolled
    form."""
    mxu_dtype = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32
    for h in range(heads):
        q = q_ref[0, :, h * d : (h + 1) * d].astype(mxu_dtype)
        k = k_ref[0, :, h * d : (h + 1) * d].astype(mxu_dtype)
        v = v_ref[0, :, h * dv : (h + 1) * dv].astype(mxu_dtype)
        s_ref[...] = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )
        m = jnp.max(s_ref[...], axis=1, keepdims=True)
        s_ref[...] = jnp.exp(s_ref[...] - m)
        denom = jnp.sum(s_ref[...], axis=1, keepdims=True)
        o = jnp.dot(
            s_ref[...].astype(mxu_dtype), v,
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * dv : (h + 1) * dv] = (
            o / jnp.maximum(denom, 1e-30)
        ).astype(o_ref.dtype)


def _blf_pick_hpb(l, h, d, dv, dtype):
    """Largest head block whose lane width is legal AND fits VMEM, or None.

    Lane legality: the block's minor dim must be a multiple of the 128
    lane tile — hpb·D (and hpb·Dv) ≡ 0 (mod 128) — or the full array dim
    (hpb == H). The sublane axis holds L (full dim, always legal), so the
    H=12 8-divisibility wall that killed the 4-D BLHD specs never
    applies. Whole-row scores only (no row chunking): callers gate on L.

    VMEM model (MEASURED, chain r5-02): Mosaic does NOT reuse the f32
    score buffer across the Python-unrolled head bodies — the ViT shape
    at hpb=6 allocated 19.14M scoped (limit 16M): ≈ hpb·4·L² score bytes
    + double-buffered in/out blocks + one shared exp buffer. The PSA
    shape at hpb=2 (≈13.6M by this model) compiled and ran 2.24 ms vs
    the 2.80 ms BHLD incumbent. Cap calibration (chain r5-03): the ViT
    shape at hpb=4 — 14.27M by this model — compiled and ran on chip
    (3.719 ms vs hpb=2's 3.77), so the cap sits just above it; hpb=6
    (17.2M modeled, 19.14M actual) is the measured crash."""
    elem = jnp.dtype(dtype).itemsize
    legal = {
        c
        for c in range(1, h + 1)
        if h % c == 0 and ((c * d) % 128 == 0 and (c * dv) % 128 == 0 or c == h)
    }

    def scoped_bytes(hpb):
        blocks = 2 * 2 * l * hpb * (d + dv) * elem  # q,k,v,o double-buffered
        scores = hpb * 4 * l * l  # f32, one live buffer PER unrolled head
        exp = (2 if dtype == jnp.bfloat16 else 4) * l * l  # shared
        return blocks + scores + exp

    fitting = [hpb for hpb in legal if scoped_bytes(hpb) <= 14.3e6]
    return max(fitting) if fitting else None


def blf_supported(l: int, h: int, d: int, dv: int, dtype) -> bool:
    """Whether the lane-folded (B, L, H·D) variant can run at this shape."""
    return l % 16 == 0 and _blf_pick_hpb(l, h, d, dv, dtype) is not None


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "sm_scale", "heads_per_block", "interpret", "scratch"
    ),
)
def encoder_attention_blf(
    q: jnp.ndarray,  # (B, L, H*D) — head-major lane layout
    k: jnp.ndarray,  # (B, L, H*D)
    v: jnp.ndarray,  # (B, L, H*Dv)
    heads: int,
    sm_scale: Optional[float] = None,
    heads_per_block: Optional[int] = None,
    interpret: bool = False,
    scratch: bool = False,
) -> jnp.ndarray:
    """Zero-transpose whole-row attention over lane-folded head slabs.

    Same math as ``encoder_attention`` (unmasked per-row softmax); the
    operands never leave the plain (B, L, features) GEMM layout, so the
    q/k/v projections, the kernel DMA, and the out-projection all run on
    the layout XLA would pick for the matmuls anyway. Returns
    (B, L, H·Dv) in q's dtype."""
    b, l, f = q.shape
    assert f % heads == 0 and v.shape[2] % heads == 0, (f, v.shape, heads)
    d = f // heads
    dv = v.shape[2] // heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if heads_per_block is None:
        heads_per_block = _blf_pick_hpb(l, heads, d, dv, q.dtype)
        if heads_per_block is None:
            raise ValueError(
                f"no legal lane-folded head block at {q.shape} — guard with "
                "blf_supported() before dispatching"
            )
    assert heads % heads_per_block == 0, (heads, heads_per_block)

    def spec(depth):
        return pl.BlockSpec(
            (1, l, heads_per_block * depth),
            lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        )

    kern = _enc_attn_blf_scratch_kernel if scratch else _enc_attn_blf_kernel
    return pl.pallas_call(
        functools.partial(
            kern,
            sm_scale=sm_scale,
            heads=heads_per_block,
            d=d,
            dv=dv,
        ),
        grid=(b, heads // heads_per_block),
        in_specs=[spec(d), spec(d), spec(dv)],
        out_specs=spec(dv),
        out_shape=jax.ShapeDtypeStruct((b, l, heads * dv), q.dtype),
        scratch_shapes=[pltpu.VMEM((l, l), jnp.float32)] if scratch else [],
        interpret=interpret,
    )(q, k, v)


def _enc_attn_blf_packed_kernel(
    qkv_ref,  # (1, L, hpb*stride) — per head [q(kd) | k(kd) | v(hd)]
    o_ref,  # (1, L, hpb*hd)
    *,
    sm_scale: float,
    heads: int,
    kd: int,
    hd: int,
):
    """Packed-slab variant of the lane-folded kernel for attention whose
    q/k/v arrive interleaved per head from ONE projection — the YOLOv10
    PSA layout (ultralytics ``Attention``: channels per head are
    [q|k|v], ``models/layers.py::PSAAttention``). No split, no
    transpose: the per-head operands are static lane slices of the one
    conv output."""
    stride = 2 * kd + hd
    mxu_dtype = qkv_ref.dtype if qkv_ref.dtype == jnp.bfloat16 else jnp.float32
    for h in range(heads):
        base = h * stride
        q = qkv_ref[0, :, base : base + kd].astype(mxu_dtype)
        k = qkv_ref[0, :, base + kd : base + 2 * kd].astype(mxu_dtype)
        v = qkv_ref[0, :, base + 2 * kd : base + stride].astype(mxu_dtype)
        scores = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        o = jnp.dot(e.astype(mxu_dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd : (h + 1) * hd] = (
            o / jnp.maximum(denom, 1e-30)
        ).astype(o_ref.dtype)


def _blf_packed_pick_hpb(l, heads, kd, hd, dtype):
    """Head block for the packed layout under the measured VMEM model
    (see ``_blf_pick_hpb``): per-unrolled-head f32 scores are NOT reused."""
    elem = jnp.dtype(dtype).itemsize
    stride = 2 * kd + hd
    legal = {
        c
        for c in range(1, heads + 1)
        if heads % c == 0
        and ((c * stride) % 128 == 0 and (c * hd) % 128 == 0 or c == heads)
    }

    def scoped_bytes(hpb):
        blocks = 2 * l * hpb * (stride + hd) * elem  # in+out, double-buffered
        scores = hpb * 4 * l * l
        exp = (2 if dtype == jnp.bfloat16 else 4) * l * l
        return blocks + scores + exp

    fitting = [hpb for hpb in legal if scoped_bytes(hpb) <= 14e6]
    return max(fitting) if fitting else None


def blf_packed_supported(l: int, heads: int, kd: int, hd: int, dtype) -> bool:
    return (
        l % 16 == 0
        and _blf_packed_pick_hpb(l, heads, kd, hd, dtype) is not None
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "key_dim", "head_dim", "sm_scale", "heads_per_block",
        "interpret",
    ),
)
def encoder_attention_blf_packed(
    qkv: jnp.ndarray,  # (B, L, heads*(2*key_dim+head_dim)), per-head [q|k|v]
    heads: int,
    key_dim: int,
    head_dim: int,
    sm_scale: Optional[float] = None,
    heads_per_block: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-row attention straight off a packed per-head [q|k|v] slab.

    Returns (B, L, heads·head_dim) in qkv's dtype. The PSA probe result
    that motivated this: the split-operand lane-folded kernel ran the
    (30, 1024, 4, 64→128) detector shape at 2.24 ms vs the transposing
    whole-row kernel's 2.80 ms (chain r5-02)."""
    b, l, f = qkv.shape
    stride = 2 * key_dim + head_dim
    assert f == heads * stride, (f, heads, key_dim, head_dim)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(key_dim)
    if heads_per_block is None:
        heads_per_block = _blf_packed_pick_hpb(
            l, heads, key_dim, head_dim, qkv.dtype
        )
        if heads_per_block is None:
            raise ValueError(
                f"no legal packed head block at {qkv.shape} — guard with "
                "blf_packed_supported()"
            )
    assert heads % heads_per_block == 0, (heads, heads_per_block)

    out = pl.pallas_call(
        functools.partial(
            _enc_attn_blf_packed_kernel,
            sm_scale=sm_scale,
            heads=heads_per_block,
            kd=key_dim,
            hd=head_dim,
        ),
        grid=(b, heads // heads_per_block),
        in_specs=[
            pl.BlockSpec(
                (1, l, heads_per_block * stride),
                lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, l, heads_per_block * head_dim),
            lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, heads * head_dim), qkv.dtype),
        interpret=interpret,
    )(qkv)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "valid_len", "heads_per_block", "row_block",
        "interpret", "bhld_inputs",
    ),
)
def encoder_attention(
    q: jnp.ndarray,  # (B, L, H, D) — or (B, H, L, D) with bhld_inputs
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: Optional[float] = None,
    valid_len: Optional[int] = None,
    heads_per_block: Optional[int] = None,
    row_block: Optional[int] = None,
    interpret: bool = False,
    bhld_inputs: bool = False,
) -> jnp.ndarray:
    """Whole-row single-pass attention for short unmasked encoder shapes.

    ``valid_len`` (static) masks trailing padded keys — the Mllama vision
    tower's 1601-of-1608 prefix. L must be a multiple of the dtype sublane
    tile (16 for bf16); callers pad or take the XLA path otherwise.
    Returns (B, L, H, D) in q's dtype.

    ``bhld_inputs``: inputs AND output are (B, H, L, D) — the flatten to
    the kernel's (B·H, L, D) slab is a free leading-dim merge instead of
    a relayout transpose. Callers project q/k/v straight into this layout
    (``einsum("blc,chd->bhld")``) so the head transpose becomes matmul
    output indexing (chain r4-06 probe: 5.04 vs 5.42ms at the ViT-B
    shape).
    """
    if bhld_inputs:
        b, h, l, d = q.shape
    else:
        b, l, h, d = q.shape
    dv = v.shape[3]  # Dv ≠ Dk supported (the detector's PSA attention
    # runs q/k at half the value width, v10 ratio 0.5)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    # intermediate bytes/elem: f32 scores + exp in the MXU dtype (bf16
    # inputs cast the exp operand down; f32 inputs keep it f32 — 8 B/elem)
    ib = 6 if q.dtype == jnp.bfloat16 else 8
    if row_block is None:
        # whole-row while the (L, L) scores + exp fit an ~8MB share of
        # the 16MB scoped VMEM; beyond that, chunk q rows (16-aligned for
        # the bf16 sublane tile; exact — softmax is per-row). The
        # 1616-token bf16 Mllama shape lands at rb=608.
        if l * l * ib > 8e6:
            row_block = max(16, int(6e6 // (l * ib)) // 16 * 16)
    if row_block is not None and row_block >= l:
        row_block = None  # degenerate chunking → whole-row
    rb_eff = row_block or l
    if heads_per_block is None:
        # budget VMEM: ~ib·rb·L intermediates + in+out blocks (q, k:
        # hpb·L·D; v, o: hpb·L·Dv, double-buffered) within ~13MB of the
        # 16MB scoped limit (the whole-row 1616 shape measured 17.46MB
        # at hpb=2 when the intermediates went unbudgeted)
        inter = ib * rb_eff * l
        elem = q.dtype.itemsize
        per_head = 2 * 2 * l * (d + dv) * elem
        hpb = max(1, min(h, int((13e6 - inter) // max(per_head, 1))))
        while h % hpb:
            hpb -= 1
        heads_per_block = hpb

    assert h % heads_per_block == 0, (h, heads_per_block)

    # (B, L, H, D) → (B*H, L, D): D stays minor (full-lane rows), heads
    # become leading blocks so the kernel indexes them as major rows.
    # bhld inputs skip the transpose: merging leading dims is layout-free.
    def to_bh(x):
        if bhld_inputs:
            return x.reshape(b * h, l, x.shape[3])
        return x.transpose(0, 2, 1, 3).reshape(b * h, l, x.shape[3])

    def spec(depth):
        return pl.BlockSpec(
            (heads_per_block, l, depth),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid = (b * h // heads_per_block,)
    out = pl.pallas_call(
        functools.partial(
            _enc_attn_kernel,
            sm_scale=sm_scale,
            heads=heads_per_block,
            valid_len=valid_len,
            row_block=row_block,
        ),
        grid=grid,
        in_specs=[spec(d), spec(d), spec(dv)],
        out_specs=spec(dv),
        out_shape=jax.ShapeDtypeStruct((b * h, l, dv), q.dtype),
        interpret=interpret,
    )(to_bh(q), to_bh(k), to_bh(v))
    if bhld_inputs:
        return out.reshape(b, h, l, dv)
    return out.reshape(b, h, l, dv).transpose(0, 2, 1, 3)


def encoder_attention_padded(
    q: jnp.ndarray,  # (B, L, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,  # (B, L, H, Dv)
    valid_len: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Prefix-masked attention at lengths that aren't sublane-aligned.

    Pads L up to the next multiple of 16 (bf16 sublane tile), runs the
    kernel with ``valid_len`` masking the padded + invalid keys, and
    slices the pad rows back off — the Mllama vision tower's
    1601-of-1608 sequence lands at L=1608 (≡ 8 mod 16) and takes this
    path (``models/mme5.py`` single-tile serving dispatch).
    """
    l = q.shape[1]
    assert 0 < valid_len <= l, (valid_len, l)
    lp = -(-l // 16) * 16
    if lp != l:
        pad = ((0, 0), (0, lp - l), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = encoder_attention(q, k, v, valid_len=valid_len, interpret=interpret)
    return out[:, :l] if lp != l else out
