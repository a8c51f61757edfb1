"""Chain-24 closure probe: encoder-attention layout variants on chip.

The BLHD kernel (kernels/encoder_attention.py::encoder_attention_blhd)
died in Mosaic twice (chain 23: block legality; chain r4-01: dynamic
per-head slice needs index %4==0 under bf16 packing). This probe measures
every remaining route to killing the ~7.5 ms/page of relayout copies
around the BHLD call (r3 headline trace), in one ViT-B-shaped mini block
(qkv proj + attention + out proj, jitted, params as args):

  xla        — plain XLA einsum attention (control A)
  bhld       — transpose + BHLD whole-row kernel (current default, control B)
  blhd_static— BLHD slab, per-head STATIC-unrolled slices (legality probe)
  blhd_grid  — per-head BlockSpec (1, L, 1, D), grid (B, H) (legality probe)
  proj_bhld  — projections einsum DIRECTLY to (B,H,L,D), kernel without
               to_bh, out-proj from (B,H,L,Dv): the transposes become part
               of the matmul indexing instead of standalone copies

Variants that fail to compile print {"error": ...} instead of timing —
a legality negative is a result, not a crash.

Run: python scripts/enc_attn_blhd_probe.py --variant <name> [--shape vit|psa]
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    import jax

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms:
        jax.config.update("jax_platforms", platforms + ",cpu")
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch_tiny(out):
    import numpy as np

    import jax

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[:2])


def _time_fn(fn, *args, iters=20):
    out = fn(*args)
    _fetch_tiny(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch_tiny(out)
    return (time.perf_counter() - t0) / iters


def _blhd_static_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, heads):
    """BLHD slab with a PYTHON-unrolled head loop: every slice offset is a
    compile-time literal (the fori_loop variant's dynamic dim-2 index was
    rejected: 'cannot statically prove index is a multiple of 4')."""
    import jax
    import jax.numpy as jnp

    mxu_dtype = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32
    for h in range(heads):
        q = q_ref[0, :, h, :].astype(mxu_dtype)
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


def blhd_static(q, k, v, sm_scale):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, h, d = q.shape
    dv = v.shape[3]

    def spec(depth):
        return pl.BlockSpec(
            (1, l, h, depth), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(_blhd_static_kernel, sm_scale=sm_scale, heads=h),
        grid=(b,),
        in_specs=[spec(d), spec(d), spec(dv)],
        out_specs=spec(dv),
        out_shape=jax.ShapeDtypeStruct((b, l, h, dv), q.dtype),
    )(q, k, v)


def _perhead_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    import jax
    import jax.numpy as jnp

    mxu_dtype = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32
    q = q_ref[0, :, 0, :].astype(mxu_dtype)
    k = k_ref[0, :, 0, :].astype(mxu_dtype)
    v = v_ref[0, :, 0, :].astype(mxu_dtype)
    scores = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * sm_scale
    )
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    o = jnp.dot(e.astype(mxu_dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, :, 0, :] = (o / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)


def blhd_grid(q, k, v, sm_scale):
    """Per-head blocks straight out of the BLHD array: the DMA engine does
    the head gather instead of an XLA transpose. Legality unknown — the
    block's second-minor dim is 1 (not 8, not full H)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, h, d = q.shape
    dv = v.shape[3]

    def spec(depth):
        return pl.BlockSpec(
            (1, l, 1, depth), lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(_perhead_kernel, sm_scale=sm_scale),
        grid=(b, h),
        in_specs=[spec(d), spec(d), spec(dv)],
        out_specs=spec(dv),
        out_shape=jax.ShapeDtypeStruct((b, l, h, dv), q.dtype),
    )(q, k, v)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--variant",
        required=True,
        choices=["xla", "bhld", "blhd_static", "blhd_grid", "proj_bhld",
                 "blf", "blf_packed"],
    )
    parser.add_argument("--shape", default="vit", choices=["vit", "psa"])
    parser.add_argument(
        "--scratch", action="store_true",
        help="blf only: route scores through ONE shared (L,L) f32 scratch "
        "ref instead of per-unrolled-head temps — the VMEM fix that "
        "should admit hpb 6/12 at the ViT shape",
    )
    parser.add_argument(
        "--hpb", type=int, default=None,
        help="blf head-block override: isolates whether the remote-compiler "
        "crash at the picker's hpb is VMEM pressure from the unrolled "
        "per-head score/exp buffers (hpb bodies x ~3.7MB if Mosaic "
        "doesn't reuse across the unroll)",
    )
    args = parser.parse_args()
    _setup()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.shape == "vit":
        b, l, h, d, dv = 48, 784, 12, 64, 64
    else:  # detector PSA: q/k at half the value width (v10 ratio 0.5)
        b, l, h, d, dv = 30, 1024, 4, 64, 128
    c = h * dv  # model width
    sm_scale = 1.0 / math.sqrt(d)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32), jnp.bfloat16)
    wq = jnp.asarray(
        rng.normal(size=(c, h, d)).astype(np.float32) / math.sqrt(c),
        jnp.bfloat16,
    )
    wk = jnp.asarray(
        rng.normal(size=(c, h, d)).astype(np.float32) / math.sqrt(c),
        jnp.bfloat16,
    )
    wv = jnp.asarray(
        rng.normal(size=(c, h, dv)).astype(np.float32) / math.sqrt(c),
        jnp.bfloat16,
    )
    wo = jnp.asarray(
        rng.normal(size=(h, dv, c)).astype(np.float32) / math.sqrt(c),
        jnp.bfloat16,
    )

    from multimodal_embeddings_tpu.kernels.encoder_attention import (
        encoder_attention,
    )

    variant = args.variant

    if variant == "blf_packed":
        # per-head [q|k|v] packed slab straight off ONE projection (the
        # PSA conv layout, models/layers.py) — no split, no transpose
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blf_packed,
        )

        stride = 2 * d + dv
        wqkv = jnp.asarray(
            rng.normal(size=(c, h * stride)).astype(np.float32)
            / math.sqrt(c),
            jnp.bfloat16,
        )

        @jax.jit
        def block(x, wq, wk, wv, wo):
            qkv = x @ wqkv
            o = encoder_attention_blf_packed(
                qkv, heads=h, key_dim=d, head_dim=dv, sm_scale=sm_scale,
                heads_per_block=args.hpb,
            )
            return o @ wo.reshape(h * dv, c)

    elif variant == "blf":
        # lane-folded zero-transpose form (round 5): plain GEMMs to
        # (B, L, H·D), per-head static LANE slices in-kernel — the one
        # true-BLHD route the Mosaic sublane 8-divisibility wall (H=12)
        # does not touch
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blf,
        )

        @jax.jit
        def block(x, wq, wk, wv, wo):
            q = x @ wq.reshape(c, h * d)
            k = x @ wk.reshape(c, h * d)
            v = x @ wv.reshape(c, h * dv)
            o = encoder_attention_blf(
                q, k, v, heads=h, sm_scale=sm_scale,
                heads_per_block=args.hpb, scratch=args.scratch,
            )
            return o @ wo.reshape(h * dv, c)

    elif variant == "proj_bhld":

        @jax.jit
        def block(x, wq, wk, wv, wo):
            # projections emit (B, H, L, D) DIRECTLY — the head transpose
            # is matmul output indexing, not a standalone copy
            q = jnp.einsum("blc,chd->bhld", x, wq)
            k = jnp.einsum("blc,chd->bhld", x, wk)
            v = jnp.einsum("blc,chd->bhld", x, wv)
            o = _bhld_attn(q, k, v)
            return jnp.einsum("bhld,hdc->blc", o, wo)

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            _enc_attn_kernel,
        )

        def _bhld_attn(q, k, v):
            bb, hh, ll, ddv = v.shape
            dd = q.shape[3]
            qf = q.reshape(bb * hh, ll, dd)
            kf = k.reshape(bb * hh, ll, dd)
            vf = v.reshape(bb * hh, ll, ddv)
            # the wrapper's VMEM head-block budget (encoder_attention):
            # intermediates + double-buffered in/out blocks within ~13MB
            # (the first probe run forced hpb=H=12 → ~23MB → Mosaic OOM)
            import jax.numpy as jnp

            ib = 6 if q.dtype == jnp.bfloat16 else 8
            inter = ib * ll * ll
            per_head = 2 * 2 * ll * (dd + ddv) * q.dtype.itemsize
            hpb = max(1, min(hh, int((13e6 - inter) // max(per_head, 1))))
            while hh % hpb:
                hpb -= 1

            def spec(depth):
                return pl.BlockSpec(
                    (hpb, ll, depth), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )

            out = pl.pallas_call(
                functools.partial(
                    _enc_attn_kernel,
                    sm_scale=sm_scale,
                    heads=hpb,
                    valid_len=None,
                    row_block=None,
                ),
                grid=(bb * hh // hpb,),
                in_specs=[spec(dd), spec(dd), spec(ddv)],
                out_specs=spec(ddv),
                out_shape=jax.ShapeDtypeStruct((bb * hh, ll, ddv), q.dtype),
            )(qf, kf, vf)
            return out.reshape(bb, hh, ll, ddv)

    else:

        @jax.jit
        def block(x, wq, wk, wv, wo):
            q = jnp.einsum("blc,chd->blhd", x, wq)
            k = jnp.einsum("blc,chd->blhd", x, wk)
            v = jnp.einsum("blc,chd->blhd", x, wv)
            if variant == "xla":
                logits = jnp.einsum(
                    "blhd,bmhd->bhlm", q, k,
                    preferred_element_type=jnp.bfloat16,
                )
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32) * sm_scale, axis=-1
                ).astype(q.dtype)
                o = jnp.einsum("bhlm,bmhd->blhd", probs, v)
            elif variant == "bhld":
                o = encoder_attention(q, k, v, sm_scale=sm_scale)
            elif variant == "blhd_static":
                o = blhd_static(q, k, v, sm_scale)
            else:
                o = blhd_grid(q, k, v, sm_scale)
            return jnp.einsum("blhd,hdc->blc", o, wo)

    try:
        dt = _time_fn(block, x, wq, wk, wv, wo)
        out = {
            "variant": variant,
            "shape": args.shape,
            "dims": [b, l, h, d, dv],
            "ms": round(dt * 1e3, 3),
        }
    except Exception as exc:  # noqa: BLE001 — legality negatives are results
        out = {
            "variant": variant,
            "shape": args.shape,
            "error": f"{type(exc).__name__}: {str(exc)[:1200]}",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
