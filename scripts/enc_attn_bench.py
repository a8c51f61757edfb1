"""TPU microbench: whole-row single-pass encoder attention kernel
(kernels/encoder_attention.py) vs the XLA bf16-logits sdpa at the
pipeline's encoder shapes.

Hypothesis being tested (r3 trace): the XLA path pays ~5 HBM passes over
the (B, H, L, L) logits per layer; the flash kernels lose here because
their online-softmax block loops degenerate into ~28k tiny MXU ops. The
whole-row kernel keeps one head's full (L, L) score matrix in VMEM, so it
pays flash's HBM traffic with plain (no-rescaling) softmax and ~1 GFLOP
MXU work per program.

Timing uses a small value fetch — ``block_until_ready`` is not a
completion barrier over the axon tunnel (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import sys as _sys

sys_path_root = __file__.rsplit("/", 2)[0]
if sys_path_root not in _sys.path:
    _sys.path.insert(0, sys_path_root)


def _setup():
    import jax

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms:
        jax.config.update("jax_platforms", platforms + ",cpu")
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time_fn(fn, *args, iters=20):
    import jax

    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    _setup()
    import functools

    import jax
    import jax.numpy as jnp

    from multimodal_embeddings_tpu.kernels.encoder_attention import (
        encoder_attention,
    )

    def xla_sdpa(q, k, v, valid_len=None):
        b, lq, h, d = q.shape
        pref = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        logits = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=pref
        )
        logits = logits.astype(jnp.float32) * (1.0 / np.sqrt(d))
        if valid_len is not None:
            mask = jnp.arange(k.shape[1]) < valid_len
            logits = jnp.where(mask[None, None, None, :], logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhlm,bmhd->blhd", w, v)

    cases = [
        # the headline serving shape: 48 crops x ViT-B/16 @448
        ("siglip_vitb_448", dict(b=48, l=784, h=12, d=64), None),
        # mme5-2B vision chunk, padded to the kernel's 16-sublane multiple
        ("mme5_vision_2b_pad16", dict(b=8, l=1616, h=16, d=80), 1601),
    ]
    results = {}
    for name, shp, valid in cases:
        b, l, h, d = shp["b"], shp["l"], shp["h"], shp["d"]
        kq, kk, kv = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(kq, (b, l, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, l, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, l, h, d), jnp.bfloat16)

        entry = {}
        f_x = jax.jit(functools.partial(xla_sdpa, valid_len=valid))
        entry["xla_ms"] = 1e3 * _time_fn(f_x, q, k, v)
        for hpb in sorted({1, 2, max(1, h // 4), max(1, h // 2), h}):
            if h % hpb:
                continue
            try:
                f_k = functools.partial(
                    encoder_attention,
                    valid_len=valid,
                    heads_per_block=hpb,
                )
                entry[f"kernel_hpb{hpb}_ms"] = 1e3 * _time_fn(f_k, q, k, v)
            except Exception as e:  # OOM / mosaic failure: record, continue
                entry[f"kernel_hpb{hpb}_ms"] = (
                    f"error: {type(e).__name__}: {e}"[:160]
                )
        # numerics sanity on chip (vs the f32 reference path)
        ref = xla_sdpa(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), valid_len=valid,
        )
        got = encoder_attention(q, k, v, valid_len=valid)
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref))
        )
        entry["max_abs_err_vs_f32"] = err
        results[name] = entry
        print(name, json.dumps(entry), flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "scripts", "enc_attn_results.json"), "w") as f:
        json.dump(
            {"results": results, "measured": time.strftime("%Y-%m-%d")},
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
