"""TPU microbench: XLA sdpa vs Pallas flash v1 vs v2 at the pipeline's
encoder attention shapes.

Round-2 measured flash v1 LOSING at encoder scale (6.6 vs 14 ms at L=784)
— the per-q-block K/V streaming re-reads K/V from HBM once per q-block.
``flash_attention_v2`` keeps K/V resident per (batch, head) program and has
never been measured on chip. The shapes:

- siglip ViT-B/16 @448 in the fused page program: B=48 crops, L=784
  patches (mean-pooled tower, no cls), H=12, D=64 — ~27 ms/page of XLA
  attention, the
  headline metric's second-largest component after the detector convs.
- mme5-2B Mllama vision chunk: B=8, L=1608 (1601 valid), H=16, D=80,
  prefix-length masked (the round-2 in-model flash dispatch was reverted
  at 0.55 vs 0.63 p/s; v2 re-opens the question standalone first).

Timing uses a small value fetch — ``block_until_ready`` is not a
completion barrier over the axon tunnel (CLAUDE.md).
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

sys_path_root = __file__.rsplit("/", 2)[0]
import sys as _sys

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


def _fetch_tiny(out):
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


def main() -> None:
    _setup()
    import jax
    import jax.numpy as jnp

    from multimodal_embeddings_tpu.kernels.flash_attention import (
        flash_attention,
        flash_attention_v2,
    )
    from multimodal_embeddings_tpu.models import transformer

    results = {}

    def xla_sdpa(q, k, v, kv_lengths=None):
        # force the XLA einsum path regardless of dispatch thresholds
        if kv_lengths is not None:
            mask = (
                jnp.arange(k.shape[1])[None, :] < kv_lengths[:, None]
            )[:, None, None, :]
        else:
            mask = None
        b, lq, h, d = q.shape
        pref = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=pref)
        logits = logits.astype(jnp.float32) * (1.0 / np.sqrt(d))
        if mask is not None:
            logits = jnp.where(mask, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhlm,bmhd->blhd", w, v)

    cases = [
        ("siglip_vitb_448", dict(b=48, l=784, h=12, d=64), None),
        ("mme5_vision_2b_chunk8", dict(b=8, l=1608, h=16, d=80), 1601),
        ("mme5_vision_11b_chunk2_4tile", dict(b=2, l=6432, h=16, d=80), 6404),
    ]
    for name, shp, valid in cases:
        b, l, h, d = shp["b"], shp["l"], shp["h"], shp["d"]
        key = jax.random.key(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, l, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, l, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, l, h, d), jnp.bfloat16)
        lengths = (
            jnp.full((b,), valid, jnp.int32) if valid is not None else None
        )

        entry = {}
        f_xla = jax.jit(functools.partial(xla_sdpa))
        entry["xla_ms"] = 1e3 * _time_fn(
            lambda q, k, v: f_xla(q, k, v, lengths), q, k, v
        )

        def run_v1(q, k, v):
            return flash_attention(q, k, v, lengths=lengths)

        def run_v2(q, k, v):
            return flash_attention_v2(q, k, v, lengths=lengths)

        try:
            entry["flash_v1_ms"] = 1e3 * _time_fn(jax.jit(run_v1), q, k, v)
        except Exception as e:  # OOM / mosaic failure: record, keep going
            entry["flash_v1_ms"] = f"error: {type(e).__name__}: {e}"[:200]
        try:
            entry["flash_v2_ms"] = 1e3 * _time_fn(jax.jit(run_v2), q, k, v)
        except Exception as e:
            entry["flash_v2_ms"] = f"error: {type(e).__name__}: {e}"[:200]
        results[name] = entry
        print(name, json.dumps(entry), flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "scripts", "attn_candidates_results.json"), "w") as f:
        json.dump(
            {
                "results": results,
                "measured": time.strftime("%Y-%m-%d"),
                "device": "tpu",
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
