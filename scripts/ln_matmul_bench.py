"""TPU microbench: fused LN→matmul Pallas prologue vs the XLA unfused
sequence, at the pipeline's real LN-site shapes.

Sites (bf16):
- ViT-B/448 fused page, ln1→QKV:   M=48·784, K=768,  N=3·768
- ViT-B/448 fused page, ln2→fc1:   M=48·784, K=768,  N=3072
- mme5 vision (2B/11B tower) ln1→QKV per 8-crop chunk:
                                    M=8·1608, K=1280, N=3·1280
- mme5 vision ln2→fc1:              M=8·1608, K=1280, N=5120

Timing barrier = small value fetch (CLAUDE.md: block_until_ready is not a
barrier through the axon tunnel).
"""

from __future__ import annotations

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


def _time_fn(fn, *args, iters=30):
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

    from multimodal_embeddings_tpu.kernels.ln_matmul import ln_matmul

    @jax.jit
    def unfused(x, gamma, beta, w):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
        return jnp.dot(
            xn.astype(x.dtype), w, preferred_element_type=jnp.float32
        ).astype(x.dtype)

    cases = [
        ("vitb_ln1_qkv", 48 * 784, 768, 3 * 768),
        ("vitb_ln2_fc1", 48 * 784, 768, 3072),
        ("mme5v_ln1_qkv", 8 * 1608, 1280, 3 * 1280),
        ("mme5v_ln2_fc1", 8 * 1608, 1280, 5120),
    ]
    results = {}
    for name, m, k, n in cases:
        key = jax.random.key(0)
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (m, k), jnp.bfloat16)
        w = (jax.random.normal(kw, (k, n), jnp.float32) * 0.05).astype(
            jnp.bfloat16
        )
        gamma = jnp.ones((k,), jnp.float32)
        beta = jnp.zeros((k,), jnp.float32)
        entry = {"xla_ms": 1e3 * _time_fn(unfused, x, gamma, beta, w)}
        bn = next(b for b in (768, 512, 384, 256, 128) if n % b == 0)
        for bm in (256, 512):
            try:
                t = _time_fn(
                    lambda x, g, b, w: ln_matmul(
                        x, g, b, w, block_m=bm, block_n=bn
                    ),
                    x,
                    gamma,
                    beta,
                    w,
                )
                entry[f"pallas_bm{bm}_bn{bn}_ms"] = 1e3 * t
            except Exception as e:
                entry[f"pallas_bm{bm}_bn{bn}_ms"] = (
                    f"error: {type(e).__name__}: {e}"[:160]
                )
        results[name] = entry
        print(name, json.dumps(entry), flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "scripts", "ln_matmul_results.json"), "w") as f:
        json.dump(
            {"results": results, "measured": time.strftime("%Y-%m-%d")},
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
