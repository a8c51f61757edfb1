"""TPU sweep: int8_matmul block sizes at the 11B serving shapes.

The kernel's fixed (128, 128, 512) blocks mean a text-side matmul at
M≈32 (chunk-2 prompts through the 40-layer stack) runs ~900 grid steps
of 64KB weight blocks — per-step overhead (~1-2µs of DMA issue /
semaphores / scalar core) swamps the ~0.3µs of real work, which is the
leading explanation for the ~100 ms/crop of unattributed 11B text time
(vision accounts for only ~27 ms/crop via the 2B line). Bigger
(whole-K × wide-N) blocks cut the step count by 30-60×.

Sweeps block configs per serving shape; reports weight-streaming GB/s
(the resource this op should saturate). Timing via value fetch
(CLAUDE.md: block_until_ready is not a barrier over the tunnel).
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

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time_fn(fn, *args, iters=10):
    out = fn(*args)
    _ = np.asarray(out.ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(out.ravel()[:2])
    return (time.perf_counter() - t0) / iters


# (M, K, N) — 11B text stack at chunk 2 (M = 2 prompts), vision tower at
# two stacked single-tile crops (M = 2*1608)
SHAPES = {
    "text_qo_32x4096x4096": (32, 4096, 4096),
    "text_gateup_32x4096x14336": (32, 4096, 14336),
    "text_down_32x14336x4096": (32, 14336, 4096),
    "vis_qkv_3216x1280x3840": (3216, 1280, 3840),
    "vis_mlp_3216x1280x5120": (3216, 1280, 5120),
    "vis_mlpdown_3216x5120x1280": (3216, 5120, 1280),
    # decoupled text stack at text_chunk 8/16 (M = 32·chunk): the r4-01
    # text_chunk A/B ran these OFF-TABLE (pick_blocks only covered M≈32
    # and M≈3.3k) — verdict r4 #2 wants the sweep before the re-A/B
    "text_qo_256x4096x4096": (256, 4096, 4096),
    "text_gateup_256x4096x14336": (256, 4096, 14336),
    "text_down_256x14336x4096": (256, 14336, 4096),
    "text_qo_512x4096x4096": (512, 4096, 4096),
    "text_gateup_512x4096x14336": (512, 4096, 14336),
    "text_down_512x14336x4096": (512, 14336, 4096),
}

# (block_m, block_n, block_k); block_m/k are clamped inside int8_matmul
CONFIGS = [
    (128, 128, 512),  # current default
    (128, 512, 2048),
    (128, 512, 4096),
    (128, 1024, 2048),
    (128, 2048, 1024),
    (256, 512, 1024),
    (512, 512, 1024),
    (512, 256, 2048),
]


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--only", default=None,
        help="substring filter over shape labels (e.g. '256x' to sweep "
        "only the text_chunk-8 class); results MERGE into the existing "
        "int8_tune_results.json",
    )
    args = parser.parse_args()
    _setup()
    import jax
    import jax.numpy as jnp

    from multimodal_embeddings_tpu.kernels.quantization import int8_matmul

    # amortize the ~4ms single-program dispatch floor (the first sweep's
    # numbers were all dispatch-bound: every config 4-10ms while the SAME
    # ops run 0.3-1.6ms in-model) over K_CALLS distinct weight tensors
    # summed inside ONE jit program
    K_CALLS = 16
    rng = np.random.default_rng(0)
    results = {}
    for label, (m, k, n) in SHAPES.items():
        if args.only and args.only not in label:
            continue
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
        qs = jnp.asarray(
            rng.integers(-127, 128, size=(K_CALLS, k, n)), jnp.int8
        )
        s = jnp.asarray(rng.uniform(0.01, 0.02, size=(n,)).astype(np.float32))
        wbytes = K_CALLS * k * n  # int8 weight traffic per program
        flops = 2 * m * k * n * K_CALLS
        shape_res = {}
        seen = set()
        for bm, bn, bk in CONFIGS:
            bm_eff = min(bm, max(8, 1 << (m - 1).bit_length()))
            bk_eff, bn_eff = min(bk, k), min(bn, n)
            key = (bm_eff, bn_eff, bk_eff)
            if key in seen:
                continue
            seen.add(key)
            name = f"bm{bm_eff}_bn{bn_eff}_bk{bk_eff}"

            @jax.jit
            def fn(x, qs, s, _cfg=(bm_eff, bn_eff, bk_eff)):
                bm_, bn_, bk_ = _cfg
                acc = jnp.zeros((), jnp.float32)
                for i in range(K_CALLS):
                    out = int8_matmul(
                        x, qs[i], s, block_m=bm_, block_n=bn_, block_k=bk_
                    )
                    # tiny slice keeps the dependency without paying a
                    # full-output reduce; the pallas call is opaque so
                    # XLA cannot narrow the matmul to the slice
                    acc = acc + out[:8, :128].astype(jnp.float32).sum()
                return acc

            try:
                t = _time_fn(lambda a, b, c: fn(a, b, c).reshape(1), x, qs, s)
            except Exception as e:
                shape_res[name] = {"error": repr(e)[:160]}
                print(label, name, "ERROR", repr(e)[:120], flush=True)
                continue
            shape_res[name] = {
                "ms_per_call": round(t * 1e3 / K_CALLS, 3),
                "weightGB/s": round(wbytes / t / 1e9, 1),
                "TFLOP/s": round(flops / t / 1e12, 2),
            }
            print(label, name, shape_res[name], flush=True)
        results[label] = shape_res

    out_path = os.path.join(os.path.dirname(__file__), "int8_tune_results.json")
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
