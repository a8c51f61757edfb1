"""Single-chip int4 kernel validation + 11B int4 serving smoke.

Two stages, one JSON line each:

1. ``--micro``: the packed-int4 Pallas matmul
   (``kernels/quantization_int4.py``) at the mme5-11B serving shapes —
   exactness vs the f32 dequant reference (validates the Mosaic lowering
   of the nibble unpack on real hardware) and latency vs the int8 kernel
   and the XLA bf16 matmul.
2. ``--full``: the full 11B Mllama layout with packed int4 weights
   (~5.5GB dense vs int8's ~10GB) through a real forward — the 4-bit
   counterpart of ``int8_11b_smoke.py``. If the measured 126.7 ms/crop
   int8 rate (BENCH_MME5_11B.json) is weight-bandwidth-bound, halving
   weight bytes should show up here.

Weights are synthetic (zero egress); capacity/latency evidence only,
accuracy gated on a checkpoint like every other synthetic init here.

Run: ``python scripts/int4_kernel_smoke.py [--micro] [--full] [--batch 2]``
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch_sync(x) -> float:
    """Timing barrier that works through the axon tunnel (CLAUDE.md:
    block_until_ready is not a completion barrier for small programs)."""
    import numpy as np

    return float(np.asarray(x).ravel()[0])


def run_micro() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_embeddings_tpu.kernels.quantization import (
        int8_matmul,
        quantize_tensor,
    )
    from multimodal_embeddings_tpu.kernels.quantization_int4 import (
        dequantize_int4,
        int4_matmul,
        quantize_tensor_int4,
    )

    # mme5-11B serving shapes: text mlp up/down at chunk-2 (3234 tokens),
    # vision qkv at 2x1601 tokens, and a skinny decode-like M=64
    shapes = [
        (3234, 4096, 14336),
        (3234, 14336, 4096),
        (3202, 1280, 5120),
        (64, 4096, 14336),
    ]
    results = []
    rng = np.random.default_rng(0)
    for m, k, n in shapes:
        x = jnp.asarray(
            rng.normal(size=(m, k)).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        q4 = quantize_tensor_int4(w)
        q8 = quantize_tensor(w, (0,))
        wb = w.astype(jnp.bfloat16)

        # exactness on hardware: kernel vs f32 dequant reference
        out4 = int4_matmul(x, q4.packed, q4.scale)
        ref = (
            x.astype(jnp.float32) @ dequantize_int4(q4, jnp.float32)
        ).astype(jnp.bfloat16)
        err = float(
            jnp.max(
                jnp.abs(
                    out4.astype(jnp.float32) - ref.astype(jnp.float32)
                )
            )
            / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
        )

        def time_fn(fn, iters=8):
            out = fn()
            _fetch_sync(out[0, :1])  # compile + sync
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            _fetch_sync(out[0, :1])
            return (time.perf_counter() - t0) / iters * 1e3

        t4 = time_fn(lambda: int4_matmul(x, q4.packed, q4.scale))
        t8 = time_fn(lambda: int8_matmul(x, q8.q, q8.scale))
        txla = time_fn(lambda: x @ wb)
        results.append(
            {
                "shape": [m, k, n],
                "rel_err_vs_dequant": round(err, 5),
                "int4_ms": round(t4, 3),
                "int8_ms": round(t8, 3),
                "xla_bf16_ms": round(txla, 3),
            }
        )
        print(f"  {m}x{k}x{n}: int4 {t4:.2f}ms int8 {t8:.2f}ms "
              f"bf16 {txla:.2f}ms err {err:.2e}", file=sys.stderr)
    return {"micro": results}


def run_full(batch: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
    from multimodal_embeddings_tpu.models.quantized import (
        param_bytes,
        synthetic_int8_init,
    )

    cfg = MllamaConfig.mme5_11b_int4()
    model = MmE5Embedder(cfg, dtype=jnp.bfloat16)

    b = batch
    text_len = 16
    size = cfg.vision.image_size
    tiles = cfg.vision.max_tiles
    ids = jnp.zeros((b, text_len), jnp.int32)
    mask = jnp.ones((b, text_len), jnp.int32)
    images = jnp.zeros((b, tiles, size, size, 3), jnp.float32)

    t0 = time.time()
    host_vars = synthetic_int8_init(
        model,
        (ids, mask, images, jnp.ones((b,), jnp.int32),
         jnp.ones((b, tiles), jnp.int32)),
    )
    gb = param_bytes(host_vars["params"]) / 2**30
    print(f"built synthetic 11B int4 tree: {gb:.2f} GiB "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)

    t0 = time.time()
    variables = jax.tree.map(jnp.asarray, host_vars)
    jax.block_until_ready(variables)
    print(f"uploaded to chip in {time.time()-t0:.0f}s", file=sys.stderr)

    @jax.jit
    def embed(v, ids, mask, images):
        return model.apply(v, ids, mask, images)

    t0 = time.time()
    out = embed(variables, ids, mask, images)
    _ = np.asarray(out)
    compile_s = time.time() - t0

    t0 = time.time()
    n = 4
    for _ in range(n):
        out = embed(variables, ids, mask, images)
    _ = np.asarray(out)
    per_crop_ms = (time.time() - t0) / (n * b) * 1e3

    mem = jax.devices()[0].memory_stats() or {}
    return {
        "metric": f"mme5-11B int4 single-chip forward (batch {b}, 1601 "
        "vision tokens/crop + 40-layer text)",
        "params_gib": round(gb, 2),
        "hbm_in_use_gib": round(mem.get("bytes_in_use", 0) / 2**30, 2),
        "compile_plus_first_run_s": round(compile_s, 1),
        "ms_per_crop": round(per_crop_ms, 1),
        "int8_baseline_ms_per_crop": 126.7,  # BENCH_MME5_11B.json
        "device": str(jax.devices()[0]),
    }


def main() -> None:
    import argparse

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--micro", action="store_true")
    parser.add_argument("--full", action="store_true")
    parser.add_argument("--batch", type=int, default=2)
    args = parser.parse_args()
    if not (args.micro or args.full):
        args.micro = True

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms:
        jax.config.update("jax_platforms", platforms + ",cpu")
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {}
    if args.micro:
        out.update(run_micro())
    if args.full:
        out.update(run_full(args.batch))
    path = os.path.join(os.path.dirname(__file__), "int4_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
