"""Single-chip 11B int8 serving smoke test.

Proves the capacity claim behind ``MllamaConfig.mme5_11b_int8``: the
reference's full embedder size (``intfloat/mmE5-mllama-11b-instruct``,
``deprecated_package/embedder.py:73-83`` — ~22GB in bf16, does not fit a
16GB v5e chip) runs a real forward on ONE chip with int8 weight storage
(~11GB) via the Pallas dequant-in-matmul kernel.

Weights are synthetic (zero egress — no checkpoint exists here): int8
leaves get a cheap deterministic random fill, scales a small constant.
The numbers below are capacity/latency evidence, not accuracy evidence;
accuracy is gated on a real checkpoint (quantize_dense_tree preserves
cosine ≥0.999 on the tiny config, test-locked).

Run: ``python scripts/int8_11b_smoke.py`` (TPU; ~10GB upload + one
compile through the tunnel). Prints one JSON line with HBM use and
per-crop latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms:
        jax.config.update("jax_platforms", platforms + ",cpu")
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
    from multimodal_embeddings_tpu.models.quantized import param_bytes

    cfg = MllamaConfig.mme5_11b_int8()
    model = MmE5Embedder(cfg, dtype=jnp.bfloat16)

    b = args.batch
    text_len = 16
    size = cfg.vision.image_size
    tiles = cfg.vision.max_tiles
    ids = jnp.zeros((b, text_len), jnp.int32)
    mask = jnp.ones((b, text_len), jnp.int32)
    images = jnp.zeros((b, tiles, size, size, 3), jnp.float32)

    # synthetic int8 weights: structure from eval_shape, leaves filled
    # host-side without ever materializing the 44GB f32 tree
    t0 = time.time()
    struct = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0)}, ids, mask, images,
            jnp.ones((b,), jnp.int32), jnp.ones((b, tiles), jnp.int32),
        )
    )
    rng = np.random.default_rng(0)

    import ml_dtypes

    def fill(leaf):
        if leaf.dtype == jnp.int8:
            return rng.integers(-127, 128, leaf.shape, np.int8)
        if str(leaf.dtype).startswith("float"):
            # big fp leaves (embedding/tile tables) stored bf16 — the
            # model computes in bf16 anyway and HBM is the scarce resource
            dt = ml_dtypes.bfloat16 if np.prod(leaf.shape) > 1e6 else np.float32
            return np.full(leaf.shape, 0.01, dt)
        return np.zeros(leaf.shape, jax.dtypes.canonicalize_dtype(leaf.dtype))

    host_vars = jax.tree.map(fill, struct)
    gb = param_bytes(host_vars["params"]) / 2**30
    print(f"built synthetic 11B int8 tree: {gb:.2f} GiB "
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
    print(json.dumps({
        "metric": f"mme5-11B int8 single-chip forward (batch {b}, 1601 "
        "vision tokens/crop + 40-layer text)",
        "params_gib": round(gb, 2),
        "hbm_in_use_gib": round(mem.get("bytes_in_use", 0) / 2**30, 2),
        "compile_plus_first_run_s": round(compile_s, 1),
        "ms_per_crop": round(per_crop_ms, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
