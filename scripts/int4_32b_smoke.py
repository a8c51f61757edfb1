"""Single-chip capacity smoke for the 32B-int4 2-stage PP parse config.

The reference notebook's flagship is Qwen2.5-VL-32B at 4-bit
(``BitsAndBytesConfig(load_in_4bit=True)``, cell ``39512aca``).
``QwenVLConfig.qwen25_vl_32b_int4`` publishes the fit math: packed int4
decoder → 2 PP stages ≈ 8GB weights + vision + cache per chip. This
proves that math with a REAL single-chip forward of a stage-0-sized
slice: the vision tower (bf16) + HALF the 64-layer decoder (32 layers,
packed int4) + the embedding/lm_head tables — strictly MORE than stage 0
holds (stage 0 has no lm_head/final-norm), so fitting here is
conservative capacity evidence, the same methodology as
``scripts/int8_11b_smoke.py`` was for the 11B embedder.

Weights are synthetic (zero egress); numbers are capacity/latency
evidence, accuracy is gated on a checkpoint.

Run: ``python scripts/int4_32b_smoke.py`` (TPU; ~12GB upload).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--image_size", type=int, default=448)
    parser.add_argument(
        "--max_len", type=int, default=1536,
        help="KV-cache length for the smoke (the full parse config uses "
        "4096 split over 2 stages; here one chip holds half the decoder "
        "PLUS both vocab tables, so the cache budget shrinks to match)",
    )
    args = parser.parse_args()

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms:
        jax.config.update("jax_platforms", platforms + ",cpu")
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import flax.linen as fnn
    import jax.numpy as jnp
    import numpy as np

    from multimodal_embeddings_tpu.models.quantized import (
        param_bytes,
        synthetic_int8_init,
    )
    from multimodal_embeddings_tpu.models.qwen_vl import (
        QwenVLConfig,
        QwenVLModel,
    )

    full = QwenVLConfig.qwen25_vl_32b_int4()
    cfg = dataclasses.replace(
        full,
        text=dataclasses.replace(
            full.text, layers=full.text.layers // 2, max_len=args.max_len
        ),
    )
    model = QwenVLModel(cfg)

    unit = cfg.vision.patch_size * cfg.vision.merge_size
    size = max(unit, (args.image_size // unit) * unit)
    n_img = (size // unit) ** 2
    prompt_len = n_img + 24
    ids = np.full((1, prompt_len), cfg.image_pad_id, np.int32)
    ids[0, n_img:] = 7  # trailing text tokens after the image
    imgs = np.zeros((1, size, size, 3), np.float32)

    t0 = time.time()
    host_vars = fnn.unbox(synthetic_int8_init(model, (ids[:, :8], imgs)))
    gb = param_bytes(host_vars["params"]) / 2**30
    print(
        f"built synthetic 32B-int4 half-decoder tree: {gb:.2f} GiB "
        f"({time.time()-t0:.0f}s)",
        file=sys.stderr,
    )

    t0 = time.time()
    variables = jax.tree.map(jnp.asarray, host_vars)
    jax.block_until_ready(variables)
    print(f"uploaded to chip in {time.time()-t0:.0f}s", file=sys.stderr)

    @jax.jit
    def prefill(v, tokens, images):
        logits, caches, delta = model.apply(v, tokens, images)
        return logits[:, -1]

    t0 = time.time()
    out = prefill(variables, jnp.asarray(ids), jnp.asarray(imgs))
    _ = np.asarray(out[0, :2])  # value fetch = real barrier (CLAUDE.md)
    compile_s = time.time() - t0

    t0 = time.time()
    n = 3
    for _ in range(n):
        out = prefill(variables, jnp.asarray(ids), jnp.asarray(imgs))
    _ = np.asarray(out[0, :2])
    per_fwd_ms = (time.time() - t0) / n * 1e3

    mem = jax.devices()[0].memory_stats() or {}
    print(json.dumps({
        "metric": "Qwen2.5-VL-32B int4 STAGE-0-SIZED single-chip prefill "
        f"(vision bf16 + 32 of 64 decoder layers packed-int4 + both vocab "
        f"tables, {prompt_len}-token prompt incl. {n_img} image tokens "
        f"@{size}px, max_len {args.max_len})",
        "params_gib": round(gb, 2),
        "hbm_in_use_gib": round(mem.get("bytes_in_use", 0) / 2**30, 2),
        "compile_plus_first_run_s": round(compile_s, 1),
        "ms_per_forward": round(per_fwd_ms, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
