"""End-to-end 32B-int4 page-parse latency via 2-stage emulation (r4 #8).

The reference notebook's flagship config is Qwen2.5-VL-32B at 4-bit
(cell ``39512aca``); on this 16GB chip the packed-int4 decoder needs two
PP stages (``QwenVLConfig.qwen25_vl_32b_int4`` publishes the fit math),
and round 4's only evidence was a stage-0-sized single forward
(``int4_32b_smoke.py``). This measures a REAL full-page latency bound by
running both stages SEQUENTIALLY on the one chip:

  stage tree = vision (bf16) + 32 of 64 decoder layers (packed int4) +
  both vocab tables — strictly a superset of either real stage's
  parameters, so each measured stage cost is conservative;

  run stage "0": prefill + the whole 1024-token greedy decode as ONE
  ``lax.scan`` (token feedback is stage-local — with synthetic weights
  decode cost is token-independent, the same capacity/latency
  methodology as every parse number here);

  drop the tree, upload a fresh one, run stage "1" the same way.

Page latency bound = Σ per-stage (prefill + decode): the ring-free
SERIAL upper bound — a real 2-chip PP deployment overlaps stages across
pages (GPipe) and ships only a (B, 1, hidden) activation per token over
ICI (~10KB, microseconds), so its per-page latency sits at/below this
number and its throughput at ~2× (both stages busy). Merged into
BENCH_PARSE.json as ``32b-int4_pp2_emulated``.

Run: ``python scripts/int4_32b_stage_emulate.py`` (TPU; 2×~8GB uploads).
"""

from __future__ import annotations

import dataclasses
import gc
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
    parser.add_argument("--max_new_tokens", type=int, default=1024)
    parser.add_argument("--record", action="store_true")
    args = parser.parse_args()

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms:
        jax.config.update("jax_platforms", platforms + ",cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_comp_cache"),
    )
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
        build_generate_fns,
    )

    full = QwenVLConfig.qwen25_vl_32b_int4()
    unit = full.vision.patch_size * full.vision.merge_size
    size = max(unit, (args.image_size // unit) * unit)
    n_img = (size // unit) ** 2
    prompt_len = n_img + 295  # image tokens + the QwenVL-HTML chat prompt
    cfg = dataclasses.replace(
        full,
        text=dataclasses.replace(
            full.text,
            layers=full.text.layers // 2,
            max_len=-(-(prompt_len + args.max_new_tokens) // 128) * 128,
        ),
    )
    model = QwenVLModel(cfg)

    ids = np.full((1, prompt_len), cfg.image_pad_id, np.int32)
    ids[0, n_img:] = 7
    imgs = np.zeros((1, size, size, 3), np.float32)

    t0 = time.time()
    host_vars = fnn.unbox(synthetic_int8_init(model, (ids[:, :8], imgs)))
    gb = param_bytes(host_vars["params"]) / 2**30
    build_s = time.time() - t0
    print(f"stage tree: {gb:.2f} GiB ({build_s:.0f}s build)", file=sys.stderr)

    prefill, decode = build_generate_fns(
        model, prompt_len, args.max_new_tokens, early_stop=False
    )

    stages = []
    variables = None
    for stage in range(2):
        # fresh upload per stage — the two-uploads-sequential emulation
        # (a real deployment holds each stage resident on its own chip)
        variables = None
        gc.collect()
        t0 = time.time()
        variables = jax.tree.map(jnp.asarray, host_vars)
        jax.block_until_ready(variables)
        upload_s = time.time() - t0

        tokens_d = jnp.asarray(ids)
        imgs_d = jnp.asarray(imgs)
        t0 = time.time()
        last, caches, delta = prefill(variables, tokens_d, imgs_d)
        _ = np.asarray(last[0, :2])
        prefill_first_s = time.time() - t0
        t0 = time.time()
        out = decode(variables, last, caches, delta)
        _ = np.asarray(out[0, :2])
        decode_first_s = time.time() - t0

        # steady-state: one more timed prefill+decode (compile cached)
        t0 = time.time()
        last, caches, delta = prefill(variables, tokens_d, imgs_d)
        _ = np.asarray(last[0, :2])
        prefill_s = time.time() - t0
        t0 = time.time()
        out = decode(variables, last, caches, delta)
        _ = np.asarray(out[0, :2])
        decode_s = time.time() - t0

        mem = jax.devices()[0].memory_stats() or {}
        stages.append({
            "upload_s": round(upload_s, 1),
            "first_run_s": round(prefill_first_s + decode_first_s, 1),
            "prefill_ms": round(prefill_s * 1e3, 1),
            "decode_s": round(decode_s, 3),
            "ms_per_token": round(decode_s / args.max_new_tokens * 1e3, 3),
            "hbm_in_use_gib": round(mem.get("bytes_in_use", 0) / 2**30, 2),
        })
        print(f"stage {stage}: {stages[-1]}", file=sys.stderr)

    page_s = sum(s["prefill_ms"] / 1e3 + s["decode_s"] for s in stages)
    out_rec = {
        "metric": "Qwen2.5-VL-32B packed-int4 page parse, 2-stage PP "
        f"EMULATED serially on ONE chip (per-stage tree: vision bf16 + 32 "
        f"of 64 int4 layers + both vocab tables = {gb:.2f} GiB; prompt "
        f"{prompt_len} tokens incl. {n_img} image @{size}px, "
        f"{args.max_new_tokens} new tokens, one lax.scan per stage)",
        "size": "32b-int4",
        "stages": stages,
        "page_seconds_serial_bound": round(page_s, 2),
        "pages_per_hour_serial_bound": round(3600 / page_s, 1),
        "ms_per_token_serial_bound": round(
            sum(s["ms_per_token"] for s in stages), 3
        ),
        "note": "serial upper bound: a 2-chip GPipe deployment overlaps "
        "stages across pages (~2x throughput) and ships one (B,1,hidden) "
        "activation per token over ICI",
        "measured": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(out_rec))
    if args.record:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(here, "BENCH_PARSE.json")
        rec = json.load(open(path)) if os.path.exists(path) else {}
        rec["32b-int4_pp2_emulated"] = out_rec
        with open(path, "w") as f:
            json.dump(rec, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
