"""Steady-state cost of the bit-faithful exact stage chain (r4 verdict #7).

SERVE_PARITY.json's ``exact_chain_seconds: 120`` conflates compile with
compute, so the exact-vs-serve cost frontier ("what does bit-compatibility
cost?") has no honest number. This runs the exact stage-1..3 chain
(per-view letterboxed detect → edge filter → f64 combine NMS — the
reference CLI semantics) TWICE in one process: the first pass pays the
jit compiles, the second is steady state. Reports both, plus the serve
fused-program rate from BENCH_LAST_GOOD.json for the frontier line.
Writes the ``exact_steady`` section into SERVE_PARITY.json.

Run (production config, TPU):  python scripts/exact_chain_bench.py --full
Reduced CPU config:            python scripts/exact_chain_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--full", action="store_true")
    parser.add_argument("--pages", type=int, default=3)
    args = parser.parse_args()

    import jax

    if not args.full:
        jax.config.update("jax_platforms", "cpu")
    else:
        platforms = os.environ.get("JAX_PLATFORMS", "")
        if platforms and "cpu" not in platforms:
            jax.config.update("jax_platforms", platforms + ",cpu")
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_comp_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from PIL import Image

    from bench import make_page
    from multimodal_embeddings_tpu.config import DetectorConfig
    from multimodal_embeddings_tpu.models.detector import LayoutDetector
    from multimodal_embeddings_tpu.pipeline.detect import run_detect_stage
    from multimodal_embeddings_tpu.pipeline.stages import (
        run_combine_stage,
        run_edge_filter_stage,
    )

    if args.full:
        cfg = DetectorConfig(image_size=1024, variant="m")
        page_hw = (2200, 1700)
    else:
        cfg = DetectorConfig(
            image_size=256, variant="n", grid_configs=((2, 2), (3, 3)),
            max_detections=64,
        )
        page_hw = (800, 600)

    detector = LayoutDetector(
        cfg, dtype=jnp.bfloat16 if args.full else jnp.float32
    )
    pages = [make_page(*page_hw, seed=s) for s in range(args.pages)]

    def run_chain(src, outroot):
        s1 = os.path.join(outroot, "s1")
        s2 = os.path.join(outroot, "s2")
        s3 = os.path.join(outroot, "s3")
        t0 = time.time()
        run_detect_stage(
            src, s1, cfg, detector=detector,
            save_cell_images=False, save_visualizations=False,
        )
        t_detect = time.time() - t0
        t0 = time.time()
        run_edge_filter_stage(s1, s2)
        run_combine_stage(s2, s3)
        t_host = time.time() - t0
        return t_detect, t_host

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        os.makedirs(src)
        for i, page in enumerate(pages):
            Image.fromarray(page).save(os.path.join(src, f"page{i:02d}.png"))
        d1, h1 = run_chain(src, os.path.join(td, "pass1"))
        d2, h2 = run_chain(src, os.path.join(td, "pass2"))

    steady_total = d2 + h2
    out = {
        "config": {
            "full": args.full, "image_size": cfg.image_size,
            "variant": cfg.variant, "pages": args.pages,
            "page_hw": list(page_hw),
        },
        "first_pass_s": round(d1 + h1, 1),
        "first_pass_detect_s": round(d1, 1),
        "steady_detect_s": round(d2, 2),
        "steady_host_filter_combine_s": round(h2, 2),
        "steady_pages_per_sec": round(args.pages / steady_total, 4),
        "compile_s_estimate": round((d1 + h1) - steady_total, 1),
        "measured": time.strftime("%Y-%m-%d"),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "SERVE_PARITY.json")
    rec = json.load(open(path)) if os.path.exists(path) else {}
    serve = None
    lg = os.path.join(here, "BENCH_LAST_GOOD.json")
    if os.path.exists(lg):
        serve = json.load(open(lg)).get("value")
    if serve:
        out["serve_pages_per_sec_detect_plus_embed"] = serve
        out["exactness_cost_note"] = (
            "steady exact chain (detect only, no embed) vs the serve "
            "fused detect+embed program — the bit-compatibility frontier"
        )
    rec["exact_steady"] = out
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
