"""TPU A/B: pipelined vs sequential serve-CLI ingest on full-size pages.

Measures the real-deployment win of the 3-stage ingest pipeline
(`io/prefetch.py` + async dispatch in `cli/serve.py::run_once`): host
PNG decode of page N+1 overlaps the device program of page N. The
headline bench can't see this (it feeds synthetic in-memory pages); this
script writes realistic ~2200x1700 newspaper-scale PNGs and drives the
CLI server both ways against the same store schema.

Usage: python scripts/serve_pipeline_bench.py [--pages 8] [--mode both]
Writes serve_pipeline_results.json next to this script.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys_path_root = __file__.rsplit("/", 2)[0]
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)


def _setup_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_pages(folder: str, n: int, hw=(2200, 1700)) -> None:
    """Newspaper-scale pages with text-like row structure (non-trivial
    PNG entropy so decode cost is realistic)."""
    from PIL import Image

    os.makedirs(folder, exist_ok=True)
    h, w = hw
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = np.full((h, w, 3), 235, np.uint8)
        for y in range(60, h - 60, 34):
            arr[y : y + 16, 40 : w - 40] = rng.integers(
                0, 120, (16, w - 80, 3), dtype=np.uint8
            )
        Image.fromarray(arr).save(os.path.join(folder, f"bench_page_{i}.png"))


def run_mode(pages_dir: str, db_dir: str, no_prefetch: bool) -> dict:
    from multimodal_embeddings_tpu.cli.serve import FusedServer, build_parser

    if os.path.isdir(db_dir):
        shutil.rmtree(db_dir)
    argv = [
        "--input_folder", pages_dir,
        "--db_path", db_dir,
        "--num_regions", "48",
        "--embedder_family", "siglip",
        "--embedder_size", "base",
    ]
    if no_prefetch:
        argv.append("--no_prefetch")
    server = FusedServer(build_parser().parse_args(argv))
    # warm the (2400,1800) bucket compile outside the timed window
    first = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
    )[0]
    server.process_page(first)
    start = time.perf_counter()
    n = server.run_once()
    elapsed = time.perf_counter() - start
    return {
        "mode": "sequential" if no_prefetch else "pipelined",
        "pages": n,
        "elapsed_s": round(elapsed, 3),
        "pages_per_sec": round(n / elapsed, 4) if n else None,
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pages", type=int, default=8)
    parser.add_argument(
        "--mode", choices=("both", "pipelined", "sequential"), default="both"
    )
    parser.add_argument("--workdir", default="/tmp/serve_pipeline_bench")
    args = parser.parse_args()

    _setup_cache()
    pages_dir = os.path.join(args.workdir, "pages")
    # +1: the first page warms the compile outside the timed window
    make_pages(pages_dir, args.pages + 1)

    results = []
    if args.mode in ("sequential", "both"):
        results.append(
            run_mode(pages_dir, os.path.join(args.workdir, "db_seq"), True)
        )
    if args.mode in ("pipelined", "both"):
        results.append(
            run_mode(pages_dir, os.path.join(args.workdir, "db_pipe"), False)
        )
    out = {"results": results, "page_hw": [2200, 1700]}
    if len(results) == 2 and all(r["pages_per_sec"] for r in results):
        seq, pipe = results[0]["pages_per_sec"], results[1]["pages_per_sec"]
        out["pipeline_speedup"] = round(pipe / seq, 4)
    path = os.path.join(os.path.dirname(__file__), "serve_pipeline_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
