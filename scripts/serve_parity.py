"""Serve-vs-exact detection parity (VERDICT r2 item 3).

The fused serving path (``pipeline/fused.py``) approximates the exact
numbered pipeline (stages 1-3, ``/root/reference/1_doclayout_bboxes.py`` +
``2_edge_box_filter.py`` + ``3_combine_grids.py:80-138`` semantics) three
ways: aspect-squeeze view resize instead of letterbox, one cross-view NMS
over the top 4K candidates instead of per-view NMS → edge filter → combine
NMS, and a static top-K selection. This script quantifies those
approximations with IDENTICAL deterministic weights:

  (a) exact:  run_detect_stage → run_edge_filter_stage → run_combine_stage
      on synthetic pages (the reference-faithful CLI chain);
  (b) serve:  build_fused_detect_fn on the same pages (squeeze AND
      letterbox variants);

then IoU-matches the box sets (greedy by serve score, class-aware) and
reports precision over serve boxes, recall of the exact set's top-K
strongest boxes, and mean matched IoU. Writes SERVE_PARITY.json.

Run (reduced CPU config, default):  python scripts/serve_parity.py
Full scale on TPU:                  python scripts/serve_parity.py --full
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iou_matrix(a, b):
    import numpy as np

    ax1, ay1, ax2, ay2 = [a[:, i, None] for i in range(4)]
    bx1, by1, bx2, by2 = [b[None, :, i] for i in range(4)]
    iw = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0, None)
    ih = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0, None)
    inter = iw * ih
    area_a = np.clip(ax2 - ax1, 0, None) * np.clip(ay2 - ay1, 0, None)
    area_b = np.clip(bx2 - bx1, 0, None) * np.clip(by2 - by1, 0, None)
    union = area_a + area_b - inter
    return np.where(union > 0, inter / union, 0.0)


def match_sets(serve, exact, iou_floor=0.5):
    """Greedy one-to-one matching by descending serve score; class-aware.

    Returns (precision, recall_topk, mean_iou, n_serve, n_exact_topk)."""
    import numpy as np

    sboxes, sscores, sclasses = serve
    eboxes, escores, eclasses = exact
    if len(sboxes) == 0 or len(eboxes) == 0:
        return 0.0, 0.0, 0.0, len(sboxes), 0
    k = len(sboxes)
    top = np.argsort(-escores, kind="stable")[:k]
    etop_set = set(top.tolist())
    order = np.argsort(-sscores, kind="stable")
    ious = iou_matrix(np.asarray(sboxes, np.float64), np.asarray(eboxes, np.float64))
    same = np.asarray(sclasses)[:, None] == np.asarray(eclasses)[None, :]
    cand = np.where(same, ious, 0.0)
    taken = np.zeros(len(eboxes), bool)
    matched_iou, matched_exact = [], []
    for i in order:
        row = np.where(taken, 0.0, cand[i])
        j = int(np.argmax(row))
        if row[j] >= iou_floor:
            taken[j] = True
            matched_iou.append(float(row[j]))
            matched_exact.append(j)
    precision = len(matched_iou) / max(1, k)
    recall_topk = len(etop_set & set(matched_exact)) / max(1, len(etop_set))
    mean_iou = float(np.mean(matched_iou)) if matched_iou else 0.0
    return precision, recall_topk, mean_iou, k, len(etop_set)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--full", action="store_true", help="full-scale config on TPU")
    parser.add_argument("--pages", type=int, default=3)
    parser.add_argument("--iou-floor", type=float, default=0.5)
    args = parser.parse_args()

    import jax

    if not args.full:
        jax.config.update("jax_platforms", "cpu")
    else:
        platforms = os.environ.get("JAX_PLATFORMS", "")
        if platforms and "cpu" not in platforms:
            jax.config.update("jax_platforms", platforms + ",cpu")
        cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from bench import make_page
    from multimodal_embeddings_tpu.config import DetectorConfig
    from multimodal_embeddings_tpu.models.detector import LayoutDetector
    from multimodal_embeddings_tpu.pipeline.detect import run_detect_stage
    from multimodal_embeddings_tpu.pipeline.fused import build_fused_detect_fn
    from multimodal_embeddings_tpu.pipeline.stages import (
        run_combine_stage,
        run_edge_filter_stage,
    )

    if args.full:
        cfg = DetectorConfig(image_size=1024, variant="m")
        page_hw = (2200, 1700)
        num_regions = 48
    else:
        cfg = DetectorConfig(
            image_size=256,
            variant="n",
            grid_configs=((2, 2), (3, 3)),
            max_detections=64,
        )
        page_hw = (800, 600)
        num_regions = 24

    detector = LayoutDetector(cfg, dtype=jnp.bfloat16 if args.full else jnp.float32)
    pages = [make_page(*page_hw, seed=s) for s in range(args.pages)]

    # --- (a) exact stage chain -------------------------------------------
    t0 = time.time()
    exact_sets = {}
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        s1 = os.path.join(td, "s1")
        s2 = os.path.join(td, "s2")
        s3 = os.path.join(td, "s3")
        os.makedirs(src)
        for i, page in enumerate(pages):
            Image.fromarray(page).save(os.path.join(src, f"page{i:02d}.png"))
        run_detect_stage(
            src, s1, cfg, detector=detector,
            save_cell_images=False, save_visualizations=False,
        )
        run_edge_filter_stage(s1, s2)
        run_combine_stage(s2, s3)
        for p in sorted(glob.glob(os.path.join(s3, "json", "*_combined.json"))):
            d = json.load(open(p))
            stem = os.path.basename(p).split("_combined")[0]
            exact_sets[stem] = (
                np.asarray(d["boxes"], np.float64).reshape(-1, 4),
                np.asarray(d["scores"], np.float64),
                np.asarray(d["classes"]),
            )
    exact_s = time.time() - t0

    # --- (b) serve path, both resize variants ----------------------------
    results = {}
    variants = [
        ("squeeze", False, True, 4),
        ("letterbox", True, True, 4),
        ("letterbox_noedge", True, False, 4),  # pre-r3 serving semantics
        # candidate-cap A/B (VERDICT r3 item 3): the 4*num_regions top-k
        # before the cross-view NMS is a serve-only approximation of the
        # exact chain's combine-over-ALL-boxes; widen it and measure
        ("letterbox_cap16", True, True, 16),
        ("letterbox_cap64", True, True, 64),
        # f32 view resize: isolates resize PRECISION from selection
        # semantics in the residual serve-vs-exact gap
        ("letterbox_f32resize", True, True, 4),
    ]
    for variant, letterbox, edge_filter, cap in variants:
        fn = build_fused_detect_fn(
            detector, page_hw, num_regions=num_regions, emb_size=64,
            letterbox=letterbox, edge_filter=edge_filter, candidate_cap=cap,
            resize_dtype=jnp.float32
            if variant == "letterbox_f32resize"
            else jnp.bfloat16,
        )
        rows = []
        t_variant = time.time()
        for i, page in enumerate(pages):
            boxes, scores, classes, valid, _ = fn(jnp.asarray(page))
            v = np.asarray(valid)
            serve = (
                np.asarray(boxes, np.float64)[v],
                np.asarray(scores, np.float64)[v],
                np.asarray(classes)[v],
            )
            stem = f"page{i:02d}"
            p, r, miou, k, etk = match_sets(
                serve, exact_sets[stem], iou_floor=args.iou_floor
            )
            rows.append({
                "page": stem, "precision": round(p, 4),
                "recall_topk": round(r, 4), "mean_matched_iou": round(miou, 4),
                "serve_boxes": k, "exact_topk": etk,
                "exact_total": int(len(exact_sets[stem][0])),
            })
        agg = lambda key: float(np.mean([r[key] for r in rows]))
        results[variant] = {
            "pages": rows,
            "precision": round(agg("precision"), 4),
            "recall_topk": round(agg("recall_topk"), 4),
            "mean_matched_iou": round(agg("mean_matched_iou"), 4),
            "seconds_incl_compile": round(time.time() - t_variant, 1),
        }

    out = {
        "metric": "serve-vs-exact detection parity (same deterministic "
        "weights; exact = stage1-3 chain, serve = fused detect program)",
        "config": {
            "full": args.full,
            "image_size": cfg.image_size,
            "variant": cfg.variant,
            "grids": list(map(list, cfg.grid_configs)),
            "page_hw": list(page_hw),
            "num_regions": num_regions,
            "iou_floor": args.iou_floor,
            "backend": jax.default_backend(),
        },
        "exact_chain_seconds": round(exact_s, 1),
        **results,
        "measured": time.strftime("%Y-%m-%d"),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "SERVE_PARITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in ("squeeze", "letterbox")}, indent=2))
    print("written:", path)


if __name__ == "__main__":
    main()
