"""Falsify-or-confirm the knife-edge NMS recall diagnosis (VERDICT r4 #4).

The serve-vs-exact detection parity record (SERVE_PARITY.json, production
config) shows recall_topk 0.944: ~5.6% of the exact chain's top-K boxes
have no serve match. Round 4 ATTRIBUTED this to cross-view duplicates at
the combine-NMS IoU-0.5 knife edge (unmatched boxes clustering at IoU
0.39-0.498 against their serve counterparts) — but never tested it. If the
diagnosis is wrong, a real coordinate bug hides under it
(``/root/reference/3_combine_grids.py:80-138`` is the combine contract).

Three experiments, same deterministic weights and pages as serve_parity:

  1. **ε-perturbation** — run the serve path with combine IoU 0.48 / 0.50 /
     0.52. If the unmatched population tracks ε (recall moves, the flip
     set is the knife population), selection sensitivity is confirmed.
  2. **host f64 re-merge** — tap the serve path's pre-combine candidate set
     (``build_fused_detect_fn(return_candidates=True)``) and re-merge it
     with the reference-exact host f64 greedy NMS (``ops/nms.py``). If
     recall recovers toward 1.0, the residual gap is NMS selection
     semantics on near-threshold pairs, not box coordinates. If it stays
     low, the serve candidates themselves are off → coordinate bug.
  3. **unmatched-IoU histogram** — for every unmatched exact top-K box at
     the baseline, its best same-class IoU against the serve set. The
     diagnosis predicts clustering just under the 0.5 match floor.

Results are merged into SERVE_PARITY.json under ``"knife_edge"`` (the
production sections are left untouched).

Run (reduced CPU config):  python scripts/knife_edge_probe.py
Production config on TPU:  python scripts/knife_edge_probe.py --full
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

from serve_parity import iou_matrix, match_sets  # noqa: E402


def unmatched_best_ious(serve, exact, iou_floor=0.5):
    """Best same-class IoU to ANY serve box, for each exact top-K box that
    the greedy matcher left unmatched."""
    import numpy as np

    sboxes, sscores, sclasses = serve
    eboxes, escores, eclasses = exact
    if len(sboxes) == 0 or len(eboxes) == 0:
        return []
    k = len(sboxes)
    top = np.argsort(-escores, kind="stable")[:k]
    ious = iou_matrix(
        np.asarray(sboxes, np.float64), np.asarray(eboxes, np.float64)
    )
    same = np.asarray(sclasses)[:, None] == np.asarray(eclasses)[None, :]
    cand = np.where(same, ious, 0.0)
    # replicate the greedy matching to find the unmatched top-K set
    order = np.argsort(-np.asarray(sscores), kind="stable")
    taken = np.zeros(len(eboxes), bool)
    matched = set()
    for i in order:
        row = np.where(taken, 0.0, cand[i])
        j = int(np.argmax(row))
        if row[j] >= iou_floor:
            taken[j] = True
            matched.add(j)
    return [
        round(float(cand[:, j].max()), 4) for j in top if j not in matched
    ]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--full", action="store_true")
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
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_comp_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from bench import make_page
    from multimodal_embeddings_tpu.config import DetectorConfig
    from multimodal_embeddings_tpu.models.detector import LayoutDetector
    from multimodal_embeddings_tpu.ops.nms import greedy_nms_host
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

    detector = LayoutDetector(
        cfg, dtype=jnp.bfloat16 if args.full else jnp.float32
    )
    pages = [make_page(*page_hw, seed=s) for s in range(args.pages)]

    # exact stage-1..3 chain (identical to serve_parity.py)
    exact_sets = {}
    with tempfile.TemporaryDirectory() as td:
        src, s1 = os.path.join(td, "src"), os.path.join(td, "s1")
        s2, s3 = os.path.join(td, "s2"), os.path.join(td, "s3")
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

    def eval_serve(serve_by_page):
        rows = []
        for stem, serve in serve_by_page.items():
            p, r, miou, k, etk = match_sets(
                serve, exact_sets[stem], iou_floor=args.iou_floor
            )
            rows.append(
                {"page": stem, "precision": round(p, 4),
                 "recall_topk": round(r, 4),
                 "mean_matched_iou": round(miou, 4)}
            )
        agg = lambda key: round(  # noqa: E731
            float(np.mean([r[key] for r in rows])), 4
        )
        return {
            "pages": rows,
            "precision": agg("precision"),
            "recall_topk": agg("recall_topk"),
            "mean_matched_iou": agg("mean_matched_iou"),
        }

    results = {}

    # --- experiment 1: combine-IoU ε sweep -------------------------------
    kept_sets = {}
    for eps_name, ciou in (("iou_048", 0.48), ("iou_050", 0.50),
                           ("iou_052", 0.52)):
        fn = build_fused_detect_fn(
            detector, page_hw, num_regions=num_regions, emb_size=64,
            letterbox=True, edge_filter=True, candidate_cap=4,
            combine_iou=ciou,
        )
        serve_by_page = {}
        for i, page in enumerate(pages):
            boxes, scores, classes, valid, _ = fn(jnp.asarray(page))
            v = np.asarray(valid)
            serve_by_page[f"page{i:02d}"] = (
                np.asarray(boxes, np.float64)[v],
                np.asarray(scores, np.float64)[v],
                np.asarray(classes)[v],
            )
        results[eps_name] = eval_serve(serve_by_page)
        kept_sets[eps_name] = {
            stem: {tuple(np.round(b, 2)) for b in s[0]}
            for stem, s in serve_by_page.items()
        }
        if eps_name == "iou_050":
            hist = []
            for stem, serve in serve_by_page.items():
                hist.extend(
                    unmatched_best_ious(
                        serve, exact_sets[stem], iou_floor=args.iou_floor
                    )
                )
            results["unmatched_best_iou_at_050"] = sorted(hist)

    # keep-set flip counts between ε variants: the knife population size
    flips = {}
    for a, b in (("iou_048", "iou_050"), ("iou_050", "iou_052")):
        n = sum(
            len(kept_sets[a][s] ^ kept_sets[b][s]) for s in kept_sets[a]
        )
        flips[f"{a}_vs_{b}_boxes_flipped"] = n
    results["eps_flips"] = flips

    # --- experiment 2: host f64 re-merge of the serve candidates ---------
    cand_fn = build_fused_detect_fn(
        detector, page_hw, num_regions=num_regions, emb_size=64,
        letterbox=True, edge_filter=True, candidate_cap=4,
        return_candidates=True,
    )
    serve_by_page = {}
    uncut_recalls = []
    for i, page in enumerate(pages):
        cb, cs, cc = cand_fn(jnp.asarray(page))
        cb = np.asarray(cb, np.float64)
        cs = np.asarray(cs, np.float64)
        cc = np.asarray(cc)
        live = cs > 0
        cb, cs, cc = cb[live], cs[live], cc[live]
        keep = greedy_nms_host(cb, cs, cc, iou_threshold=0.5)
        serve_by_page[f"page{i:02d}"] = (
            cb[keep[:num_regions]],
            cs[keep[:num_regions]],
            cc[keep[:num_regions]],
        )
        # UNCUT: exact top-K vs every host-kept candidate — separates
        # "lost at the top-K score boundary" from "not detected / box off"
        eb, es, ec = exact_sets[f"page{i:02d}"]
        top = np.argsort(-es, kind="stable")[:num_regions]
        ious = iou_matrix(cb[keep], eb[top])
        same = cc[keep][:, None] == ec[top][None, :]
        hit = ((np.where(same, ious, 0.0)) >= args.iou_floor).any(axis=0)
        uncut_recalls.append(float(hit.mean()))
    results["host_remerge"] = eval_serve(serve_by_page)
    results["host_remerge"]["uncut_candidate_recall_topk"] = round(
        float(np.mean(uncut_recalls)), 4
    )

    # --- verdict ----------------------------------------------------------
    base = results["iou_050"]["recall_topk"]
    remerge = results["host_remerge"]["recall_topk"]
    moved = (
        abs(results["iou_048"]["recall_topk"] - base)
        + abs(results["iou_052"]["recall_topk"] - base)
    )
    results["interpretation"] = {
        "recall_gap_at_050": round(1.0 - base, 4),
        "recall_gap_after_host_f64_remerge": round(1.0 - remerge, 4),
        "recall_moved_by_eps": round(moved, 4),
        "diagnosis_confirmed": bool(
            remerge >= base and (moved > 0.0 or remerge > base)
        ),
    }

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "SERVE_PARITY.json")
    record = json.load(open(path)) if os.path.exists(path) else {}
    record["knife_edge"] = {
        "config": {
            "full": args.full,
            "image_size": cfg.image_size,
            "variant": cfg.variant,
            "pages": args.pages,
            "candidate_cap": 4,
        },
        **results,
        "measured": time.strftime("%Y-%m-%d"),
    }
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps({"knife_edge": results["interpretation"],
                      "eps_flips": flips,
                      "recalls": {k: results[k]["recall_topk"]
                                  for k in ("iou_048", "iou_050", "iou_052",
                                            "host_remerge")}}))


if __name__ == "__main__":
    main()
