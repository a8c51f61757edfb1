"""Parity-measurement CLI: bbox IoU / embedding cosine vs a reference tree.

Implements the BASELINE.json acceptance measurement (bbox IoU ≥ 0.99,
embedding cosine ≥ 0.999): point it at a reference output directory (e.g.
the checked-in ``3_combined_bboxes/json``) and a candidate directory
produced by this framework.
"""

from __future__ import annotations

import argparse
import json

from multimodal_embeddings_tpu.analysis.parity import (
    compare_detection_dirs,
    compare_embedding_stores,
)
from multimodal_embeddings_tpu.io.logging_setup import get_logger

logger = get_logger("cli.parity")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Measure parity vs a reference")
    sub = parser.add_subparsers(dest="mode", required=True)

    boxes = sub.add_parser("boxes", help="bbox IoU parity between JSON dirs")
    boxes.add_argument("reference_dir")
    boxes.add_argument("candidate_dir")
    boxes.add_argument("--iou_floor", type=float, default=0.5)
    boxes.add_argument("--class_agnostic", action="store_true")
    boxes.add_argument("--out", default=None, help="write full JSON report here")

    emb = sub.add_parser("embeddings", help="cosine parity between stores")
    emb.add_argument("reference_db")
    emb.add_argument("candidate_db")
    emb.add_argument("--out", default=None)
    return parser


def main(argv=None) -> int:
    from multimodal_embeddings_tpu.cli import apply_env_platform

    apply_env_platform()
    args = build_parser().parse_args(argv)
    if args.mode == "boxes":
        summary = compare_detection_dirs(
            args.reference_dir,
            args.candidate_dir,
            iou_floor=args.iou_floor,
            class_aware=not args.class_agnostic,
        )
        headline = {
            "pages": summary["pages"],
            "mean_matched_iou": round(summary["mean_matched_iou"], 6),
            "recall": round(summary["recall"], 6),
            "precision": round(summary["precision"], 6),
        }
    else:
        from multimodal_embeddings_tpu.store.embedding_store import initialize_db

        _, ref = initialize_db(args.reference_db)
        _, cand = initialize_db(args.candidate_db)
        summary = compare_embedding_stores(ref, cand)
        headline = {
            "count": summary["count"],
            "mean_cosine": round(summary["mean_cosine"], 6),
            "min_cosine": round(summary["min_cosine"], 6),
        }
    print(json.dumps(headline))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
        logger.info("full report: %s", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
