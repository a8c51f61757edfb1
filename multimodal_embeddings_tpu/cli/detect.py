"""Stage-1 CLI: DocLayout-YOLO detection with multi-grid tiling.

Mirrors ``python 1_doclayout_bboxes.py --input_folder ... --output_folder ...
--grid_configs 2x2,3x3,4x4`` (``1_doclayout_bboxes.py:682-707``).
"""

from __future__ import annotations

import argparse
from typing import Tuple

from multimodal_embeddings_tpu.config import DetectorConfig
from multimodal_embeddings_tpu.io.logging_setup import get_logger
from multimodal_embeddings_tpu.pipeline.detect import run_detect_stage

logger = get_logger("cli.detect")


def parse_grid_configs(grid_str: str) -> Tuple[Tuple[int, int], ...]:
    """'2x2,3x3' → ((2,2),(3,3)); invalid entries are skipped with a warning
    (reference behavior, ``1_doclayout_bboxes.py:656-680``)."""
    configs = []
    for part in grid_str.split(","):
        part = part.strip()
        if not part:
            continue
        try:
            rows, cols = part.split("x")
            configs.append((int(rows), int(cols)))
        except ValueError:
            logger.warning("invalid grid config %r skipped", part)
    return tuple(configs)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Document layout detection")
    parser.add_argument("--input_folder", required=True)
    parser.add_argument("--output_folder", required=True)
    parser.add_argument("--conf_threshold", type=float, default=0.1)
    parser.add_argument("--iou_threshold", type=float, default=0.45)
    parser.add_argument("--imgsz", type=int, default=1024)
    parser.add_argument("--grid_configs", default="2x2,3x3,4x4")
    parser.add_argument("--overlap", type=float, default=20.0)
    parser.add_argument("--weights", default=None, help="detector checkpoint path")
    parser.add_argument("--variant", default="m", choices=list("nsmblx"))
    parser.add_argument("--skip_errors", action="store_true")
    parser.add_argument("--no_cell_images", action="store_true")
    parser.add_argument("--no_viz", action="store_true")
    return parser


def main(argv=None) -> int:
    from multimodal_embeddings_tpu.cli import apply_env_platform

    apply_env_platform()
    args = build_parser().parse_args(argv)
    config = DetectorConfig(
        image_size=args.imgsz,
        conf_threshold=args.conf_threshold,
        iou_threshold=args.iou_threshold,
        grid_configs=parse_grid_configs(args.grid_configs),
        overlap_percentage=args.overlap,
        weights_path=args.weights,
        variant=args.variant,
    )
    stats = run_detect_stage(
        args.input_folder,
        args.output_folder,
        config=config,
        save_cell_images=not args.no_cell_images,
        save_visualizations=not args.no_viz,
        skip_errors=args.skip_errors,
    )
    logger.info(
        "stage 1 complete: %d pages, %d errors", stats.processed, stats.errors
    )
    return 0 if stats.errors == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
