"""Document-parsing CLI: page image → "QwenVL HTML" with data-bbox
attributes, plus the notebook's two post-processing artifacts.

The user surface of the reference's Qwen2.5-VL notebook
(``/root/reference/QWEN2_5_document_parsing.ipynb``): ``inference()``
(cell d43bacc8) builds a chat-template prompt and generates HTML whose
elements carry ``data-bbox``; ``draw_bbox`` (cell 9596c50d) rescales the
boxes back onto the original page; ``clean_and_format_html`` strips the
bbox/color attributes into ordinary HTML. Per page this CLI writes
``<stem>.qwen.html`` (raw), ``<stem>.clean.html``, and (with
``--draw-bbox``) ``<stem>_bbox.jpg``.

Without ``--weights`` the model runs deterministic random weights (repo
convention) — the plumbing (prompt splice, grid recovery, decode loop,
bbox parsing) is exercised end-to-end while real output quality is gated
on a checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os

from multimodal_embeddings_tpu.io.images import get_image_paths
from multimodal_embeddings_tpu.io.logging_setup import get_logger

logger = get_logger("cli.parse")

SIZES = (
    "tiny", "tiny-int8", "3b", "3b-int8", "3b-int4", "7b", "7b-int8",
    "32b", "32b-int8", "32b-int4",
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Parse pages into QwenVL HTML with data-bbox attributes"
    )
    parser.add_argument("--input_folder", default="newspaper_images")
    parser.add_argument("--output_folder", default="6_parsed_html")
    parser.add_argument("--size", choices=SIZES, default="3b")
    parser.add_argument("--weights", default=None, help="checkpoint path (npz/safetensors/orbax)")
    parser.add_argument("--image_size", type=int, default=448)
    parser.add_argument("--max_new_tokens", type=int, default=1024)
    parser.add_argument(
        "--dynamic_resolution",
        action="store_true",
        help="Qwen2.5-VL native-aspect smart_resize grids (one compile per "
        "distinct grid shape)",
    )
    parser.add_argument("--max_pixels", type=int, default=None)
    parser.add_argument(
        "--pipeline_parallel",
        type=int,
        default=1,
        help="pipeline the decoder stack over this many chips (GPipe ring, "
        "models/qwen_pp.py) — the 32B notebook flagship serves at int8 + 4 "
        "stages ~ 10GB/chip, or int4 (the notebook's literal 4-bit storage "
        "class) + 2 stages ~ 11GB/chip; layer count must divide evenly",
    )
    parser.add_argument(
        "--data_parallel",
        type=int,
        default=1,
        help="shard batched parsing over this many chips (mesh data axis: "
        "pages shard on the batch dim, weights replicate, one SPMD "
        "generate program) — compose with --batch_size >= N for per-chip "
        "batching; mutually exclusive with --pipeline_parallel",
    )
    parser.add_argument(
        "--batch_size",
        type=int,
        default=1,
        help="pages per generate program (DocumentParser.parse_batch): "
        "greedy decode is weight-streaming bound at batch 1 (9.0 ms/token "
        "= the 3B tree's HBM read, BENCH_PARSE.json), so B pages in one "
        "scan amortize the weight stream ~B×; artifacts are identical to "
        "batch 1 (row-independent generate, test-locked)",
    )
    parser.add_argument(
        "--continuous",
        action="store_true",
        help="continuous batching (models/qwen_serve.py): keep "
        "--batch_size decoder rows busy with per-row EOS exit + page "
        "refill at --chunk-step boundaries — wall tracks the MEAN page "
        "length instead of each wave's max (parse_batch); tokens "
        "identical to per-page parse",
    )
    parser.add_argument(
        "--chunk",
        type=int,
        default=64,
        help="decode steps per refill boundary in --continuous mode",
    )
    parser.add_argument("--draw_bbox", action="store_true")
    parser.add_argument(
        "--skip_errors",
        action="store_true",
        help="log-and-continue on per-page failures (opt-in, matching the "
        "reference stage CLIs); without it the first failure propagates",
    )
    return parser


def make_document_parser(
    size: str,
    weights: str | None,
    image_size: int,
    dynamic_resolution: bool,
    max_pixels: int | None,
    pipeline_parallel: int = 1,
    data_parallel: int = 1,
):
    import jax

    from multimodal_embeddings_tpu.analysis.doc_parser import DocumentParser
    from multimodal_embeddings_tpu.models.qwen_vl import QwenVLConfig, QwenVLModel
    from multimodal_embeddings_tpu.models.tokenizer import ByteTokenizer

    import dataclasses as _dc

    config = {
        "tiny": QwenVLConfig.tiny,
        "tiny-int8": lambda: _dc.replace(QwenVLConfig.tiny(), quantize=True),
        "3b": QwenVLConfig.qwen25_vl_3b,
        "3b-int8": QwenVLConfig.qwen25_vl_3b_int8,
        "3b-int4": QwenVLConfig.qwen25_vl_3b_int4,
        "7b": QwenVLConfig.qwen25_vl_7b,
        "7b-int8": QwenVLConfig.qwen25_vl_7b_int8,
        "32b": QwenVLConfig.qwen25_vl_32b,
        "32b-int8": QwenVLConfig.qwen25_vl_32b_int8,
        "32b-int4": QwenVLConfig.qwen25_vl_32b_int4,
    }[size]()
    model = QwenVLModel(config)

    import flax.linen as fnn
    import jax.numpy as jnp

    if size.startswith("tiny"):
        image_size = min(image_size, 56)
    unit = config.vision.patch_size * config.vision.merge_size
    image_size = max(unit, (image_size // unit) * unit)

    ids = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    if weights:
        from multimodal_embeddings_tpu.models.weights import load_checkpoint

        target = fnn.unbox(
            jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ids, imgs))
        )
        variables = load_checkpoint(weights, target)
    elif config.quantize:
        # build the quantized tree directly from eval_shape — the f32
        # twin of a 7B/32B decoder is a multi-tens-of-GB host tree (the
        # documented remote-compiler/hostRAM killer, models/embedder.py)
        from multimodal_embeddings_tpu.models.quantized import (
            synthetic_int8_init,
        )

        logger.warning(
            "document parser (%s) running with synthetic quantized weights "
            "(no checkpoint configured)",
            size,
        )
        variables = fnn.unbox(synthetic_int8_init(model, (ids, imgs)))
    else:
        logger.warning(
            "document parser (%s) running with deterministic random weights "
            "(no checkpoint configured)",
            size,
        )
        variables = fnn.unbox(model.init(jax.random.PRNGKey(0), ids, imgs))

    dp_mesh = None
    if data_parallel > 1:
        from multimodal_embeddings_tpu.config import MeshConfig
        from multimodal_embeddings_tpu.core.mesh import make_mesh

        if pipeline_parallel > 1:
            raise SystemExit(
                "--data_parallel and --pipeline_parallel are mutually "
                "exclusive (dp replicates the weight tree; pp exists "
                "because it does not fit)"
            )
        if len(jax.devices()) < data_parallel:
            raise SystemExit(
                f"--data_parallel {data_parallel}: only "
                f"{len(jax.devices())} devices visible"
            )
        dp_mesh = make_mesh(
            MeshConfig(shape=(data_parallel, 1)),
            devices=jax.devices()[:data_parallel],
        )

    pp_mesh = None
    if pipeline_parallel > 1:
        from multimodal_embeddings_tpu.parallel.pipeline import make_pp_mesh

        if config.text.layers % pipeline_parallel:
            raise SystemExit(
                f"--pipeline_parallel {pipeline_parallel} must divide the "
                f"{config.text.layers}-layer decoder evenly"
            )
        if len(jax.devices()) < pipeline_parallel:
            raise SystemExit(
                f"--pipeline_parallel {pipeline_parallel}: only "
                f"{len(jax.devices())} devices visible"
            )
        pp_mesh = make_pp_mesh(pipeline_parallel)

    return DocumentParser(
        model,
        variables,
        ByteTokenizer(),
        image_size=image_size,
        dynamic_resolution=dynamic_resolution,
        max_pixels=max_pixels,
        pp_mesh=pp_mesh,
        pp_stages=pipeline_parallel if pipeline_parallel > 1 else None,
        dp_mesh=dp_mesh,
    )


def main(argv=None) -> int:
    from multimodal_embeddings_tpu.cli import apply_env_platform

    apply_env_platform()
    args = build_parser().parse_args(argv)
    from multimodal_embeddings_tpu.analysis.doc_parser import (
        clean_and_format_html,
        draw_bbox,
        extract_bbox_elements,
    )

    paths = get_image_paths(args.input_folder)
    if not paths:
        logger.error("no images in %s", args.input_folder)
        return 1
    os.makedirs(args.output_folder, exist_ok=True)
    parser_obj = make_document_parser(
        args.size, args.weights, args.image_size,
        args.dynamic_resolution, args.max_pixels,
        pipeline_parallel=args.pipeline_parallel,
        data_parallel=args.data_parallel,
    )
    if args.data_parallel > 1 and args.batch_size < args.data_parallel:
        args.batch_size = args.data_parallel  # one page per chip minimum

    if args.continuous and (
        args.pipeline_parallel > 1 or args.data_parallel > 1
    ):
        raise SystemExit(
            "--continuous schedules one device's rows; compose scale-out "
            "by sharding the page list across chips instead"
        )
    n_done = 0
    index = []
    # continuous mode schedules the WHOLE queue in one call — refill
    # happens across what would otherwise be wave boundaries
    batch = len(paths) if args.continuous else max(1, args.batch_size)
    for start in range(0, len(paths), batch):
        chunk = paths[start : start + batch]
        try:
            if args.continuous:
                parsed = parser_obj.parse_continuous(
                    chunk,
                    max_new_tokens=args.max_new_tokens,
                    batch=max(1, args.batch_size),
                    chunk=args.chunk,
                )
            elif batch > 1:
                parsed = parser_obj.parse_batch(
                    chunk, max_new_tokens=args.max_new_tokens
                )
            else:
                parsed = [
                    parser_obj.parse(chunk[0], max_new_tokens=args.max_new_tokens)
                ]
        except Exception as exc:  # noqa: BLE001 — batch-level fallback
            if batch > 1 and args.skip_errors:
                # one bad page (decode error, truncated file) fails the
                # whole stacked program — retry its pages individually so
                # the per-page skip contract still holds
                logger.error(
                    "batch parse failed (%s); retrying pages individually",
                    exc,
                )
                parsed = []
                for path in chunk:
                    try:
                        parsed.append(
                            parser_obj.parse(
                                path, max_new_tokens=args.max_new_tokens
                            )
                        )
                    except Exception as page_exc:  # noqa: BLE001
                        logger.error("parse failed on %s: %s", path, page_exc)
                        parsed.append(None)
            elif args.skip_errors:
                logger.error("parse failed on %s: %s", chunk[0], exc)
                parsed = [None]
            else:
                raise
        for path, result in zip(chunk, parsed):
            stem = os.path.splitext(os.path.basename(path))[0]
            if result is None:
                continue
            html, in_h, in_w = result
            raw_path = os.path.join(args.output_folder, f"{stem}.qwen.html")
            with open(raw_path, "w") as f:
                f.write(html)
            with open(
                os.path.join(args.output_folder, f"{stem}.clean.html"), "w"
            ) as f:
                f.write(clean_and_format_html(html))
            n_boxes = len(extract_bbox_elements(html))
            if args.draw_bbox:
                draw_bbox(
                    path, in_w, in_h, html,
                    os.path.join(args.output_folder, f"{stem}_bbox.jpg"),
                )
            index.append(
                {
                    "image_path": path,
                    "input_width": in_w,
                    "input_height": in_h,
                    "n_bbox_elements": n_boxes,
                    "html": os.path.basename(raw_path),
                }
            )
            n_done += 1
            logger.info("parsed %s: %d bbox elements", stem, n_boxes)
    with open(os.path.join(args.output_folder, "parse_index.json"), "w") as f:
        json.dump(index, f, indent=2)
    logger.info("parsed %d/%d pages", n_done, len(paths))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
