"""Serving CLI: continuous page ingestion through the fused TPU pipeline.

Watches an input folder; every new page runs through the fused
detect→embed program (one XLA execution per page-shape bucket) and its
region embeddings + whole-page embedding are upserted into the store.
This is the deployment-shaped entry the reference lacks (its closest
analogue is re-running ``complete_workflow.py``).

Pages are bucketed by shape: the fused program is compiled once per
bucket (pages are padded up to the bucket resolution), so steady-state
ingestion is compile-free.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Tuple

import numpy as np

from multimodal_embeddings_tpu.config import (
    DetectorConfig,
    EmbedderConfig,
    ID_TO_NAMES,
)
from multimodal_embeddings_tpu.io.images import get_image_paths, load_image_rgb
from multimodal_embeddings_tpu.io.logging_setup import get_logger
from multimodal_embeddings_tpu.io.progress import ProgressTracker
from multimodal_embeddings_tpu.pipeline.regions import region_metadata

logger = get_logger("cli.serve")

# shape buckets: pages are padded (bottom/right) up to the enclosing bucket
DEFAULT_BUCKETS = ((1600, 1200), (2400, 1800), (3600, 2800), (8000, 8000))


def bucket_for(h: int, w: int, buckets) -> Tuple[int, int]:
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            return bh, bw
    return buckets[-1]


class FusedServer:
    def __init__(self, args):
        import jax.numpy as jnp

        from multimodal_embeddings_tpu.models.detector import LayoutDetector
        from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
        from multimodal_embeddings_tpu.models.vision_encoder import DualEncoderConfig
        from multimodal_embeddings_tpu.store.embedding_store import initialize_db

        self.args = args
        det_cfg = DetectorConfig(
            image_size=args.imgsz,
            variant=args.variant,
            weights_path=args.detector_weights,
            grid_configs=tuple(
                tuple(int(v) for v in g.split("x"))
                for g in args.grid_configs.split(",")
                if g
            ),
        )
        self.detector = LayoutDetector(det_cfg, dtype=jnp.bfloat16)
        if args.embedder_size == "tiny":
            # per-family tiny config (DualEncoderConfig.tiny() fed to the
            # mme5 family was a latent crash)
            if args.embedder_family == "mme5":
                from multimodal_embeddings_tpu.models.mme5 import MllamaConfig

                model_config = MllamaConfig.tiny()
            else:
                model_config = DualEncoderConfig.tiny()
        else:
            model_config = None
        self.mesh = None
        dp = getattr(args, "data_parallel", 1)
        mp = getattr(args, "model_parallel", 1)
        if dp > 1 or mp > 1:
            # multi-chip serving mesh. Data axis: page batch sharded one
            # page per dp group (the reference's round-robin-GPUs
            # analogue, embedder.py:190-224, as sharded XLA programs —
            # one fused program for siglip, the two-program split for
            # mme5). Model axis: the parity embedder's weights
            # tensor-sharded by the Megatron-style logical-axis rules
            # (parallel/sharding.py) — the serving shape for trees one
            # chip can't hold (bf16 11B ≈ 21GB vs 16GB/chip → tp=2).
            import jax

            from multimodal_embeddings_tpu.config import MeshConfig
            from multimodal_embeddings_tpu.core.mesh import make_mesh

            need = dp * mp
            if len(jax.devices()) < need:
                raise SystemExit(
                    f"--data_parallel {dp} x --model_parallel {mp} needs "
                    f"{need} devices; only {len(jax.devices())} visible"
                )
            if mp > 1 and args.embedder_family != "mme5":
                raise SystemExit(
                    "--model_parallel tensor-shards the parity (mme5) "
                    "embedder; the siglip tower fits one chip — scale it "
                    "with --data_parallel"
                )
            if mp > 1 and getattr(args, "quantize", False):
                raise SystemExit(
                    "--model_parallel serves the bf16 tree; the int8 path "
                    "is single-chip (drop --quantize, or use "
                    "--data_parallel alone)"
                )
            self.mesh = make_mesh(
                MeshConfig(shape=(dp, mp)), devices=jax.devices()[:need]
            )
        self.embedder = MultimodalEmbedder(
            EmbedderConfig(
                family=args.embedder_family,
                weights_path=args.embedder_weights,
                quantize=getattr(args, "quantize", False),
            ),
            model_config=model_config,
            # tensor parallelism shards the embedder tree at load; dp-only
            # meshes keep the single-device tree (the batch builders
            # replicate it once at build time)
            mesh=self.mesh if mp > 1 else None,
        )
        _, self.collection = initialize_db(args.db_path)
        from multimodal_embeddings_tpu.pipeline.regions import ImageProcessor

        self._image_processor = ImageProcessor(self.embedder, self.collection)
        self.progress = ProgressTracker(
            os.path.join(args.db_path, "serve_progress.json")
        )
        self._page_fns: Dict[Tuple[int, int], object] = {}
        self._batch_fns: Dict[Tuple[int, int], object] = {}

    def _embed_chunk(self) -> int:
        """mme5 split-path region-embed chunk: the int8 11B vision
        attention's transient bounds the chunk to 2; bf16 runs 8; tiny
        test configs take the whole batch. Single source for both the
        single-page and dp paths."""
        if self.args.embedder_size == "tiny":
            cap = self.args.num_regions
        elif self.embedder.model_config.quantize:
            cap = 2
        else:
            cap = 8
        return max(
            c for c in range(1, cap + 1) if self.args.num_regions % c == 0
        )

    def _fn_for_bucket(self, bucket: Tuple[int, int]):
        if bucket not in self._page_fns:
            from multimodal_embeddings_tpu.pipeline.fused import (
                build_fused_page_fn,
                build_split_page_fn,
            )

            logger.info("compiling fused program for bucket %s", bucket)
            if (
                self.embedder.config.family == "mme5"
                and self.args.embedder_size != "tiny"
            ):
                # full-size Mllama embedders must serve through the
                # two-program split — the combined program exceeds the
                # remote compiler (CLAUDE.md)
                self._page_fns[bucket] = build_split_page_fn(
                    self.detector,
                    self.embedder,
                    bucket,
                    num_regions=self.args.num_regions,
                    embed_chunk=self._embed_chunk(),
                    letterbox=not self.args.squeeze_views,
                )
            elif self.args.embedder_size != "tiny":
                # measured-best headline serving shape (bench.py A/B
                # 2026-08-17: split 5.596 vs detector-closure single
                # program 5.069 p/s): TWO programs with BOTH trees as
                # folded closure constants — each HLO body stays under
                # the remote compiler's request limit. Stored f32 params
                # cast to bf16 first: numerically identical (compute is
                # bf16; flax promote_dtype casts at use) and halves the
                # embed program's constant body.
                import jax
                import numpy as np

                import jax.numpy as jnp

                self.embedder.variables = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == np.float32
                    else x,
                    self.embedder.variables,
                )
                self._page_fns[bucket] = build_split_page_fn(
                    self.detector,
                    self.embedder,
                    bucket,
                    num_regions=self.args.num_regions,
                    embed_chunk=self.args.num_regions,
                    letterbox=not self.args.squeeze_views,
                    closure_weights=True,
                    embed_closure=True,
                )
            else:
                self._page_fns[bucket] = build_fused_page_fn(
                    self.detector,
                    self.embedder,
                    bucket,
                    num_regions=self.args.num_regions,
                    letterbox=not self.args.squeeze_views,
                    # measured +20% over args mode: detector tree as
                    # program constants (ROADMAP "args-mode regression")
                    closure_weights="detector",
                )
        return self._page_fns[bucket]

    def _prepare(self, path: str):
        """Host stage 1: decode + downscale + bucket + pad (thread-safe;
        runs ahead of device execution on the prefetch thread)."""
        image = load_image_rgb(path)
        h, w = image.shape[:2]
        # pages larger than the biggest bucket are downscaled to fit (the
        # embedder path's 8000px LANCZOS cap analogue); detections are
        # scaled back to original page coordinates in _finalize
        max_h, max_w = DEFAULT_BUCKETS[-1]
        scale = 1.0
        if h > max_h or w > max_w:
            scale = min(max_h / h, max_w / w)
            from PIL import Image

            resized = Image.fromarray(image).resize(
                (max(1, int(w * scale)), max(1, int(h * scale))), Image.LANCZOS
            )
            image = np.asarray(resized)
            h, w = image.shape[:2]
        bucket = bucket_for(h, w, DEFAULT_BUCKETS)
        padded = np.zeros((*bucket, 3), np.uint8)
        padded[:h, :w] = image
        return padded, bucket, scale, h, w

    def _submit(self, prepared):
        """Device stage: dispatch the fused program (async — returns
        device arrays before the program finishes)."""
        import jax.numpy as jnp

        padded, bucket, _, _, _ = prepared
        return self._fn_for_bucket(bucket)(jnp.asarray(padded))

    def _finalize(self, path: str, prepared, result) -> int:
        """Host stage 2: fetch results, map coordinates, upsert."""
        _, _, scale, h, w = prepared
        boxes = np.asarray(result.boxes, np.float64)
        scores = np.asarray(result.scores, np.float64)
        classes = np.asarray(result.classes)
        valid = np.asarray(result.valid)
        embeddings = np.asarray(result.embeddings, np.float64)

        stem = os.path.splitext(os.path.basename(path))[0]
        orig_w = int(round(w / scale))
        orig_h = int(round(h / scale))
        ids, embs, metas = [], [], []
        for i in range(len(boxes)):
            if not valid[i]:
                continue
            # clip padded-region artifacts, then map back to original coords
            box = np.clip(boxes[i], [0, 0, 0, 0], [w, h, w, h]) / scale
            if box[2] - box[0] < 2 or box[3] - box[1] < 2:
                continue
            class_name = ID_TO_NAMES[int(classes[i]) % len(ID_TO_NAMES)]
            ids.append(f"region_{stem}_{i}")
            embs.append(embeddings[i].tolist())
            metas.append(
                region_metadata(
                    path, i, box.tolist(), float(classes[i]), class_name,
                    float(scores[i]), orig_w, orig_h,
                )
            )
        if ids:
            self.collection.upsert(ids=ids, embeddings=embs, metadatas=metas)
        # whole-page embedding (is_region: False) so page-level analysis
        # (cross_compare, demo queries) works against serve-built stores;
        # ImageProcessor provides the schema + store-existence dedup
        self._image_processor.process_image(path)
        self.progress.mark_completed(path)
        return len(ids)

    def _batch_fn_for_bucket(self, bucket: Tuple[int, int]):
        if bucket not in self._batch_fns:
            from multimodal_embeddings_tpu.pipeline.fused import (
                build_fused_batch_fn,
                build_split_batch_fn,
            )

            logger.info(
                "compiling dp=%d batch program(s) for bucket %s",
                self.args.data_parallel,
                bucket,
            )
            if self.embedder.config.family == "mme5":
                # parity embedder: two sharded programs (detect batch +
                # embed chunks), one page per chip over the data axis
                self._batch_fns[bucket] = build_split_batch_fn(
                    self.detector,
                    self.embedder,
                    bucket,
                    num_regions=self.args.num_regions,
                    embed_chunk=self._embed_chunk(),
                    letterbox=not self.args.squeeze_views,
                    mesh=self.mesh,
                )
            else:
                self._batch_fns[bucket] = build_fused_batch_fn(
                    self.detector,
                    self.embedder,
                    bucket,
                    num_regions=self.args.num_regions,
                    mesh=self.mesh,
                    letterbox=not self.args.squeeze_views,
                )
        return self._batch_fns[bucket]

    def _run_batched(self, paths) -> int:
        """Data-parallel ingest: pages grouped by shape bucket into
        batches of ``data_parallel``, each batch one sharded XLA program
        over the mesh data axis; the last partial group is padded by
        repeating its first page (clone results are discarded)."""
        import jax

        from multimodal_embeddings_tpu.io.prefetch import (
            PrefetchError,
            Prefetcher,
        )

        n = self.args.data_parallel
        total = 0
        queues: Dict[Tuple[int, int], list] = {}

        def flush(bucket) -> None:
            nonlocal total
            entries = queues.pop(bucket, [])
            if not entries:
                return
            # numpy batch straight into the batch fn: its device_put shards
            # host→chips once (jnp.asarray here would first commit the full
            # batch to device 0, a second cross-device copy per batch)
            padded_batch = np.stack(
                [prep[0] for _, prep in entries]
                + [entries[0][1][0]] * (n - len(entries))
            )
            try:
                result = self._batch_fn_for_bucket(bucket)(padded_batch)
            except Exception as exc:  # noqa: BLE001 — keep serving other buckets
                for path, _ in entries:
                    logger.error("failed on %s: %s", path, exc)
                return
            for b, (path, prep) in enumerate(entries):
                page_result = jax.tree.map(lambda x: x[b], result)
                try:
                    cnt = self._finalize(path, prep, page_result)
                    total += cnt
                    logger.info(
                        "served %s: %d regions (dp batch)",
                        os.path.basename(path),
                        cnt,
                    )
                except Exception as exc:  # noqa: BLE001 — keep serving
                    logger.error("failed on %s: %s", path, exc)

        prefetcher = Prefetcher(paths, self._prepare, depth=2)
        try:
            it = iter(prefetcher)
            while True:
                try:
                    path, prepared = next(it)
                except StopIteration:
                    break
                except PrefetchError as exc:
                    logger.error("failed on %s: %s", exc.item, exc.cause)
                    continue
                bucket = prepared[1]
                queues.setdefault(bucket, []).append((path, prepared))
                if len(queues[bucket]) == n:
                    flush(bucket)
            for bucket in list(queues):
                flush(bucket)
        finally:
            prefetcher.close()
        return total

    def process_page(self, path: str) -> int:
        """Sequential single-page path (decode → execute → finalize).

        On a mesh the page runs through the sharded batch program (a
        TP-sharded embedder tree can't execute the single-device split
        program — mixed device commitments); the data axis is padded by
        repeating the page and clone results are discarded."""
        prepared = self._prepare(path)
        if self.mesh is not None:
            import jax

            fn = self._batch_fn_for_bucket(prepared[1])
            batch = np.stack([prepared[0]] * self.args.data_parallel)
            result = jax.tree.map(lambda x: x[0], fn(batch))
            return self._finalize(path, prepared, result)
        return self._finalize(path, prepared, self._submit(prepared))

    def run_once(self) -> int:
        """Ingest pending pages through a 3-stage software pipeline:
        the prefetch thread decodes page N+1 while the device runs page N
        (async dispatch) and the main thread finalizes page N-1. Results
        are identical to the sequential per-page loop (test-locked);
        per-page failures skip that page, as in the reference's
        skip-errors drivers."""
        from multimodal_embeddings_tpu.io.prefetch import (
            PrefetchError,
            Prefetcher,
        )

        paths = [
            p
            for p in get_image_paths(self.args.input_folder)
            if not self.progress.is_completed(p)
        ]
        total = 0
        start = time.perf_counter()
        if self.mesh is not None:
            self._run_batched(paths)
            if paths:
                elapsed = time.perf_counter() - start
                logger.info(
                    "ingested %d pages in %.2fs (%.2f pages/s, dp=%d tp=%d)",
                    len(paths),
                    elapsed,
                    len(paths) / elapsed,
                    self.args.data_parallel,
                    getattr(self.args, "model_parallel", 1),
                )
            return len(paths)
        if getattr(self.args, "no_prefetch", False):
            # sequential A/B reference for measuring the pipeline win
            for path in paths:
                try:
                    n = self.process_page(path)
                    total += n
                    logger.info(
                        "served %s: %d regions", os.path.basename(path), n
                    )
                except Exception as exc:  # noqa: BLE001 — keep serving
                    logger.error("failed on %s: %s", path, exc)
            if paths:
                elapsed = time.perf_counter() - start
                logger.info(
                    "ingested %d pages in %.2fs (%.2f pages/s, sequential)",
                    len(paths),
                    elapsed,
                    len(paths) / elapsed,
                )
            return len(paths)
        prefetcher = Prefetcher(paths, self._prepare, depth=2)
        inflight = None  # (path, prepared, dispatched result)

        def finalize(entry) -> int:
            fpath, fprep, fresult = entry
            try:
                n = self._finalize(fpath, fprep, fresult)
                logger.info("served %s: %d regions", os.path.basename(fpath), n)
                return n
            except Exception as exc:  # noqa: BLE001 — keep serving
                logger.error("failed on %s: %s", fpath, exc)
                return 0

        try:
            it = iter(prefetcher)
            while True:
                try:
                    path, prepared = next(it)
                except StopIteration:
                    break
                except PrefetchError as exc:
                    logger.error("failed on %s: %s", exc.item, exc.cause)
                    continue
                try:
                    result = self._submit(prepared)
                except Exception as exc:  # noqa: BLE001 — keep serving
                    logger.error("failed on %s: %s", path, exc)
                    result = None
                # finalize the previous page while the device runs this one
                if inflight is not None:
                    total += finalize(inflight)
                inflight = (path, prepared, result) if result is not None else None
            if inflight is not None:
                total += finalize(inflight)
        finally:
            prefetcher.close()
        if paths:
            elapsed = time.perf_counter() - start
            logger.info(
                "ingested %d pages in %.2fs (%.2f pages/s)",
                len(paths),
                elapsed,
                len(paths) / elapsed,
            )
        return len(paths)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Serve pages through the fused pipeline")
    parser.add_argument("--input_folder", default="newspaper_images")
    parser.add_argument("--db_path", default="db")
    parser.add_argument("--imgsz", type=int, default=1024)
    parser.add_argument("--variant", default="m", choices=list("nsmblx"))
    parser.add_argument("--grid_configs", default="2x2,3x3,4x4")
    parser.add_argument("--num_regions", type=int, default=48)
    parser.add_argument("--embedder_family", choices=["siglip", "mme5"], default="siglip")
    parser.add_argument("--embedder_size", choices=["tiny", "base"], default="base")
    parser.add_argument("--detector_weights", default=None)
    parser.add_argument("--embedder_weights", default=None)
    parser.add_argument(
        "--quantize",
        nargs="?",
        const="int8-mixed",
        default=False,
        choices=["int8", "int4", "int8-mixed", "int4-mixed"],
        help="weight-only quantized mme5 embedder (single-chip 11B "
        "serving; models/quantized.py). Bare --quantize = int8-mixed "
        "(bf16 vision + int8 text — the measured serving default, 1.4x "
        "pure int8); --quantize int4 packs two weights per byte "
        "(group-128 scales)",
    )
    parser.add_argument(
        "--squeeze_views",
        action="store_true",
        help="aspect-squeeze view resize instead of the default letterbox "
        "(2.3%% faster, but detection agreement with the exact stage chain "
        "drops from 0.69 to 0.39 precision — SERVE_PARITY.json)",
    )
    parser.add_argument(
        "--data_parallel",
        type=int,
        default=1,
        help="shard page batches of this size over the mesh data axis "
        "(multi-chip serving; pages grouped by shape bucket)",
    )
    parser.add_argument(
        "--model_parallel",
        type=int,
        default=1,
        help="tensor-shard the parity (mme5) embedder over this many chips "
        "per page (Megatron-style logical-axis rules; serves weight trees "
        "one chip can't hold, e.g. bf16 11B at tp=2); composes with "
        "--data_parallel on a (dp, tp) mesh",
    )
    parser.add_argument(
        "--no_prefetch",
        action="store_true",
        help="disable the 3-stage ingest pipeline (sequential decode → "
        "execute → upsert); the A/B reference for the pipeline win",
    )
    parser.add_argument("--watch", action="store_true", help="poll for new pages")
    parser.add_argument("--poll_interval", type=float, default=5.0)
    return parser


def main(argv=None) -> int:
    from multimodal_embeddings_tpu.cli import apply_env_platform

    apply_env_platform()
    args = build_parser().parse_args(argv)
    server = FusedServer(args)
    server.run_once()
    while args.watch:
        time.sleep(args.poll_interval)
        server.run_once()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
