"""LayoutDetector: the user-facing detection engine.

Replaces the reference's ``YOLODocumentLayoutDetector``
(``1_doclayout_bboxes.py:61-242``) and the cached variant
(``doclayout_detector.py:26-194``). Differences by design:

* **one batched forward for all views** — the reference runs 30 sequential
  ``model.predict`` calls per page (full + 2x2 + 3x3 + 4x4 cells,
  ``1_doclayout_bboxes.py:749-768``); here every view is letterboxed to the
  same static input and the whole stack runs as one jitted forward + fused
  decode + batched NMS on TPU;
* detection results carry the same regions-dict contract and the same
  JSON result cache keyed ``{stem}_conf{c}_iou{i}.json``
  (``doclayout_detector.py:110-121``).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_embeddings_tpu.config import DetectorConfig, ID_TO_NAMES
from multimodal_embeddings_tpu.io.images import load_image_rgb
from multimodal_embeddings_tpu.io.json_io import load_json, regions_dict, save_json
from multimodal_embeddings_tpu.io.logging_setup import get_logger
from multimodal_embeddings_tpu.models.weights import (
    deterministic_init,
    load_checkpoint,
)
from multimodal_embeddings_tpu.models.yolo import DocLayoutYOLO
from multimodal_embeddings_tpu.models.yolo_decode import (
    decode_predictions,
    scale_boxes_to_original,
)
from multimodal_embeddings_tpu.ops.grid import GridCell, grid_cells, translate_boxes

logger = get_logger("detector")


def _letterbox_host(
    image: np.ndarray, size: int, pad_value: float = 114.0
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Host-side letterbox (cheap resize via PIL-free numpy + cv2 if present);
    keeps the jitted graph free of per-image shapes."""
    try:
        import cv2

        h, w = image.shape[:2]
        scale = min(size / h, size / w)
        new_h, new_w = int(round(h * scale)), int(round(w * scale))
        resized = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    except Exception:  # pragma: no cover
        from multimodal_embeddings_tpu.ops.image import resize_bilinear

        h, w = image.shape[:2]
        scale = min(size / h, size / w)
        new_h, new_w = int(round(h * scale)), int(round(w * scale))
        resized = np.asarray(resize_bilinear(jnp.asarray(image, jnp.float32), new_h, new_w))
    canvas = np.full((size, size, 3), pad_value, np.float32)
    top = (size - new_h) // 2
    left = (size - new_w) // 2
    canvas[top : top + new_h, left : left + new_w] = resized
    return canvas, scale, (top, left)


class LayoutDetector:
    """DocLayout-YOLO inference engine with a static-shape batched TPU path."""

    def __init__(
        self,
        config: DetectorConfig = DetectorConfig(),
        num_classes: int = 10,
        cache_dir: Optional[str] = None,
        seed: int = 0,
        dtype=jnp.bfloat16,
    ):
        self.config = config
        self.num_classes = num_classes
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        self.model = DocLayoutYOLO(
            num_classes=num_classes,
            variant=config.variant,
            s2d_stem=config.s2d_stem,
            glcrm=config.glcrm,
            pallas_convs=config.pallas_convs,
            pallas_mode=getattr(config, "pallas_mode", "stage"),
            dtype=dtype,
        )
        example = jnp.zeros((1, config.image_size, config.image_size, 3), jnp.float32)
        self.variables = deterministic_init(self.model, example, seed=seed)
        if config.weights_path:
            self.variables = load_checkpoint(config.weights_path, self.variables)
            logger.info("loaded detector weights from %s", config.weights_path)
        else:
            logger.warning(
                "detector running with deterministic random weights "
                "(no checkpoint configured)"
            )
        self._forward = self._build_forward()
        self._views_programs: Dict[Tuple[int, int], tuple] = {}

    def _views_program(self, height: int, width: int):
        """Per-page-shape jitted view extraction + on-device letterbox
        (``ops.image.letterbox_views_matmul``). One extra compile per
        distinct page shape, persistently cached by the XLA compilation
        cache; removes ~30 host-side resizes per page."""
        key = (height, width)
        cached = self._views_programs.get(key)
        if cached is not None:
            return cached
        from multimodal_embeddings_tpu.ops.image import letterbox_views_matmul

        bounds = [(0, 0, width, height)]
        cells_by_grid: Dict[Tuple[int, int], List[GridCell]] = {}
        for rows, cols in self.config.grid_configs:
            cells = grid_cells(width, height, rows, cols, self.config.overlap_percentage)
            cells_by_grid[(rows, cols)] = cells
            bounds.extend(cell.slice_bounds for cell in cells)
        size = self.config.image_size

        # letterbox placement is host-static per slice shape
        metas = []
        for x0, y0, x1, y1 in bounds:
            gh, gw = y1 - y0, x1 - x0
            scale = min(size / gh, size / gw)
            new_h, new_w = int(round(gh * scale)), int(round(gw * scale))
            metas.append((scale, ((size - new_h) // 2, (size - new_w) // 2)))

        @jax.jit
        def extract(page):
            views, _ = letterbox_views_matmul(
                page.astype(jnp.float32), bounds, size
            )
            return views

        entry = (extract, metas, bounds, cells_by_grid)
        self._views_programs[key] = entry
        return entry

    def _build_forward(self):
        model = self.model
        conf = self.config.conf_threshold
        iou = self.config.iou_threshold
        max_det = self.config.max_detections

        @jax.jit
        def forward(variables, images):
            outputs = model.apply(variables, images / 255.0, train=False)
            return decode_predictions(
                outputs,
                max_det=max_det,
                conf_threshold=conf,
                iou_threshold=iou,
                with_nms=True,
            )

        return forward

    # -- core batched API ---------------------------------------------------

    def detect_batch(
        self, images: Sequence[np.ndarray]
    ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Run detection on a list of HxWx3 uint8/float RGB arrays.

        All images go through ONE jitted forward (padded to the batch size);
        returns per-image (boxes_xyxy_original_coords, classes, scores),
        NMS'd, in score-descending order.
        """
        size = self.config.image_size
        batch = np.zeros((len(images), size, size, 3), np.float32)
        metas = []
        for i, img in enumerate(images):
            canvas, scale, pad = _letterbox_host(np.asarray(img, np.float32), size)
            batch[i] = canvas
            metas.append((scale, pad, img.shape[:2]))

        det = self._forward(self.variables, jnp.asarray(batch))
        return self._postprocess_views(det, metas)

    @staticmethod
    def _postprocess_views(det, metas):
        """Model outputs → per-view (boxes_original, classes, scores);
        ``metas[i] = (scale, (pad_top, pad_left), (h, w))``."""
        boxes = np.asarray(det.boxes, np.float64)
        scores = np.asarray(det.scores, np.float64)
        classes = np.asarray(det.classes)
        valid = np.asarray(det.valid)

        results = []
        for i, (scale, pad, hw) in enumerate(metas):
            mask = valid[i]
            b = scale_boxes_to_original(boxes[i][mask], scale, pad, hw)
            results.append((b, classes[i][mask].astype(np.float64), scores[i][mask]))
        return results

    # -- reference-contract API --------------------------------------------

    def _cache_path(self, image_path: str) -> Optional[str]:
        if not self.cache_dir:
            return None
        stem = os.path.splitext(os.path.basename(image_path))[0]
        return os.path.join(
            self.cache_dir,
            f"{stem}_conf{self.config.conf_threshold}_iou{self.config.iou_threshold}.json",
        )

    def detect_regions(self, image_path: str) -> Optional[Dict]:
        """Single-image regions dict with result caching
        (``doclayout_detector.py:99-163`` contract)."""
        cache = self._cache_path(image_path)
        if cache and os.path.exists(cache):
            logger.info("cache hit: %s", os.path.basename(cache))
            return load_json(cache)

        image = load_image_rgb(image_path)
        (boxes, classes, scores), = self.detect_batch([image])
        regions = regions_dict(
            image_path=image_path,
            width=image.shape[1],
            height=image.shape[0],
            parameters={
                "conf_threshold": self.config.conf_threshold,
                "iou_threshold": self.config.iou_threshold,
            },
            boxes=boxes.tolist(),
            classes=classes.tolist(),
            scores=scores.tolist(),
            class_names=[ID_TO_NAMES[int(c)] for c in classes],
        )
        if cache:
            save_json(regions, cache)
        return regions

    def detect_page_multigrid(
        self, image_path: str, image: Optional[np.ndarray] = None
    ) -> Tuple[Dict, List[Tuple[Tuple[int, int], List[GridCell], List[Dict]]]]:
        """Detect the full page plus every grid view in ONE device batch.

        Returns ``(full_page_regions, per_grid)`` where ``per_grid`` is a list
        of ``((rows, cols), cells, cell_regions)`` with cell regions in the
        reference's cell-JSON layout (local boxes + ``boxes_original``).
        ``image`` (uint8 RGB) skips the decode — the stage-1 prefetch
        pipeline decodes ahead on a worker thread.
        """
        if image is None:
            image = load_image_rgb(image_path)
        height, width = image.shape[:2]
        grids: List[Tuple[int, int]] = list(self.config.grid_configs)

        if self.config.device_letterbox:
            # page uploaded ONCE; all 30 views sliced + letterboxed on
            # device (matmul resize), host does no per-view resampling
            extract, lb_metas, bounds, cells_by_grid = self._views_program(
                height, width
            )
            views_dev = extract(jnp.asarray(image))
            det = self._forward(self.variables, views_dev)
            metas = [
                (scale, pad, (y1 - y0, x1 - x0))
                for (scale, pad), (x0, y0, x1, y1) in zip(lb_metas, bounds)
            ]
            detections = self._postprocess_views(det, metas)
            view_shapes = [(y1 - y0, x1 - x0, image.shape[2]) for (x0, y0, x1, y1) in bounds]
        else:
            views: List[np.ndarray] = [image]
            cells_by_grid = {}
            for rows, cols in grids:
                cells = grid_cells(
                    width, height, rows, cols, self.config.overlap_percentage
                )
                cells_by_grid[(rows, cols)] = cells
                for cell in cells:
                    x0, y0, x1, y1 = cell.slice_bounds
                    views.append(image[y0:y1, x0:x1])
            detections = self.detect_batch(views)
            view_shapes = [v.shape for v in views]

        def to_regions(idx: int, path: str, shape) -> Dict:
            boxes, classes, scores = detections[idx]
            return regions_dict(
                image_path=path,
                width=shape[1],
                height=shape[0],
                parameters={
                    "conf_threshold": self.config.conf_threshold,
                    "iou_threshold": self.config.iou_threshold,
                },
                boxes=boxes.tolist(),
                classes=classes.tolist(),
                scores=scores.tolist(),
                class_names=[ID_TO_NAMES[int(c)] for c in classes],
            )

        full_regions = to_regions(0, image_path, image.shape)

        per_grid = []
        idx = 1
        for rows, cols in grids:
            cells = cells_by_grid[(rows, cols)]
            cell_regions = []
            for cell in cells:
                regions = to_regions(idx, image_path, view_shapes[idx])
                regions["cell_coordinates"] = cell.coordinates
                regions["original_image_path"] = image_path
                regions["boxes_original"] = translate_boxes(regions["boxes"], cell)
                regions["grid_info"] = {
                    "rows": rows,
                    "cols": cols,
                    "row": cell.row,
                    "col": cell.col,
                }
                cell_regions.append(regions)
                idx += 1
            per_grid.append(((rows, cols), cells, cell_regions))
        return full_regions, per_grid
