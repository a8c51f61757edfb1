"""Detection decoding and postprocessing (all on device, static shapes).

Reproduces the reference's detection contract
(``1_doclayout_bboxes.py:191-242``): conf-thresholded boxes in original
image coordinates followed by class-agnostic greedy NMS at IoU 0.45
(torchvision semantics). The v10 head is NMS-free (one-to-one top-k), the
reference still re-runs NMS on top — so the full contract is
``top-k → conf filter → NMS`` and both steps run on TPU here.

Decode math: DFL expectation over REG_MAX softmax bins gives per-side
distances (l, t, r, b) from each anchor center at each stride; class scores
are sigmoids.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_embeddings_tpu.models.yolo import REG_MAX, STRIDES
from multimodal_embeddings_tpu.ops.nms import batched_nms_padded


class Detections(NamedTuple):
    """Padded per-image detections (device arrays)."""

    boxes: jnp.ndarray  # (B, max_det, 4) xyxy in model-input pixels
    scores: jnp.ndarray  # (B, max_det)
    classes: jnp.ndarray  # (B, max_det) int32
    valid: jnp.ndarray  # (B, max_det) bool


def _anchors_for(shapes: Sequence[Tuple[int, int]]) -> Tuple[np.ndarray, np.ndarray]:
    """Anchor centers (in input pixels) and per-anchor stride, concatenated
    over levels."""
    points, strides = [], []
    for (h, w), s in zip(shapes, STRIDES):
        ys, xs = np.meshgrid(
            np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij"
        )
        pts = np.stack([(xs + 0.5) * s, (ys + 0.5) * s], axis=-1).reshape(-1, 2)
        points.append(pts)
        strides.append(np.full((h * w,), s, np.float32))
    return np.concatenate(points), np.concatenate(strides)


def dfl_expectation(reg: jnp.ndarray) -> jnp.ndarray:
    """(…, 4*REG_MAX) logits → (…, 4) expected distances."""
    shape = reg.shape[:-1] + (4, REG_MAX)
    probs = jax.nn.softmax(reg.reshape(shape).astype(jnp.float32), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    return jnp.einsum("...kb,b->...k", probs, bins)


@functools.partial(
    jax.jit, static_argnames=("max_det", "conf_threshold", "iou_threshold", "with_nms")
)
def decode_predictions(
    level_outputs,  # list of (reg (B,h,w,4*REG_MAX), cls (B,h,w,C)) per stride
    max_det: int = 300,
    conf_threshold: float = 0.1,
    iou_threshold: float = 0.45,
    with_nms: bool = True,
) -> Detections:
    """Raw head maps → padded, NMS'd detections. Fully jitted; shapes depend
    only on the input resolution and max_det."""
    regs, clss = [], []
    shapes = []
    for reg, cls in level_outputs:
        b, h, w, _ = reg.shape
        shapes.append((h, w))
        regs.append(reg.reshape(b, h * w, -1))
        clss.append(cls.reshape(b, h * w, -1))
    reg = jnp.concatenate(regs, axis=1)  # (B, A, 64)
    cls = jnp.concatenate(clss, axis=1)  # (B, A, C)

    anchor_points, anchor_strides = _anchors_for(shapes)
    anchor_points = jnp.asarray(anchor_points)
    anchor_strides = jnp.asarray(anchor_strides)

    dist = dfl_expectation(reg)  # (B, A, 4) in stride units
    x1y1 = anchor_points[None] - dist[..., :2] * anchor_strides[None, :, None]
    x2y2 = anchor_points[None] + dist[..., 2:] * anchor_strides[None, :, None]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)  # (B, A, 4)

    probs = jax.nn.sigmoid(cls.astype(jnp.float32))  # (B, A, C)
    best_score = jnp.max(probs, axis=-1)
    best_class = jnp.argmax(probs, axis=-1).astype(jnp.int32)

    # one-to-one top-k selection (v10 NMS-free export convention)
    k = min(max_det, best_score.shape[1])
    top_scores, top_idx = jax.lax.top_k(best_score, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_classes = jnp.take_along_axis(best_class, top_idx, axis=1)
    valid = top_scores >= conf_threshold

    if with_nms:
        keep, order = batched_nms_padded(
            top_boxes,
            top_scores,
            top_classes,
            valid,
            iou_threshold=iou_threshold,
            class_aware=False,
        )
        # Reorder into selection order so downstream JSON matches the
        # reference's score-descending output convention.
        sorted_boxes = jnp.take_along_axis(top_boxes, order[..., None], axis=1)
        sorted_scores = jnp.take_along_axis(top_scores, order, axis=1)
        sorted_classes = jnp.take_along_axis(top_classes, order, axis=1)
        return Detections(sorted_boxes, sorted_scores, sorted_classes, keep)

    return Detections(top_boxes, top_scores, top_classes, valid)


def scale_boxes_to_original(
    boxes: np.ndarray,
    scale: float,
    pad: Tuple[int, int],
    original_hw: Tuple[int, int],
) -> np.ndarray:
    """Undo letterboxing: model-input pixel boxes → original image coords,
    clipped to the image (ultralytics scale_boxes convention)."""
    pad_top, pad_left = pad
    out = boxes.astype(np.float64).copy()
    out[..., [0, 2]] -= pad_left
    out[..., [1, 3]] -= pad_top
    out /= scale
    h, w = original_hw
    out[..., [0, 2]] = np.clip(out[..., [0, 2]], 0, w)
    out[..., [1, 3]] = np.clip(out[..., [1, 3]], 0, h)
    return out
