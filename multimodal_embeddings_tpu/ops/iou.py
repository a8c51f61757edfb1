"""Pairwise IoU.

Reference semantics: scalar ``calculate_iou`` at ``3_combine_grids.py:46-78``
(clamped intersection, union = a1 + a2 - inter, 0 when union <= 0). The host
path reproduces that arithmetic vectorized in float64; the JAX path is the
same math in float32 on padded arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def iou_matrix_np(boxes_a: np.ndarray, boxes_b: np.ndarray | None = None) -> np.ndarray:
    """Exact float64 IoU matrix between two box sets ``[x1, y1, x2, y2]``.

    Matches the reference's scalar expression order so results are
    bit-identical to looping ``calculate_iou`` over all pairs.
    """
    a = np.asarray(boxes_a, dtype=np.float64)
    b = a if boxes_b is None else np.asarray(boxes_b, dtype=np.float64)
    a = a.reshape(-1, 4)
    b = b.reshape(-1, 4)

    x_left = np.maximum(a[:, None, 0], b[None, :, 0])
    y_top = np.maximum(a[:, None, 1], b[None, :, 1])
    x_right = np.minimum(a[:, None, 2], b[None, :, 2])
    y_bottom = np.minimum(a[:, None, 3], b[None, :, 3])

    inter = np.maximum(0.0, x_right - x_left) * np.maximum(0.0, y_bottom - y_top)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Jittable IoU matrix on padded boxes; same math in float32.

    Padded rows should be all-zero boxes — they produce zero area, zero
    intersection and therefore IoU 0 against everything.
    """
    a = boxes_a
    b = a if boxes_b is None else boxes_b

    x_left = jnp.maximum(a[..., :, None, 0], b[..., None, :, 0])
    y_top = jnp.maximum(a[..., :, None, 1], b[..., None, :, 1])
    x_right = jnp.minimum(a[..., :, None, 2], b[..., None, :, 2])
    y_bottom = jnp.minimum(a[..., :, None, 3], b[..., None, :, 3])

    inter = jnp.maximum(0.0, x_right - x_left) * jnp.maximum(0.0, y_bottom - y_top)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
