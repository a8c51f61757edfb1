"""Internal-edge box filtering (stage 2).

Semantics of ``is_box_touching_internal_edge`` (``2_edge_box_filter.py:44-90``):
a cell edge is *internal* when it is more than ``threshold`` px away from the
corresponding page edge (left/top: ``cell_min > threshold``; right/bottom:
``|cell_max - page_dim| > threshold``), and a box is rejected when it comes
within ``threshold`` px of any internal edge (``>=`` / ``<=`` comparisons,
inclusive). Boxes are tested in *page* coordinates (``boxes_original``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def internal_edge_mask_np(
    boxes: np.ndarray,
    cell_bounds: tuple[float, float, float, float],
    image_width: float,
    image_height: float,
    threshold: float = 10.0,
) -> np.ndarray:
    """Boolean mask, True where the box touches an internal cell edge
    (i.e. should be removed). Exact float64 reproduction of the reference
    predicate including its comparison directions."""
    b = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    cx_min, cy_min, cx_max, cy_max = (float(v) for v in cell_bounds)

    right_internal = abs(cx_max - image_width) > threshold
    bottom_internal = abs(cy_max - image_height) > threshold
    left_internal = cx_min > threshold
    top_internal = cy_min > threshold

    touching = np.zeros(b.shape[0], dtype=bool)
    if right_internal:
        touching |= b[:, 2] >= (cx_max - threshold)
    if bottom_internal:
        touching |= b[:, 3] >= (cy_max - threshold)
    if left_internal:
        touching |= b[:, 0] <= (cx_min + threshold)
    if top_internal:
        touching |= b[:, 1] <= (cy_min + threshold)
    return touching


@functools.partial(jax.jit, static_argnames=("threshold",))
def internal_edge_mask(
    boxes: jnp.ndarray,  # (..., N, 4) page-coordinate boxes
    cell_bounds: jnp.ndarray,  # (..., 4) [x_start, y_start, x_end, y_end]
    image_size: jnp.ndarray,  # (..., 2) [width, height]
    threshold: float = 10.0,
) -> jnp.ndarray:
    """Jittable batched variant: one cell per leading index, True = remove.

    Because the predicate is branch-free elementwise math it vectorizes
    across all cells of all grids of all pages at once.
    """
    cx_min = cell_bounds[..., 0:1]
    cy_min = cell_bounds[..., 1:2]
    cx_max = cell_bounds[..., 2:3]
    cy_max = cell_bounds[..., 3:4]
    width = image_size[..., 0:1]
    height = image_size[..., 1:2]

    right_internal = jnp.abs(cx_max - width) > threshold
    bottom_internal = jnp.abs(cy_max - height) > threshold
    left_internal = cx_min > threshold
    top_internal = cy_min > threshold

    touching = right_internal & (boxes[..., 2] >= cx_max - threshold)
    touching |= bottom_internal & (boxes[..., 3] >= cy_max - threshold)
    touching |= left_internal & (boxes[..., 0] <= cx_min + threshold)
    touching |= top_internal & (boxes[..., 1] <= cy_min + threshold)
    return touching
