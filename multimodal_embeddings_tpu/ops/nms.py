"""Greedy non-maximum suppression.

Two keep-set semantics exist in the reference and both are reproduced:

* **class-agnostic** (torchvision.ops.nms as called at
  ``1_doclayout_bboxes.py:219-223``): score-sorted greedy, suppress when
  ``IoU > threshold`` regardless of class;
* **class-aware** (pure-Python greedy at ``3_combine_grids.py:80-138``):
  repeatedly take the highest-scoring remaining box (first index on ties)
  and suppress remaining boxes with ``IoU > threshold`` *and* equal class.

Both reduce to the same masked greedy scan once boxes are put in selection
order, because the selection order of greedy NMS is exactly descending-score
order restricted to survivors. The host path runs that scan vectorized in
float64 (bit-identical keep sets and output order to the reference); the JAX
path runs it on padded float32 arrays inside ``jit`` with static shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_embeddings_tpu.ops.iou import iou_matrix, iou_matrix_np


def greedy_nms_host(
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray | None = None,
    iou_threshold: float = 0.5,
) -> np.ndarray:
    """Host greedy NMS: the native C++ kernel when available (bit-identical,
    verified in tests), NumPy otherwise. Production host callers use this;
    ``greedy_nms_np`` stays pure for parity testing."""
    from multimodal_embeddings_tpu.utils.native import greedy_nms_native

    native = greedy_nms_native(boxes, scores, classes, iou_threshold)
    if native is not None:
        return native
    return greedy_nms_np(boxes, scores, classes, iou_threshold)


def greedy_nms_np(
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray | None = None,
    iou_threshold: float = 0.5,
) -> np.ndarray:
    """Exact greedy NMS on the host. Returns kept indices in selection order
    (descending score, first index wins ties — matching
    ``scores_copy.index(max(scores_copy))`` at ``3_combine_grids.py:112``).

    ``classes=None`` gives torchvision-style class-agnostic behavior.
    """
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    scores = np.asarray(scores, dtype=np.float64).reshape(-1)
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int64)

    iou = iou_matrix_np(boxes)
    if classes is not None:
        cls = np.asarray(classes, dtype=np.float64).reshape(-1)
        same = cls[:, None] == cls[None, :]
    else:
        same = np.ones((n, n), dtype=bool)
    suppress = (iou > iou_threshold) & same

    alive = np.ones(n, dtype=bool)
    keep: list[int] = []
    neg_inf = -np.inf
    masked = scores.copy()
    for _ in range(n):
        i = int(np.argmax(masked))  # first max index, like list.index(max(...))
        if not alive[i]:
            break
        keep.append(i)
        # Suppress same-class overlaps (the selected box suppresses itself too).
        dead = suppress[i] & alive
        dead[i] = True
        alive &= ~dead
        masked[dead] = neg_inf
        if not alive.any():
            break
    return np.asarray(keep, dtype=np.int64)


def _nms_scan(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    class_aware: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core padded greedy scan. All shapes static; runs fully on device.

    Returns ``(keep_mask, order)`` where ``order`` is the descending-score
    permutation used for the scan: kept boxes listed in selection order are
    ``order[keep_in_order_positions]``.
    """
    n = boxes.shape[0]
    # Stable descending sort; invalid rows sink to the end.
    sort_scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-sort_scores, stable=True)
    b = boxes[order]
    c = classes[order]
    v = valid[order]

    iou = iou_matrix(b)
    if class_aware:
        same = c[:, None] == c[None, :]
    else:
        same = jnp.ones((n, n), dtype=bool)
    suppress = (iou > iou_threshold) & same

    # Greedy NMS as a fixpoint instead of an n-step sequential loop:
    # keep_i = valid_i ∧ ¬∃ j<i (keep_j ∧ suppress_ji) is a recurrence over
    # the strict ranking DAG, so Jacobi iteration K ← f(K) stabilizes every
    # box of suppression-chain depth ≤ t after t sweeps and reaches the
    # unique greedy solution in depth+1 sweeps (typically < 10, vs n = 300
    # serialized fori steps per view in the fused detect program — each
    # sweep is one (n,n) masked reduce on the VPU).
    idx = jnp.arange(n)
    sup_earlier = suppress & (idx[:, None] < idx[None, :])  # j kills i, j<i
    sup_earlier = sup_earlier & v[None, :]  # padding rows can't be killed…
    sup_earlier = sup_earlier & v[:, None]  # …and dead rows never kill

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < n, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        killed = jnp.any(sup_earlier & keep[:, None], axis=0)
        return v & ~killed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (v, ~v, jnp.int32(0)))
    return keep, order


@functools.partial(jax.jit, static_argnames=("iou_threshold", "class_aware"))
def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.45,
    class_aware: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over one padded box set. See ``_nms_scan``."""
    return _nms_scan(boxes, scores, classes, valid, iou_threshold, class_aware)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "class_aware"))
def batched_nms_padded(
    boxes: jnp.ndarray,  # (B, N, 4)
    scores: jnp.ndarray,  # (B, N)
    classes: jnp.ndarray,  # (B, N)
    valid: jnp.ndarray,  # (B, N) bool
    iou_threshold: float = 0.45,
    class_aware: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmapped greedy NMS across a batch of padded box sets."""
    fn = functools.partial(
        _nms_scan, iou_threshold=iou_threshold, class_aware=class_aware
    )
    return jax.vmap(fn)(boxes, scores, classes, valid)


def nms_indices_from_padded(keep: np.ndarray, order: np.ndarray) -> np.ndarray:
    """Convert a device ``(keep_mask, order)`` pair into kept original indices
    in selection order (the host-path return convention).

    ``keep`` is a mask over *sorted* positions (``keep[i]`` refers to box
    ``order[i]``) and sorted order is selection order, so the kept original
    indices in selection order are ``order`` at the true positions of ``keep``.
    """
    keep = np.asarray(keep)
    order = np.asarray(order)
    return order[np.nonzero(keep)[0]]
