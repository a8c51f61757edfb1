"""Compute ops: geometry and image kernels.

Every op ships two faces:

* an exact host path (float64 NumPy, vectorized) that reproduces the
  reference's arithmetic bit-for-bit for JSON emission, and
* a jitted, padded, statically-shaped JAX path for TPU batch execution.
"""

from multimodal_embeddings_tpu.ops.iou import iou_matrix_np, iou_matrix
from multimodal_embeddings_tpu.ops.nms import (
    greedy_nms_np,
    nms_padded,
    batched_nms_padded,
)
from multimodal_embeddings_tpu.ops.grid import grid_cells, translate_boxes
from multimodal_embeddings_tpu.ops.edge_filter import (
    internal_edge_mask_np,
    internal_edge_mask,
)
from multimodal_embeddings_tpu.ops.widths import bin_widths, median_from_bins
from multimodal_embeddings_tpu.ops.peaks import gaussian_window, find_peaks_np
from multimodal_embeddings_tpu.ops.columns import find_column_centers
