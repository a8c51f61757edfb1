"""Unit tests for geometry ops: IoU, NMS, edge filter, grid, widths."""

import json
import os

import numpy as np
import pytest

from multimodal_embeddings_tpu.ops.iou import iou_matrix, iou_matrix_np
from multimodal_embeddings_tpu.ops.nms import (
    batched_nms_padded,
    greedy_nms_np,
    nms_indices_from_padded,
    nms_padded,
)
from multimodal_embeddings_tpu.ops.grid import grid_cells, translate_boxes
from multimodal_embeddings_tpu.ops.edge_filter import (
    internal_edge_mask,
    internal_edge_mask_np,
)
from multimodal_embeddings_tpu.ops.widths import (
    bin_widths,
    median_from_bins,
    plain_text_widths,
)


# --- reference-semantics oracles (scalar, transcribed contracts) -----------


def ref_iou(box1, box2):
    """Scalar IoU with the reference's exact branch structure
    (3_combine_grids.py:46-78)."""
    x_left = max(box1[0], box2[0])
    y_top = max(box1[1], box2[1])
    x_right = min(box1[2], box2[2])
    y_bottom = min(box1[3], box2[3])
    if x_right < x_left or y_bottom < y_top:
        return 0.0
    inter = (x_right - x_left) * (y_bottom - y_top)
    a1 = (box1[2] - box1[0]) * (box1[3] - box1[1])
    a2 = (box2[2] - box2[0]) * (box2[3] - box2[1])
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def ref_greedy_nms(boxes, scores, classes, iou_threshold):
    """List-based greedy class-aware NMS oracle (3_combine_grids.py:80-138)."""
    boxes, scores, classes = list(boxes), list(scores), list(classes)
    out = []
    while boxes:
        idx = scores.index(max(scores))
        out.append((boxes[idx], scores[idx], classes[idx]))
        cur_box = boxes.pop(idx)
        cur_cls = classes.pop(idx)
        scores.pop(idx)
        i = 0
        while i < len(boxes):
            if ref_iou(cur_box, boxes[i]) > iou_threshold and classes[i] == cur_cls:
                boxes.pop(i)
                scores.pop(i)
                classes.pop(i)
            else:
                i += 1
    return out


def random_boxes(rng, n, w=1000, h=800):
    x1 = rng.uniform(0, w * 0.9, n)
    y1 = rng.uniform(0, h * 0.9, n)
    bw = rng.uniform(5, w * 0.4, n)
    bh = rng.uniform(5, h * 0.4, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], axis=1)


class TestIoU:
    def test_matches_scalar_reference_bitwise(self):
        rng = np.random.default_rng(0)
        boxes = random_boxes(rng, 40)
        mat = iou_matrix_np(boxes)
        for i in range(40):
            for j in range(40):
                assert mat[i, j] == ref_iou(list(boxes[i]), list(boxes[j]))

    def test_degenerate_boxes(self):
        boxes = np.array([[0, 0, 0, 0], [10, 10, 20, 20], [10, 10, 10, 30]])
        mat = iou_matrix_np(boxes)
        assert mat[0, 1] == 0.0
        assert mat[2, 1] == 0.0  # zero-width box
        assert mat[1, 1] == 1.0

    def test_jax_matches_numpy(self):
        rng = np.random.default_rng(1)
        boxes = random_boxes(rng, 64).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(iou_matrix(boxes)), iou_matrix_np(boxes), rtol=2e-5, atol=1e-6
        )


class TestGreedyNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_class_aware_matches_reference_oracle(self, seed):
        rng = np.random.default_rng(seed)
        n = 120
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0.1, 1.0, n)
        classes = rng.integers(0, 4, n).astype(np.float64)

        keep = greedy_nms_np(boxes, scores, classes, iou_threshold=0.5)
        got = [(list(boxes[i]), scores[i], classes[i]) for i in keep]
        want = ref_greedy_nms(
            [list(b) for b in boxes], list(scores), list(classes), 0.5
        )
        assert len(got) == len(want)
        for (gb, gs, gc), (wb, ws, wc) in zip(got, want):
            assert gb == wb and gs == ws and gc == wc

    def test_duplicate_scores_tiebreak(self):
        # Equal scores: first index in current order must win.
        boxes = np.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [100, 100, 110, 110]], dtype=np.float64
        )
        scores = np.array([0.5, 0.5, 0.5])
        classes = np.array([1.0, 1.0, 1.0])
        keep = greedy_nms_np(boxes, scores, classes, iou_threshold=0.5)
        want = ref_greedy_nms([list(b) for b in boxes], list(scores), list(classes), 0.5)
        assert [list(boxes[i]) for i in keep] == [w[0] for w in want]

    def test_class_agnostic(self):
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=np.float64)
        scores = np.array([0.9, 0.8])
        # different classes: class-aware keeps both, agnostic keeps one
        classes = np.array([0.0, 1.0])
        assert len(greedy_nms_np(boxes, scores, classes, 0.5)) == 2
        assert len(greedy_nms_np(boxes, scores, None, 0.5)) == 1

    def test_padded_jax_matches_host(self):
        rng = np.random.default_rng(7)
        n, pad = 90, 128
        boxes = random_boxes(rng, n).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        classes = rng.integers(0, 4, n).astype(np.int32)

        pboxes = np.zeros((pad, 4), np.float32)
        pboxes[:n] = boxes
        pscores = np.zeros(pad, np.float32)
        pscores[:n] = scores
        pclasses = np.zeros(pad, np.int32)
        pclasses[:n] = classes
        valid = np.arange(pad) < n

        keep, order = nms_padded(
            pboxes, pscores, pclasses, valid, iou_threshold=0.5, class_aware=True
        )
        got = nms_indices_from_padded(keep, order)
        want = greedy_nms_np(boxes, scores, classes.astype(np.float64), 0.5)
        np.testing.assert_array_equal(np.sort(got), np.sort(want))

    def test_batched(self):
        rng = np.random.default_rng(9)
        B, pad = 4, 64
        boxes = np.zeros((B, pad, 4), np.float32)
        scores = np.zeros((B, pad), np.float32)
        classes = np.zeros((B, pad), np.int32)
        valid = np.zeros((B, pad), bool)
        ns = [10, 30, 0, 64]
        for b, n in enumerate(ns):
            boxes[b, :n] = random_boxes(rng, n)
            scores[b, :n] = rng.uniform(0.1, 1, n)
            classes[b, :n] = rng.integers(0, 3, n)
            valid[b, :n] = True
        keep, order = batched_nms_padded(boxes, scores, classes, valid, 0.5, True)
        for b, n in enumerate(ns):
            got = np.asarray(order[b])[np.nonzero(np.asarray(keep[b]))[0]]
            want = greedy_nms_np(
                boxes[b, :n], scores[b, :n], classes[b, :n].astype(np.float64), 0.5
            )
            np.testing.assert_array_equal(np.sort(got), np.sort(want))


class TestGrid:
    @pytest.mark.parametrize("rows,cols", [(2, 2), (3, 3), (4, 4), (1, 1)])
    def test_cell_layout_matches_reference_math(self, rows, cols):
        """Re-derive the reference's float math (1_doclayout_bboxes.py:388-421)."""
        width, height, overlap = 7934, 5755, 20.0
        cells = grid_cells(width, height, rows, cols, overlap)
        assert len(cells) == rows * cols
        base_w, base_h = width / cols, height / rows
        ox, oy = base_w * 0.2, base_h * 0.2
        for cell in cells:
            r, c = cell.row - 1, cell.col - 1
            want_x0 = max(0, c * base_w - (ox if c > 0 else 0))
            want_y0 = max(0, r * base_h - (oy if r > 0 else 0))
            want_x1 = min(width, (c + 1) * base_w + (ox if c < cols - 1 else 0))
            want_y1 = min(height, (r + 1) * base_h + (oy if r < rows - 1 else 0))
            assert cell.x_start == want_x0 and cell.y_start == want_y0
            assert cell.x_end == want_x1 and cell.y_end == want_y1

    def test_translate_roundtrip(self):
        cells = grid_cells(1000, 800, 3, 3, 20.0)
        cell = cells[4]  # center cell has both offsets
        local = [[10.5, 20.25, 30.75, 40.125]]
        page = translate_boxes(local, cell)
        assert page[0][0] == 10.5 + cell.x_start
        assert page[0][1] == 20.25 + cell.y_start
        assert page[0][2] == 30.75 + cell.x_start
        assert page[0][3] == 40.125 + cell.y_start


class TestEdgeFilter:
    def ref_predicate(self, box, cell, W, H, t=10):
        """2_edge_box_filter.py:44-90 contract."""
        x_min, y_min, x_max, y_max = box
        cx0, cy0, cx1, cy1 = cell
        if abs(cx1 - W) > t and x_max >= cx1 - t:
            return True
        if abs(cy1 - H) > t and y_max >= cy1 - t:
            return True
        if cx0 > t and x_min <= cx0 + t:
            return True
        if cy0 > t and y_min <= cy0 + t:
            return True
        return False

    def test_matches_reference_predicate(self):
        rng = np.random.default_rng(3)
        W, H = 2000, 1600
        for cell in [(0, 0, 1100, 900), (900, 0, 2000, 900), (900, 700, 2000, 1600)]:
            boxes = random_boxes(rng, 200, W, H)
            got = internal_edge_mask_np(boxes, cell, W, H, 10)
            want = np.array([self.ref_predicate(b, cell, W, H) for b in boxes])
            np.testing.assert_array_equal(got, want)

    def test_boundary_inclusive(self):
        # box exactly at threshold distance must be removed (>= / <=)
        W, H, t = 1000, 1000, 10
        cell = (0, 0, 500, 500)  # right & bottom internal
        box_at = np.array([[100, 100, 490, 200]])  # x_max == cx1 - t
        box_in = np.array([[100, 100, 489.999, 200]])
        assert internal_edge_mask_np(box_at, cell, W, H, t)[0]
        assert not internal_edge_mask_np(box_in, cell, W, H, t)[0]

    def test_jax_matches_numpy(self):
        rng = np.random.default_rng(4)
        W, H = 2000, 1600
        cell = (900, 700, 2000, 1600)
        boxes = random_boxes(rng, 100, W, H).astype(np.float32)
        got = np.asarray(
            internal_edge_mask(
                boxes,
                np.array(cell, np.float32),
                np.array([W, H], np.float32),
                threshold=10.0,
            )
        )
        want = internal_edge_mask_np(boxes, cell, W, H, 10)
        np.testing.assert_array_equal(got, want)


class TestWidths:
    def test_bin_widths_first_fit(self):
        # page 1000, margin 0.2% → 2.0 px
        bins = bin_widths([100.0, 101.5, 104.0, 300.0], 0.2, 1000)
        # 100 seeds a bin; 101.5 joins (|Δ|=1.5 ≤ 2); 104 is 4 away → new bin;
        # 300 new bin.
        assert bins == {100.0: 2, 104.0: 1, 300.0: 1}

    def test_bin_scan_order_is_sorted_keys(self):
        # A width within margin of two bins joins the *smallest* key
        # (reference scans sorted(bins)).
        bins = bin_widths([105.0, 101.0, 103.0], 0.2, 1000)
        # 105 seeds; 101 is 4 away → new bin; 103 is within 2 of both 101 and
        # 105 → joins 101 (sorted scan).
        assert bins == {105.0: 1, 101.0: 2}

    def test_median(self):
        assert median_from_bins({100.0: 2, 104.0: 1, 300.0: 1}) == 102.0
        assert median_from_bins({}) == 0

    def test_plain_text_widths(self):
        boxes = [[0, 0, 50, 10], [0, 0, 70, 10], [0, 0, 90, 10]]
        names = ["plain_text", "title", "plain_text"]
        assert plain_text_widths(boxes, names) == [50, 90]
