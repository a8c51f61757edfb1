"""Native C++ host kernels: bit-equality against the NumPy host paths."""

import numpy as np
import pytest

from multimodal_embeddings_tpu.ops.edge_filter import internal_edge_mask_np
from multimodal_embeddings_tpu.ops.iou import iou_matrix_np
from multimodal_embeddings_tpu.ops.nms import greedy_nms_np
from multimodal_embeddings_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def random_boxes(rng, n, w=1000, h=800):
    x1 = rng.uniform(0, w * 0.9, n)
    y1 = rng.uniform(0, h * 0.9, n)
    bw = rng.uniform(5, w * 0.4, n)
    bh = rng.uniform(5, h * 0.4, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], axis=1)


class TestNativeParity:
    def test_iou_bitwise(self, lib):
        rng = np.random.default_rng(0)
        boxes = random_boxes(rng, 60)
        got = native.iou_matrix_native(boxes)
        want = iou_matrix_np(boxes)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_nms_class_aware_bitwise(self, lib, seed):
        rng = np.random.default_rng(seed)
        n = 150
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0.1, 1.0, n)
        classes = rng.integers(0, 4, n).astype(np.float64)
        got = native.greedy_nms_native(boxes, scores, classes, 0.5)
        want = greedy_nms_np(boxes, scores, classes, 0.5)
        np.testing.assert_array_equal(got, want)

    def test_nms_class_agnostic(self, lib):
        rng = np.random.default_rng(3)
        boxes = random_boxes(rng, 80)
        scores = rng.uniform(0.1, 1.0, 80)
        got = native.greedy_nms_native(boxes, scores, None, 0.45)
        want = greedy_nms_np(boxes, scores, None, 0.45)
        np.testing.assert_array_equal(got, want)

    def test_nms_on_golden(self, lib, golden_combined_dir):
        import glob
        import json
        import os

        path = sorted(glob.glob(os.path.join(golden_combined_dir, "*_combined.json")))[0]
        data = json.load(open(path))
        got = native.greedy_nms_native(
            np.asarray(data["boxes"]),
            np.asarray(data["scores"]),
            np.asarray(data["classes"], np.float64),
            0.5,
        )
        np.testing.assert_array_equal(got, np.arange(len(data["boxes"])))

    def test_edge_mask_bitwise(self, lib):
        rng = np.random.default_rng(4)
        boxes = random_boxes(rng, 200, 2000, 1600)
        cell = (900.0, 700.0, 2000.0, 1600.0)
        got = native.internal_edge_mask_native(boxes, cell, 2000, 1600, 10)
        want = internal_edge_mask_np(boxes, cell, 2000, 1600, 10)
        np.testing.assert_array_equal(got, want)

    def test_cosine_topk_matches_numpy(self, lib):
        rng = np.random.default_rng(5)
        corpus = rng.normal(size=(300, 32)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        q = corpus[17]
        idx, sims = native.cosine_topk_native(corpus, q, 10)
        want = np.argsort(-(corpus @ q), kind="stable")[:10]
        np.testing.assert_array_equal(idx, want)
        assert idx[0] == 17

    def test_cosine_topk_masked(self, lib):
        rng = np.random.default_rng(6)
        corpus = rng.normal(size=(100, 16)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        mask = (np.arange(100) % 3 == 0).astype(np.uint8)
        idx, _ = native.cosine_topk_native(corpus, corpus[0], 50, mask=mask)
        assert all(i % 3 == 0 for i in idx)


class TestHnswIndex:
    """Native HNSW graph index (native/hnsw.cpp) — the in-repo hnswlib
    equivalent (``deprecated_package/db_operations.py:28-33``)."""

    def _corpus(self, n=500, d=32, seed=0):
        rng = np.random.default_rng(seed)
        c = rng.normal(size=(n, d)).astype(np.float32)
        return c / np.linalg.norm(c, axis=1, keepdims=True)

    def test_exact_hit_and_self_retrieval(self, lib):
        corpus = self._corpus()
        ix = native.HnswIndex(32)
        ix.add(corpus)
        assert len(ix) == 500
        idx, dist = ix.search(corpus[42], k=1, ef=50)
        assert idx[0, 0] == 42
        assert dist[0, 0] < 1e-6

    def test_recall_vs_brute_force(self, lib):
        """≥95% recall@10 at the reference's parameters (M=32, ef=200) on
        a 1k corpus — the regime hnswlib is near-exact in."""
        corpus = self._corpus(n=1000, d=32, seed=1)
        rng = np.random.default_rng(2)
        queries = rng.normal(size=(20, 32)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        ix = native.HnswIndex(32, m=32, ef_construction=200)
        ix.add(corpus)
        idx, dist = ix.search(queries, k=10, ef=200)
        hits = total = 0
        for qi in range(20):
            want = set(np.argsort(-(corpus @ queries[qi]))[:10].tolist())
            hits += len(want & set(idx[qi].tolist()))
            total += 10
        assert hits / total >= 0.95, hits / total
        # distances are cosine distances, ascending per row
        assert (np.diff(dist, axis=1) >= -1e-6).all()
        np.testing.assert_allclose(
            dist[0, 0], 1.0 - float(corpus[idx[0, 0]] @ queries[0]),
            atol=1e-5,
        )

    def test_deterministic_build(self, lib):
        corpus = self._corpus(n=300, seed=3)
        q = self._corpus(n=5, seed=4)
        r = []
        for _ in range(2):
            ix = native.HnswIndex(32, seed=7)
            ix.add(corpus)
            r.append(ix.search(q, k=8, ef=100))
        np.testing.assert_array_equal(r[0][0], r[1][0])
        np.testing.assert_array_equal(r[0][1], r[1][1])

    def test_masked_search_and_padding(self, lib):
        corpus = self._corpus(n=200, seed=5)
        ix = native.HnswIndex(32)
        ix.add(corpus)
        mask = (np.arange(200) % 50 == 0).astype(np.uint8)  # 4 valid
        idx, dist = ix.search(corpus[0], k=10, ef=200, mask=mask)
        valid = idx[0][idx[0] >= 0]
        assert all(int(i) % 50 == 0 for i in valid)
        assert 0 in valid.tolist()
        # fewer matches than k → (-1, inf) tail padding
        assert (idx[0][len(valid):] == -1).all()
        assert np.isinf(dist[0][len(valid):]).all()

    def test_incremental_add(self, lib):
        corpus = self._corpus(n=400, seed=6)
        ix = native.HnswIndex(32)
        ix.add(corpus[:250])
        ix.add(corpus[250:])
        idx, _ = ix.search(corpus[399], k=1, ef=50)
        assert idx[0, 0] == 399

    def test_unnormalized_inputs_are_normalized(self, lib):
        corpus = self._corpus(n=100, seed=8)
        ix = native.HnswIndex(32)
        ix.add(corpus * 7.5)  # scaled rows — index normalizes
        idx, dist = ix.search(corpus[3] * 0.1, k=1, ef=50)
        assert idx[0, 0] == 3
        assert dist[0, 0] < 1e-5
