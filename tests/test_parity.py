"""Parity harness tests: matching semantics + self-parity on real goldens."""

import glob
import json
import os

import numpy as np
import pytest

from multimodal_embeddings_tpu.analysis.parity import (
    compare_detection_dirs,
    compare_embedding_stores,
    match_boxes,
)
from multimodal_embeddings_tpu.store.embedding_store import initialize_db


class TestMatchBoxes:
    def test_identical_sets(self):
        boxes = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float64)
        parity = match_boxes(boxes, boxes)
        assert parity.n_matched == 2
        assert parity.mean_matched_iou == 1.0
        assert parity.precision == parity.recall == 1.0

    def test_shifted_boxes(self):
        ref = np.array([[0, 0, 10, 10]], np.float64)
        cand = np.array([[1, 0, 11, 10]], np.float64)  # IoU = 9/11
        parity = match_boxes(ref, cand, iou_floor=0.5)
        assert parity.n_matched == 1
        np.testing.assert_allclose(parity.mean_matched_iou, 9 / 11)

    def test_one_to_one_assignment(self):
        # two candidates overlap one reference: only one match allowed
        ref = np.array([[0, 0, 10, 10]], np.float64)
        cand = np.array([[0, 0, 10, 10], [0.5, 0, 10.5, 10]], np.float64)
        parity = match_boxes(ref, cand)
        assert parity.n_matched == 1
        assert parity.precision == 0.5 and parity.recall == 1.0

    def test_class_aware_blocks_cross_class(self):
        ref = np.array([[0, 0, 10, 10]], np.float64)
        cand = ref.copy()
        parity = match_boxes(
            ref, cand, classes_ref=np.array([1.0]), classes_cand=np.array([2.0])
        )
        assert parity.n_matched == 0

    def test_empty_sets(self):
        parity = match_boxes(np.zeros((0, 4)), np.zeros((0, 4)))
        assert parity.precision == 1.0 and parity.recall == 1.0


class TestDirComparison:
    def test_self_parity_on_goldens(self, golden_combined_dir):
        """The goldens compared against themselves must score perfect parity
        — the acceptance gate's sanity fixed point."""
        summary = compare_detection_dirs(golden_combined_dir, golden_combined_dir)
        assert summary["pages"] >= 15
        assert summary["mean_matched_iou"] == 1.0
        assert summary["recall"] == 1.0 and summary["precision"] == 1.0
        assert not summary["missing_candidates"]

    def test_perturbed_candidates_detected(self, golden_combined_dir, tmp_path):
        """Slightly perturbed boxes must yield IoU just below 1 and be
        measured, not hidden."""
        cand_dir = tmp_path / "cand"
        cand_dir.mkdir()
        paths = sorted(glob.glob(os.path.join(golden_combined_dir, "*.json")))[:3]
        for path in paths:
            data = json.load(open(path))
            data["boxes"] = [
                [b[0] + 1.0, b[1] + 1.0, b[2] + 1.0, b[3] + 1.0]
                for b in data["boxes"]
            ]
            with open(cand_dir / os.path.basename(path), "w") as f:
                json.dump(data, f)
        # restrict reference to the same 3 files
        ref_dir = tmp_path / "ref"
        ref_dir.mkdir()
        for path in paths:
            import shutil

            shutil.copy(path, ref_dir / os.path.basename(path))
        summary = compare_detection_dirs(str(ref_dir), str(cand_dir))
        assert 0.9 < summary["mean_matched_iou"] < 1.0
        assert summary["recall"] > 0.95


class TestEmbeddingParity:
    def test_store_cosines(self, tmp_path):
        _, a = initialize_db(str(tmp_path / "a"))
        _, b = initialize_db(str(tmp_path / "b"))
        rng = np.random.default_rng(0)
        for i in range(5):
            e = rng.normal(size=16).astype(np.float32)
            e /= np.linalg.norm(e)
            a.upsert(ids=[f"x{i}"], embeddings=[e])
            noise = e + rng.normal(scale=1e-3, size=16).astype(np.float32)
            b.upsert(ids=[f"x{i}"], embeddings=[noise / np.linalg.norm(noise)])
        b.upsert(ids=["extra"], embeddings=[np.ones(16, np.float32) / 4])
        summary = compare_embedding_stores(a, b)
        assert summary["count"] == 5
        assert summary["mean_cosine"] > 0.999
        assert not summary["missing"]

    def test_missing_ids_reported(self, tmp_path):
        _, a = initialize_db(str(tmp_path / "a2"))
        _, b = initialize_db(str(tmp_path / "b2"))
        a.upsert(ids=["only_in_a"], embeddings=[[1.0, 0.0]])
        summary = compare_embedding_stores(a, b)
        assert summary["missing"] == ["only_in_a"]
        assert summary["count"] == 0


class TestParityAggregation:
    def test_missing_pages_count_against_recall(self, golden_combined_dir, tmp_path):
        """An empty candidate directory must read as total failure, not as a
        vacuous pass."""
        empty = tmp_path / "empty"
        empty.mkdir()
        summary = compare_detection_dirs(golden_combined_dir, str(empty))
        assert summary["recall"] == 0.0
        assert len(summary["missing_candidates"]) >= 15
        assert summary["total_reference_boxes"] > 0

    def test_extra_candidate_pages_hit_precision(self, tmp_path):
        ref_dir = tmp_path / "ref"
        cand_dir = tmp_path / "cand"
        ref_dir.mkdir(); cand_dir.mkdir()
        page = {"boxes": [[0, 0, 10, 10]], "classes": [1.0]}
        (ref_dir / "a.json").write_text(json.dumps(page))
        (cand_dir / "a.json").write_text(json.dumps(page))
        (cand_dir / "hallucinated.json").write_text(json.dumps(page))
        summary = compare_detection_dirs(str(ref_dir), str(cand_dir))
        assert summary["extra_candidates"] == ["hallucinated.json"]
        assert summary["precision"] == 0.5 and summary["recall"] == 1.0

    def test_iou_floor_zero_never_matches_disjoint(self):
        ref = np.array([[0, 0, 10, 10]], np.float64)
        cand = np.array([[100, 100, 110, 110]], np.float64)
        parity = match_boxes(ref, cand, iou_floor=0.0)
        assert parity.n_matched == 0


class TestStoreEmptyPersist:
    def test_delete_all_rows_does_not_resurrect(self, tmp_path):
        _, col = initialize_db(str(tmp_path / "dbe"))
        col.upsert(ids=["a"], embeddings=[[1.0, 0.0]])
        col.delete(["a"])
        assert col.count() == 0
        _, col2 = initialize_db(str(tmp_path / "dbe"))
        assert col2.count() == 0
