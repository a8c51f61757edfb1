"""End-to-end numbered-pipeline CLI test (SURVEY §4 test-pyramid item 4).

Drives the full reference chain — orientation → detect(+grid) →
edge-filter → combine → medians → columns — from a synthetic image folder
through ``numbered_pipeline_stages`` + ``PipelineRunner`` (what
``cli/pipeline.py`` runs), with a tiny deterministic detector, and locks:

- the reference artifact tree (``run.sh:60-70`` folder names, per-stage
  JSON schemas from ``1_doclayout_bboxes.py:227-235``,
  ``3_combine_grids.py:282-291``, ``4_extract_median_widths.py:273-285``,
  ``5_detect_column_centers.py:425-439``);
- cached-rerun behavior: a second run skips every stage and leaves every
  artifact byte-identical;
- invalidation: touching a threshold re-runs exactly the affected suffix.
"""

import glob
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from multimodal_embeddings_tpu.cli.detect import parse_grid_configs
from multimodal_embeddings_tpu.config import DetectorConfig
from multimodal_embeddings_tpu.models.detector import LayoutDetector
from multimodal_embeddings_tpu.pipeline.runner import (
    PipelineRunner,
    numbered_pipeline_stages,
)


def make_page(path, seed, size=(160, 192)):
    """Text-like synthetic page: light background with dark line blocks so
    orientation/edge stages see real structure."""
    rng = np.random.default_rng(seed)
    w, h = size
    arr = np.full((h, w, 3), 245, np.uint8)
    for r in range(6):
        y = 10 + r * 28
        arr[y : y + 12, 12 : w - 12] = rng.integers(
            0, 80, (12, w - 24, 3), dtype=np.uint8
        )
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def tiny_detector():
    return LayoutDetector(
        DetectorConfig(
            image_size=128,
            variant="n",
            grid_configs=parse_grid_configs("2x2"),
            max_detections=16,
        ),
        dtype=jnp.float32,
    )


def _json_tree(root="."):
    """{relpath: bytes} of every pipeline JSON artifact."""
    out = {}
    for folder in (
        "1_doclayout_parsed",
        "2_edge_box_filtered",
        "3_combined_bboxes",
        "4_medians_extracted",
        "5_column_detection",
    ):
        for path in glob.glob(os.path.join(root, folder, "**", "*.json"),
                              recursive=True):
            with open(path, "rb") as f:
                out[os.path.relpath(path, root)] = f.read()
    return out


def _build_stages(tiny_detector, **overrides):
    kwargs = dict(
        detector_factory=lambda: tiny_detector,
        imgsz=128,
        variant="n",
        grid_configs="2x2",
    )
    kwargs.update(overrides)
    return numbered_pipeline_stages("newspaper_images", **kwargs)


class TestNumberedPipelineE2E:
    @pytest.fixture(autouse=True)
    def _workdir(self, tmp_path_factory, monkeypatch):
        # one shared tree for the ordered tests below
        root = tmp_path_factory.getbasetemp() / "e2e_cli"
        root.mkdir(exist_ok=True)
        monkeypatch.chdir(root)
        if not os.path.isdir("newspaper_images"):
            os.makedirs("newspaper_images")
            for i in range(2):
                make_page(f"newspaper_images/page_{i}.png", seed=i)

    def test_full_chain_artifact_tree(self, tiny_detector):
        results = PipelineRunner().run(_build_stages(tiny_detector))
        assert all(v == "ran" for v in results.values()), results

        # stage 0: every input page comes out (rotated or copied unchanged)
        assert sorted(os.listdir("0_oriented_images")) == [
            "page_0.png",
            "page_1.png",
        ]

        # stage 1: per-page base JSON + one grid-info JSON for the 2x2 grid
        for i in range(2):
            base = json.load(open(f"1_doclayout_parsed/json/page_{i}.json"))
            for key in (
                "image_path",
                "image_size",
                "parameters",
                "boxes",
                "classes",
                "scores",
                "class_names",
            ):
                assert key in base, key
            assert set(base["image_size"]) == {"width", "height"}
            grid = json.load(
                open(f"1_doclayout_parsed/json/page_{i}_grid_2x2.json")
            )
            assert list(grid) == [
                "original_image_path",
                "grid_config",
                "cells",
            ]  # stage-1 writer order (1_doclayout_bboxes.py:552-647)
            assert len(grid["cells"]) == 4
            for cell in grid["cells"]:
                assert "boxes_original" in cell["regions"]
            # stage-2 re-emits the grid info with its cells-before-
            # grid_config key-order quirk (2_edge_box_filter.py writer)
            filt = json.load(
                open(f"2_edge_box_filtered/json/page_{i}_grid_2x2.json")
            )
            assert list(filt)[:3] == [
                "original_image_path",
                "cells",
                "grid_config",
            ]

        # stages 2-5 artifact files per page
        assert len(glob.glob("2_edge_box_filtered/json/*.json")) >= 2
        combined = sorted(glob.glob("3_combined_bboxes/json/*_combined.json"))
        assert len(combined) == 2
        doc = json.load(open(combined[0]))
        assert "source_jsons" in doc and len(doc["source_jsons"]) == 2
        assert len(doc["boxes"]) == len(doc["classes"]) == len(doc["scores"])

        medians = sorted(
            glob.glob("4_medians_extracted/json/*_median_width.json")
        ) or sorted(glob.glob("4_medians_extracted/*_median_width.json"))
        assert len(medians) == 2
        med = json.load(open(medians[0]))
        for key in ("image_path", "median_width", "page_width", "page_height"):
            assert key in med, key

        # stage 5 only emits pages whose median width is positive (the
        # reference gate: no plain_text widths → no column analysis);
        # random-weight detections need not produce plain_text, so assert
        # the gate semantics rather than a fixed count.
        assert os.path.isdir("5_column_detection/json")
        columns = sorted(glob.glob("5_column_detection/json/*_columns.json"))
        emitted_pages = {
            os.path.basename(p).replace("_combined_columns.json", "")
            for p in columns
        }
        positive_median_pages = {
            os.path.basename(p).replace("_combined_median_width.json", "")
            for p in medians
            if json.load(open(p))["median_width"] > 0
        }
        assert emitted_pages == positive_median_pages
        for path in columns:
            col = json.load(open(path))
            for key in (
                "image_path",
                "page_width",
                "page_height",
                "median_width",
                "column_centers",
                "column_widths",
                "num_columns",
            ):
                assert key in col, key
            assert col["num_columns"] == len(col["column_centers"])

    def test_cached_rerun_skips_everything_bytes_stable(self, tiny_detector):
        before = _json_tree()
        assert before, "artifact tree missing — ordering broke"
        results = PipelineRunner().run(_build_stages(tiny_detector))
        assert all(v == "skipped" for v in results.values()), results
        assert _json_tree() == before

    def test_detect_stage_prefetch_matches_sequential(
        self, tiny_detector, tmp_path, monkeypatch
    ):
        """Stage-1 decode prefetching must leave every artifact
        byte-identical to the in-line decode path (modulo the output
        folder name embedded in cell paths)."""
        monkeypatch.chdir(tmp_path)
        os.makedirs("pages")
        for i in range(2):
            make_page(f"pages/page_{i}.png", seed=i)
        from multimodal_embeddings_tpu.pipeline.detect import run_detect_stage

        a = run_detect_stage("pages", "out_pref", detector=tiny_detector)
        b = run_detect_stage(
            "pages", "out_seq", detector=tiny_detector, prefetch=False
        )
        assert a.processed == b.processed == 2 and a.errors == b.errors == 0

        def tree(root):
            out = {}
            for path in glob.glob(f"{root}/**/*.json", recursive=True):
                with open(path) as f:
                    out[os.path.relpath(path, root)] = f.read().replace(root, "OUT")
            return out

        ta, tb = tree("out_pref"), tree("out_seq")
        assert ta.keys() == tb.keys() and ta
        for name in ta:
            assert ta[name] == tb[name], name

    def test_config_change_reruns_only_affected_suffix(self, tiny_detector):
        results = PipelineRunner().run(
            _build_stages(tiny_detector, min_confidence=0.4)
        )
        # only the columns stage consumes min_confidence
        assert results["columns"] == "ran"
        for name in ("orientation", "detect", "edge_filter", "combine", "medians"):
            assert results[name] == "skipped", (name, results)
