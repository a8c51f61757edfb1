"""Analysis-layer tests: processors, cross/region compare, demo queries,
reports, and the integrated workflow CLI end-to-end (tiny models)."""

import glob
import json
import os

import numpy as np
import pytest
from PIL import Image

from multimodal_embeddings_tpu.analysis.cross_compare import (
    create_cross_comparison,
    prefix_length,
)
from multimodal_embeddings_tpu.analysis.demo_queries import run_demo_queries
from multimodal_embeddings_tpu.analysis.region_compare import (
    create_region_cross_comparison,
)
from multimodal_embeddings_tpu.analysis.reports import create_cluster_report
from multimodal_embeddings_tpu.analysis.clustering import (
    cluster_pages,
    compute_similarity_matrix,
    group_regions_by_page,
)
from multimodal_embeddings_tpu.config import DetectorConfig, EmbedderConfig
from multimodal_embeddings_tpu.models.detector import LayoutDetector
from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
from multimodal_embeddings_tpu.models.vision_encoder import DualEncoderConfig
from multimodal_embeddings_tpu.pipeline.regions import (
    ImageProcessor,
    RegionProcessor,
    crop_box_with_padding,
    region_metadata,
)
from multimodal_embeddings_tpu.store.embedding_store import initialize_db


@pytest.fixture(scope="module")
def tiny_embedder():
    return MultimodalEmbedder(
        EmbedderConfig(family="siglip", dtype="float32", batch_size=4),
        model_config=DualEncoderConfig.tiny(),
    )


@pytest.fixture(scope="module")
def tiny_detector():
    return LayoutDetector(
        DetectorConfig(image_size=128, variant="n", grid_configs=()),
        dtype=None or __import__("jax.numpy", fromlist=["float32"]).float32,
    )


def make_test_image(path, seed=0, size=(200, 160)):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (size[1], size[0], 3)).astype(np.uint8)
    Image.fromarray(arr).save(path)
    return path


class TestRegionMetadata:
    def test_schema(self):
        meta = region_metadata(
            "/abs/img.png", 3, [10.0, 20.0, 110.0, 70.0], 1.0, "plain_text", 0.9, 1000, 800
        )
        assert meta["is_region"] is True
        assert meta["region_index"] == 3
        assert meta["box"] == "10.0,20.0,110.0,70.0"
        assert meta["box_normalized"] == "0.01,0.025,0.11,0.0875"
        np.testing.assert_allclose(meta["area_percentage"], 100 * 50 / (1000 * 800) * 100)
        assert meta["width"] == 100.0 and meta["height"] == 50.0

    def test_crop_with_padding(self):
        img = np.arange(100 * 80 * 3).reshape(80, 100, 3).astype(np.uint8)
        crop = crop_box_with_padding(img, [10, 10, 30, 30], padding=5)
        assert crop.shape == (30, 30, 3)
        crop = crop_box_with_padding(img, [0, 0, 10, 10], padding=5)
        assert crop.shape == (15, 15, 3)  # clipped at origin


class TestProcessors:
    def test_image_processor_dedup(self, tiny_embedder, tmp_path):
        _, col = initialize_db(str(tmp_path / "db"))
        img = make_test_image(str(tmp_path / "page.png"))
        proc = ImageProcessor(tiny_embedder, col)
        assert proc.process_image(img)
        assert col.count() == 1
        # second call is a no-op (DB dedup)
        assert proc.process_image(img)
        assert col.count() == 1
        meta = col.get(ids=["page.png"])["metadatas"][0]
        assert meta["is_region"] is False and meta["image_name"] == "page.png"

    def test_batch_image_processing(self, tiny_embedder, tmp_path):
        _, col = initialize_db(str(tmp_path / "db2"))
        paths = [
            make_test_image(str(tmp_path / f"p{i}.png"), seed=i) for i in range(5)
        ]
        proc = ImageProcessor(tiny_embedder, col)
        done = proc.process_images(paths, batch_size=2)
        assert done == 5 and col.count() == 5

    def test_region_processor(self, tiny_embedder, tmp_path, monkeypatch):
        _, col = initialize_db(str(tmp_path / "db3"))
        img = make_test_image(str(tmp_path / "page.png"), size=(300, 240))

        class FakeDetector:
            def detect_regions(self, path):
                return {
                    "image_path": path,
                    "image_size": {"width": 300, "height": 240},
                    "parameters": {},
                    "boxes": [[10, 10, 150, 100], [160, 20, 290, 220], [0, 0, 20, 20]],
                    "classes": [1.0, 3.0, 2.0],
                    "scores": [0.9, 0.8, 0.7],
                    "class_names": ["plain_text", "figure", "abandon"],
                }

        proc = RegionProcessor(
            FakeDetector(),
            tiny_embedder,
            col,
            output_folder=str(tmp_path / "out"),
            region_batch_size=2,
        )
        stored = proc.process_image_regions(img)
        # 'abandon' is not in REGION_TYPES_TO_PROCESS → 2 regions
        assert stored == 2 and col.count() == 2
        got = col.get(where={"is_region": {"$eq": True}})
        types = {m["region_type"] for m in got["metadatas"]}
        assert types == {"plain_text", "figure"}
        crops = glob.glob(str(tmp_path / "out" / "region_images" / "*.png"))
        assert len(crops) == 2


def populate_store(col, tmp_path, tiny_embedder, n_pages=4, regions_per_page=3):
    rng = np.random.default_rng(0)
    for p in range(n_pages):
        path = make_test_image(str(tmp_path / f"news_{p}.png"), seed=p)
        col.upsert(
            ids=[f"news_{p}.png"],
            embeddings=[tiny_embedder.get_image_embeddings([path])[0]],
            metadatas=[
                {"image_name": f"news_{p}.png", "image_path": path, "is_region": False}
            ],
        )
        for r in range(regions_per_page):
            e = rng.normal(size=64).astype(np.float32)
            col.upsert(
                ids=[f"region_news_{p}_{r}"],
                embeddings=[e / np.linalg.norm(e)],
                metadatas=[
                    {
                        "parent_image": path,
                        "parent_image_name": f"news_{p}.png",
                        "region_index": r,
                        "region_type": "plain_text",
                        "region_score": 0.9,
                        "box": "10.0,10.0,60.0,40.0",
                        "area_percentage": 5.0,
                        "is_region": True,
                    }
                ],
            )


class TestReports:
    def test_cross_compare_html(self, tiny_embedder, tmp_path):
        _, col = initialize_db(str(tmp_path / "db"))
        populate_store(col, tmp_path, tiny_embedder)
        out = str(tmp_path / "cross")
        written = create_cross_comparison(col, out, top_n=3)
        assert written == 4
        assert os.path.exists(os.path.join(out, "index.html"))
        pages = glob.glob(os.path.join(out, "*_comparison.html"))
        assert len(pages) == 4
        content = open(pages[0]).read()
        assert "Similar Images (with different prefixes):" in content

    def test_prefix_skip_excludes_same_publication(self, tiny_embedder, tmp_path):
        _, col = initialize_db(str(tmp_path / "db4"))
        populate_store(col, tmp_path, tiny_embedder)
        out = str(tmp_path / "cross2")
        create_cross_comparison(col, out, top_n=3)
        # all pages share the 'n' prefix (20% of 'news_X.png' = 2 chars 'ne')
        # → every neighbor filtered, pages have no cards
        page = glob.glob(os.path.join(out, "*_comparison.html"))[0]
        assert page  # pages still written (with empty grids)

    def test_region_compare_html(self, tiny_embedder, tmp_path):
        _, col = initialize_db(str(tmp_path / "db5"))
        populate_store(col, tmp_path, tiny_embedder)
        out = str(tmp_path / "regions")
        create_region_cross_comparison(
            col,
            out,
            top_n=3,
            similarity_threshold=0.0,
            distance_as_similarity=False,
            make_composites=False,
        )
        assert os.path.exists(os.path.join(out, "index.html"))

    def test_demo_queries(self, tiny_embedder, tmp_path):
        _, col = initialize_db(str(tmp_path / "db6"))
        populate_store(col, tmp_path, tiny_embedder)
        probe = make_test_image(str(tmp_path / "probe.png"), seed=99)
        out = str(tmp_path / "testout")
        results_path = run_demo_queries(
            tiny_embedder, col, test_image=probe, output_folder=out, top_n=5
        )
        content = open(results_path).read()
        assert "img_query_pages" in content and "txt_query_pages" in content
        copies = glob.glob(os.path.join(out, "img_query_pages_*"))
        assert copies

    def test_cluster_report(self, tiny_embedder, tmp_path):
        _, col = initialize_db(str(tmp_path / "db7"))
        populate_store(col, tmp_path, tiny_embedder, n_pages=5)
        pages = group_regions_by_page(col)
        sim = compute_similarity_matrix(pages)
        result = cluster_pages(sim, [p.name for p in pages])
        out = str(tmp_path / "cluster")
        report = create_cluster_report(sim, result, out)
        assert os.path.exists(report)
        assert os.path.exists(os.path.join(out, "similarity_matrix.npy"))
        data = json.load(open(os.path.join(out, "clustering_results.json")))
        assert data["n_clusters"] == result.n_clusters
        assert os.path.exists(os.path.join(out, "similarity_heatmap.png"))
        assert os.path.exists(os.path.join(out, "dendrogram.png"))


class TestPrefixLength:
    def test_matches_reference_formula(self):
        assert prefix_length("abcdefghij") == 2  # int(10*0.2)
        assert prefix_length("ab") == 1  # max(1, 0)


class TestReferenceDOM:
    """The HTML reports mirror the reference writers' DOM structure and
    inline CSS (cross_compare.py:131-256, :48-74;
    weighted_region_clustering.py:576-797) for trivial visual diffing."""

    def _classes(self, html_text):
        from html.parser import HTMLParser

        found = []

        class P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                d = dict(attrs)
                if "class" in d:
                    found.append((tag, d["class"]))
                if tag == "td" and "style" in d:
                    found.append((tag, d["style"]))

        P().feed(html_text)
        return found

    def test_cross_compare_page_structure(self, tiny_embedder, tmp_path):
        from multimodal_embeddings_tpu.analysis.cross_compare import (
            create_cross_comparison,
        )

        _, collection = initialize_db(str(tmp_path / "db_dom"))
        populate_store(collection, tmp_path, tiny_embedder)
        out = str(tmp_path / "cc")
        create_cross_comparison(collection, out, top_n=3)
        import glob

        page = open(glob.glob(os.path.join(out, "*_comparison.html"))[0]).read()
        classes = self._classes(page)
        for cls in ("source-info", "source-image", "similar-images", "back"):
            assert any(c == cls for _, c in classes), (cls, classes)
        assert "Cross-Comparison Results" in page
        assert "Similar Images (with different prefixes):" in page
        # every neighbor here shares the source prefix (populate_store names
        # all pages news_X) so the grid is empty; check the card DOM directly
        from multimodal_embeddings_tpu.analysis import html as H

        card = H.ref_image_card(1, "img.png", "other.png", "ot", "0.1234")
        for piece in (
            'class="image-card"',
            'class="image-container"',
            "<strong>1.</strong>",
            "class=\"prefix\">'ot'",
            'class="score">0.1234',
        ):
            assert piece in card, (piece, card)
        index = open(os.path.join(out, "index.html")).read()
        assert "Image Cross-Comparison Index" in index
        assert "similar images</li>" in index

    def test_cluster_report_structure(self, tmp_path):
        from multimodal_embeddings_tpu.analysis.clustering import cluster_pages
        from multimodal_embeddings_tpu.analysis.reports import (
            create_cluster_report,
        )

        rng = np.random.default_rng(0)
        n = 6
        sim = rng.uniform(0.1, 0.9, (n, n))
        sim = (sim + sim.T) / 2
        np.fill_diagonal(sim, 1.0)
        names = [f"paper_with_a_rather_long_name_{i}" for i in range(n)]
        result = cluster_pages(sim, names)
        out = str(tmp_path / "rep")
        path = create_cluster_report(sim, result, out)
        page = open(path).read()
        classes = self._classes(page)
        for cls in ("section", "stats", "cluster", "cluster-title",
                    "cluster-cohesion", "visualization"):
            assert any(c == cls for _, c in classes), cls
        assert "Newspaper Image Clustering Results" in page
        assert "Similarity Statistics" in page
        assert "Top Similarities" in page
        # rgba-shaded matrix cells + reference name truncation
        assert "rgba(0, 100, 255," in page
        assert "background-color: #e6e6e6" in page
        assert "paper_with_a_ra..." in page

    def test_region_compare_page_structure(self, tiny_embedder, tmp_path):
        from multimodal_embeddings_tpu.analysis.region_compare import (
            create_region_cross_comparison,
        )

        _, col = initialize_db(str(tmp_path / "db_dom2"))
        populate_store(col, tmp_path, tiny_embedder)
        out = str(tmp_path / "rc")
        create_region_cross_comparison(col, out, top_n=3, make_composites=False)
        import glob

        pages = glob.glob(os.path.join(out, "*_comparison.html"))
        assert pages
        page = open(pages[0]).read()
        classes = self._classes(page)
        for cls in ("source-info", "source-region", "similar-regions", "back"):
            assert any(c == cls for _, c in classes), (cls,)
        assert "Region Cross-Comparison Results" in page
        assert 'class="region-card"' in page
        assert "region-type plain_text" in page
        index = open(os.path.join(out, "index.html")).read()
        assert "Region Cross-Comparison Index" in index
        assert "similar regions</li>" in index
