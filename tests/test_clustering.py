"""Clustering tests: fused similarity vs the reference's query-loop oracle,
linkage/silhouette vs scipy/sklearn."""

import numpy as np
import pytest

from multimodal_embeddings_tpu.analysis.clustering import (
    PageRegions,
    average_linkage,
    cluster_pages,
    compute_similarity_matrix,
    group_regions_by_page,
    labels_from_linkage,
    silhouette_score_precomputed,
)
from multimodal_embeddings_tpu.store.embedding_store import initialize_db


def make_pages(seed=0, n_pages=6, d=16, max_regions=14):
    rng = np.random.default_rng(seed)
    pages = []
    for i in range(n_pages):
        r = int(rng.integers(3, max_regions))
        emb = rng.normal(size=(r, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        areas = rng.uniform(0.5, 20.0, r).astype(np.float32)
        pages.append(PageRegions(f"page{i}", emb, areas))
    return pages


def oracle_similarity(pages, query_limit=10, top_k=10, threshold=0.1, area=True):
    """Faithful transcription of the reference's accumulation semantics
    (weighted_region_clustering.py:163-254): each unordered pair computed
    ONCE — for each of the first query_limit regions of i (i < j), Chroma-
    query the top min(top_k, len(regions_j)) most-similar regions of j,
    accept cosine distance <= 1-threshold, accumulate sim*area_i*area_j,
    then mirror. Matrix normalized by max off-diagonal, diagonal = 1."""
    n = len(pages)
    sim = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            total = 0.0
            qs = pages[i].embeddings[:query_limit]
            qa = pages[i].areas[:query_limit]
            for a in range(len(qs)):
                dists = 1.0 - pages[j].embeddings @ qs[a]
                order = np.argsort(dists)[: min(top_k, len(dists))]
                for b in order:
                    dist = dists[b]
                    if dist <= 1.0 - threshold and pages[j].areas[b] > 0:
                        contrib = 1.0 - dist
                        if area:
                            contrib = contrib * qa[a] * pages[j].areas[b]
                        total += contrib
            sim[i, j] = total
            sim[j, i] = total
    np.fill_diagonal(sim, 0.0)
    off_max = sim.max()
    if off_max > 0:
        sim = sim / off_max
    np.fill_diagonal(sim, 1.0)
    return sim


class TestSimilarityMatrix:
    @pytest.mark.parametrize("area", [True, False])
    def test_matches_query_loop_oracle(self, area):
        pages = make_pages()
        got = compute_similarity_matrix(pages, weight_by_area=area)
        want = oracle_similarity(pages, area=area)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matches_oracle_asymmetric_region_counts(self):
        # Pages with >10 regions on one side and few on the other exercise
        # the one-direction (i→j only) semantics: i→j and j→i totals differ
        # whenever region counts straddle the query limit.
        rng = np.random.default_rng(11)
        counts = [18, 3, 12, 2, 25, 10]
        pages = []
        for i, r in enumerate(counts):
            emb = rng.normal(size=(r, 16)).astype(np.float32)
            emb /= np.linalg.norm(emb, axis=1, keepdims=True)
            areas = rng.uniform(0.005, 0.2, r).astype(np.float32)
            pages.append(PageRegions(f"page{i}", emb, areas))
        got = compute_similarity_matrix(pages)
        want = oracle_similarity(pages)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # sanity: the direction actually matters for this fixture — the
        # j→i direction gives different totals, so averaging both (the old
        # bug) would NOT match the oracle
        reversed_want = oracle_similarity(list(reversed(pages)))[::-1, ::-1]
        assert not np.allclose(want, reversed_want, atol=1e-5)

    def test_prefix_skip(self):
        pages = make_pages(n_pages=4)
        pages[1] = PageRegions("page0_b", pages[1].embeddings, pages[1].areas)
        got = compute_similarity_matrix(pages, prefix_skip=5)
        # page0 and page0_b share 5-char prefix → zeroed before normalize
        names = [p.name for p in pages]
        i, j = names.index("page0"), names.index("page0_b")
        assert got[i, j] == 0.0 and got[j, i] == 0.0
        assert got[i, i] == 1.0

    def test_store_grouping(self, tmp_path):
        _, col = initialize_db(str(tmp_path / "db"))
        rng = np.random.default_rng(0)
        for i in range(6):
            e = rng.normal(size=8).astype(np.float32)
            col.upsert(
                ids=[f"region_{i}"],
                embeddings=[e / np.linalg.norm(e)],
                metadatas=[
                    {
                        "is_region": True,
                        "parent_image_name": f"img{i % 2}",
                        "area_percentage": 5.0,
                        "region_type": "plain_text",
                    }
                ],
            )
        col.upsert(
            ids=["whole"],
            embeddings=[np.ones(8, np.float32) / np.sqrt(8)],
            metadatas=[{"is_region": False}],
        )
        # reference filters to REGION_TYPES_TO_PROCESS and area > 0
        # (weighted_region_clustering.py:128-139)
        col.upsert(
            ids=["region_bad_type", "region_zero_area"],
            embeddings=[np.ones(8, np.float32) / np.sqrt(8)] * 2,
            metadatas=[
                {
                    "is_region": True,
                    "parent_image_name": "img0",
                    "area_percentage": 5.0,
                    "region_type": "abandon",
                },
                {
                    "is_region": True,
                    "parent_image_name": "img0",
                    "area_percentage": 0.0,
                    "region_type": "plain_text",
                },
            ],
        )
        pages = group_regions_by_page(col)
        assert [p.name for p in pages] == ["img0", "img1"]
        assert pages[0].embeddings.shape == (3, 8)
        # areas stored as percentages come out as fractions
        np.testing.assert_allclose(pages[0].areas, 0.05)


class TestLinkage:
    def test_matches_scipy_average_linkage(self):
        scipy_hier = pytest.importorskip("scipy.cluster.hierarchy")
        from scipy.spatial.distance import squareform

        rng = np.random.default_rng(3)
        points = rng.normal(size=(12, 4))
        dist = np.sqrt(((points[:, None] - points[None]) ** 2).sum(-1))
        got = average_linkage(dist)
        want = scipy_hier.linkage(squareform(dist, checks=False), method="average")
        np.testing.assert_allclose(got[:, 2], want[:, 2], atol=1e-10)
        np.testing.assert_array_equal(got[:, 3], want[:, 3])

    def test_labels_match_scipy_fcluster(self):
        scipy_hier = pytest.importorskip("scipy.cluster.hierarchy")
        from scipy.spatial.distance import squareform

        rng = np.random.default_rng(4)
        points = rng.normal(size=(15, 3))
        dist = np.sqrt(((points[:, None] - points[None]) ** 2).sum(-1))
        linkage = average_linkage(dist)
        for k in (2, 3, 5):
            got = labels_from_linkage(linkage, 15, k)
            want = scipy_hier.fcluster(
                scipy_hier.linkage(squareform(dist, checks=False), "average"),
                k,
                criterion="maxclust",
            )
            # same partition up to label renaming
            mapping = {}
            ok = True
            for g, w in zip(got, want):
                if g in mapping:
                    ok &= mapping[g] == w
                else:
                    mapping[g] = w
            assert ok and len(set(got)) == len(set(want)) == k

    def test_silhouette_matches_sklearn(self):
        sk = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(5)
        points = rng.normal(size=(20, 4))
        dist = np.sqrt(((points[:, None] - points[None]) ** 2).sum(-1))
        labels = rng.integers(0, 3, 20)
        if len(np.unique(labels)) < 2:
            labels[0] = (labels[0] + 1) % 3
        got = silhouette_score_precomputed(dist, labels)
        want = sk.silhouette_score(dist, labels, metric="precomputed")
        np.testing.assert_allclose(got, want, atol=1e-10)


class TestClusterPages:
    def test_two_obvious_groups(self):
        rng = np.random.default_rng(6)
        base_a = rng.normal(size=16)
        base_b = rng.normal(size=16)
        pages = []
        for i in range(8):
            base = base_a if i < 4 else base_b
            emb = base[None] + rng.normal(scale=0.05, size=(5, 16))
            emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(np.float32)
            pages.append(PageRegions(f"p{i}", emb, np.full(5, 10.0, np.float32)))
        sim = compute_similarity_matrix(pages)
        result = cluster_pages(sim, [p.name for p in pages])
        assert result.n_clusters == 2
        first = {result.labels[i] for i in range(4)}
        second = {result.labels[i] for i in range(4, 8)}
        assert len(first) == 1 and len(second) == 1 and first != second
        assert all(0 <= c <= 1.0000001 for c in result.cohesion.values())

    def test_fixed_k(self):
        pages = make_pages(n_pages=7)
        sim = compute_similarity_matrix(pages)
        result = cluster_pages(sim, [p.name for p in pages], n_clusters=3)
        assert result.n_clusters == 3
        assert len(set(result.labels.tolist())) == 3
