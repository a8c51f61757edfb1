"""Embedding store tests: CRUD, filters, exact top-k, persistence."""

import numpy as np
import pytest

from multimodal_embeddings_tpu.store.embedding_store import (
    Client,
    get_embedding_from_db,
    initialize_db,
)


def unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


@pytest.fixture()
def collection(tmp_path):
    _, col = initialize_db(str(tmp_path / "db"))
    return col


class TestCRUD:
    def test_upsert_get_count(self, collection):
        collection.upsert(
            ids=["a", "b"],
            embeddings=[unit([1, 0, 0]), unit([0, 1, 0])],
            metadatas=[{"is_region": False}, {"is_region": True}],
        )
        assert collection.count() == 2
        got = collection.get(ids=["a"], include=("embeddings", "metadatas"))
        assert got["ids"] == ["a"]
        np.testing.assert_allclose(got["embeddings"][0], [1, 0, 0])
        assert got["metadatas"][0] == {"is_region": False}

    def test_upsert_overwrites(self, collection):
        collection.upsert(ids=["a"], embeddings=[unit([1, 0, 0])])
        collection.upsert(ids=["a"], embeddings=[unit([0, 0, 1])])
        assert collection.count() == 1
        emb = get_embedding_from_db(collection, "a")
        np.testing.assert_allclose(emb, [0, 0, 1])

    def test_get_missing(self, collection):
        assert get_embedding_from_db(collection, "nope") is None

    def test_delete(self, collection):
        collection.upsert(ids=["a", "b"], embeddings=[unit([1, 0, 0]), unit([0, 1, 0])])
        collection.delete(["a"])
        assert collection.count() == 1
        assert collection.get()["ids"] == ["b"]

    def test_persistence_roundtrip(self, tmp_path):
        _, col = initialize_db(str(tmp_path / "db2"))
        col.upsert(
            ids=["x"], embeddings=[unit([1, 2, 3])], metadatas=[{"k": "v"}]
        )
        # fresh client, same path
        _, col2 = initialize_db(str(tmp_path / "db2"))
        assert col2.count() == 1
        assert col2.get(ids=["x"])["metadatas"][0] == {"k": "v"}


class TestQuery:
    def _populate(self, col, n=50, d=16, seed=0):
        rng = np.random.default_rng(seed)
        embs = rng.normal(size=(n, d)).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        ids = [f"item{i}" for i in range(n)]
        metas = [
            {"is_region": i % 2 == 0, "parent_image_name": f"img{i % 5}"}
            for i in range(n)
        ]
        col.upsert(ids=ids, embeddings=embs, metadatas=metas)
        return ids, embs, metas

    def test_exact_topk_matches_numpy(self, collection):
        ids, embs, _ = self._populate(collection)
        q = embs[7]
        res = collection.query([q], n_results=5)
        sims = embs @ q
        want = np.argsort(-sims)[:5]
        assert res["ids"][0] == [ids[i] for i in want]
        np.testing.assert_allclose(
            res["distances"][0], (1 - sims[want]), atol=1e-6
        )

    def test_where_filter_eq(self, collection):
        ids, embs, metas = self._populate(collection)
        q = embs[0]
        res = collection.query(
            [q], n_results=10, where={"is_region": {"$eq": True}}
        )
        for meta in res["metadatas"][0]:
            assert meta["is_region"] is True

    def test_where_parent_image(self, collection):
        ids, embs, metas = self._populate(collection)
        res = collection.query(
            [embs[3]],
            n_results=50,
            where={"parent_image_name": {"$eq": "img2"}},
        )
        got_ids = res["ids"][0]
        want_ids = [i for i, m in zip(ids, metas) if m["parent_image_name"] == "img2"]
        assert set(got_ids) == set(want_ids)

    def test_batched_queries(self, collection):
        ids, embs, _ = self._populate(collection)
        res = collection.query([embs[0], embs[1], embs[2]], n_results=3)
        assert len(res["ids"]) == 3
        for row, qi in zip(res["ids"], range(3)):
            assert row[0] == ids[qi]  # self is nearest
            assert res["distances"][qi][0] < 1e-5

    def test_empty_collection_query(self, collection):
        res = collection.query([[1.0, 0.0]], n_results=5)
        assert res["ids"] == [[]]

    def test_k_larger_than_matches(self, collection):
        collection.upsert(ids=["only"], embeddings=[unit([1, 0])])
        res = collection.query([unit([1, 0])], n_results=10)
        assert res["ids"][0] == ["only"]


class TestClient:
    def test_collections_listing(self, tmp_path):
        client = Client(str(tmp_path / "db3"))
        client.get_or_create_collection("one")
        col = client.get_or_create_collection("two")
        col.upsert(ids=["a"], embeddings=[[1.0, 0.0]])
        assert "two" in client.list_collections()
        client.delete_collection("two")
        assert "two" not in client.list_collections()


class TestUpsertDuplicates:
    def test_duplicate_ids_in_one_call(self, collection):
        collection.upsert(
            ids=["dup", "dup"],
            embeddings=[unit([1, 0, 0]), unit([0, 1, 0])],
            metadatas=[{"v": 1}, {"v": 2}],
        )
        assert collection.count() == 1
        got = collection.get(ids=["dup"], include=("embeddings", "metadatas"))
        np.testing.assert_allclose(got["embeddings"][0], [0, 1, 0])  # last wins
        assert got["metadatas"][0] == {"v": 2}

    def test_atomic_bundle_on_disk(self, tmp_path):
        import os

        _, col = initialize_db(str(tmp_path / "dbx"))
        col.upsert(ids=["a"], embeddings=[unit([1, 0])])
        files = os.listdir(col.path)
        assert "collection.npz" in files
        assert "embeddings.npy" not in files

    def test_legacy_triple_file_load(self, tmp_path):
        import json as json_mod
        import os

        legacy = tmp_path / "dbl" / "newspaper_image_embeddings"
        legacy.mkdir(parents=True)
        np.save(str(legacy / "embeddings.npy"), np.eye(2, 3, dtype=np.float32))
        (legacy / "ids.json").write_text(json_mod.dumps(["x", "y"]))
        (legacy / "metadata.jsonl").write_text('{"a": 1}\n{"a": 2}\n')
        _, col = initialize_db(str(tmp_path / "dbl"))
        assert col.count() == 2
        assert col.get(ids=["y"])["metadatas"][0] == {"a": 2}

    def test_inconsistent_load_truncates(self, tmp_path):
        import json as json_mod

        broken = tmp_path / "dbb" / "newspaper_image_embeddings"
        broken.mkdir(parents=True)
        np.save(str(broken / "embeddings.npy"), np.eye(3, 4, dtype=np.float32))
        (broken / "ids.json").write_text(json_mod.dumps(["x", "y"]))  # only 2
        (broken / "metadata.jsonl").write_text('{}\n{}\n')
        _, col = initialize_db(str(tmp_path / "dbb"))
        assert col.count() == 2  # truncated, not crashed
        res = col.query([[1, 0, 0, 0]], n_results=2)
        assert len(res["ids"][0]) == 2


class TestShardedQuery:
    """Corpus-sharded top-k over the mesh data axis (`set_mesh`): exact
    value- AND index-identical to the single-device query — the scale-out
    form of the reference's ChromaDB query (db_operations.py:65-85)."""

    def _mesh(self, devices8, n=8):
        from multimodal_embeddings_tpu.config import MeshConfig
        from multimodal_embeddings_tpu.core.mesh import make_mesh

        return make_mesh(MeshConfig(shape=(n, 1)), devices=devices8[:n])

    def _populate(self, col, n, d=16, seed=0):
        rng = np.random.default_rng(seed)
        embs = rng.normal(size=(n, d)).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        ids = [f"item{i}" for i in range(n)]
        metas = [
            {"is_region": i % 2 == 0, "parent_image_name": f"img{i % 5}"}
            for i in range(n)
        ]
        col.upsert(ids=ids, embeddings=embs, metadatas=metas)
        return ids, embs, metas

    @pytest.mark.parametrize("n", [48, 53])  # even and non-divisible (pad)
    def test_sharded_matches_single_device(self, tmp_path, devices8, n):
        _, col = initialize_db(str(tmp_path / "db"))
        ids, embs, _ = self._populate(col, n)
        rng = np.random.default_rng(1)
        q = rng.normal(size=(3, embs.shape[1])).astype(np.float32)
        base = col.query(q, n_results=7)
        col.set_mesh(self._mesh(devices8))
        got = col.query(q, n_results=7)
        assert got["ids"] == base["ids"]
        np.testing.assert_allclose(
            got["distances"], base["distances"], atol=1e-6
        )
        # where-filter parity through the sharded path
        base_f = None
        col.set_mesh(None)
        base_f = col.query(q, n_results=5, where={"is_region": {"$eq": True}})
        col.set_mesh(self._mesh(devices8))
        got_f = col.query(q, n_results=5, where={"is_region": {"$eq": True}})
        assert got_f["ids"] == base_f["ids"]

    def test_sharded_tie_break_is_index_order(self, tmp_path, devices8):
        """Equal scores must resolve by LOWER row index across shards,
        matching lax.top_k on the unsharded corpus."""
        _, col = initialize_db(str(tmp_path / "db"))
        v = unit([1.0, 0.0, 0.0, 0.0])
        # 16 identical rows -> every score ties; expect items 0..4 in order
        col.upsert(
            ids=[f"t{i}" for i in range(16)],
            embeddings=[v] * 16,
            metadatas=[{} for _ in range(16)],
        )
        col.set_mesh(self._mesh(devices8))
        got = col.query([v], n_results=5)
        assert got["ids"][0] == [f"t{i}" for i in range(5)]

    def test_sharded_topk_function_exact(self, devices8):
        from multimodal_embeddings_tpu.store.embedding_store import (
            sharded_masked_topk,
        )
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        corpus = rng.normal(size=(37, 8)).astype(np.float32)
        queries = rng.normal(size=(4, 8)).astype(np.float32)
        mask = rng.random(37) > 0.3
        mesh = self._mesh(devices8)
        s, i = sharded_masked_topk(corpus, queries, mask, 6, mesh, "data")
        sims = queries @ corpus.T
        sims[:, ~mask] = -2.0
        ws, wi = jax.lax.top_k(jnp.asarray(sims), 6)
        np.testing.assert_allclose(np.asarray(s), np.asarray(ws), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(wi))


class TestHnswCollection:
    """``index="hnsw"`` collections walk the native graph index
    (native/hnsw.cpp) instead of the exact matmul+top-k; response shape
    and semantics match the exact path."""

    @pytest.fixture()
    def hnsw_collection(self, tmp_path):
        from multimodal_embeddings_tpu.utils import native

        if native.load() is None:
            pytest.skip("native library unavailable")
        _, col = initialize_db(str(tmp_path / "db"), index="hnsw")
        return col

    def _fill(self, col, n=300, d=16, seed=0):
        rng = np.random.default_rng(seed)
        emb = rng.normal(size=(n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        col.upsert(
            ids=[f"r{i}" for i in range(n)],
            embeddings=emb,
            metadatas=[
                {"region_type": "text" if i % 2 else "picture"}
                for i in range(n)
            ],
        )
        return emb

    def test_matches_exact_results(self, hnsw_collection, tmp_path):
        emb = self._fill(hnsw_collection)
        _, exact = initialize_db(str(tmp_path / "db2"))
        self._fill(exact)
        got = hnsw_collection.query(query_embeddings=[emb[7]], n_results=5)
        want = exact.query(query_embeddings=[emb[7]], n_results=5)
        # top hit is the vector itself; full top-5 agreement at this scale
        assert got["ids"][0] == want["ids"][0]
        np.testing.assert_allclose(
            got["distances"][0], want["distances"][0], atol=1e-5
        )
        assert got["metadatas"][0][0] == {"region_type": "text"}

    def test_where_filter(self, hnsw_collection):
        emb = self._fill(hnsw_collection)
        got = hnsw_collection.query(
            query_embeddings=[emb[3]],
            n_results=4,
            where={"region_type": "picture"},
        )
        assert all(
            m["region_type"] == "picture" for m in got["metadatas"][0]
        )
        assert len(got["ids"][0]) == 4

    def test_update_invalidates_index(self, hnsw_collection):
        emb = self._fill(hnsw_collection, n=100)
        hnsw_collection.query(query_embeddings=[emb[0]], n_results=1)
        # overwrite row 5's vector with row 0's direction — the graph
        # rebuild must pick the new vector up
        hnsw_collection.upsert(
            ids=["r5"], embeddings=[emb[0]], metadatas=[{"region_type": "x"}]
        )
        got = hnsw_collection.query(query_embeddings=[emb[0]], n_results=2)
        assert set(got["ids"][0]) == {"r0", "r5"}

    def test_incremental_add_after_query(self, hnsw_collection):
        emb = self._fill(hnsw_collection, n=100)
        hnsw_collection.query(query_embeddings=[emb[0]], n_results=1)
        rng = np.random.default_rng(9)
        new = rng.normal(size=(1, 16)).astype(np.float32)
        new /= np.linalg.norm(new)
        hnsw_collection.upsert(
            ids=["fresh"], embeddings=new, metadatas=[{"region_type": "t"}]
        )
        got = hnsw_collection.query(query_embeddings=[new[0]], n_results=1)
        assert got["ids"][0] == ["fresh"]

    def test_delete_renumbers(self, hnsw_collection):
        emb = self._fill(hnsw_collection, n=60)
        hnsw_collection.query(query_embeddings=[emb[0]], n_results=1)
        hnsw_collection.delete(ids=["r0"])
        got = hnsw_collection.query(query_embeddings=[emb[1]], n_results=1)
        assert got["ids"][0] == ["r1"]
