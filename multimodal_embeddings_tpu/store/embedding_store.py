"""Embedding store: exact cosine top-k retrieval with metadata filters.

Replaces ChromaDB/hnswlib (``db_operations.py:17-61``). At this corpus
scale (~20 pages, 10³-10⁵ regions) an *exact* brute-force cosine top-k as a
single matmul + ``top_k`` on TPU strictly dominates an approximate HNSW
walk on CPU, so exact retrieval is the default. For corpora where the
O(n·d) scan stops being free, ``index="hnsw"`` opts into the in-repo
native graph index (``native/hnsw.cpp``, the hnswlib-equivalent
algorithm) built with the reference's HNSW parameters (M=32, ef=200 —
``db_operations.py:28-33``), which otherwise remain collection metadata.
Distances returned are **cosine distances**
(1 − cosine similarity), matching what the reference reads back from
Chroma (``weighted_region_clustering.py:224``).

API kept drop-in close to the reference's usage sites:

* ``initialize_db(path) -> (client, collection)``
  (``db_operations.py:17-61``),
* ``collection.upsert/get/query/count`` with ``where`` filters supporting
  ``{"field": {"$eq": v}}``, ``{"field": v}``, ``{"$and": [...]}`` — the
  forms the reference actually uses (``is_region``, ``parent_image_name``),
* ``get_embedding_from_db(collection, id)`` (``db_operations.py:65-85``).

Persistence: ``embeddings.npy`` + ``metadata.jsonl`` + ``ids.json`` per
collection directory, written atomically.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from multimodal_embeddings_tpu.io.logging_setup import get_logger

logger = get_logger("store")

DEFAULT_COLLECTION = "newspaper_image_embeddings"
HNSW_COMPAT_METADATA = {
    "hnsw:space": "cosine",
    "hnsw:M": 32,
    "hnsw:construction_ef": 200,
    "hnsw:search_ef": 200,
}


def _matches(meta: Dict[str, Any], where: Optional[Dict[str, Any]]) -> bool:
    if not where:
        return True
    for key, cond in where.items():
        if key == "$and":
            if not all(_matches(meta, c) for c in cond):
                return False
        elif key == "$or":
            if not any(_matches(meta, c) for c in cond):
                return False
        elif isinstance(cond, dict):
            for op, val in cond.items():
                value = meta.get(key)
                if op == "$eq" and value != val:
                    return False
                if op == "$ne" and value == val:
                    return False
                if op == "$in" and value not in val:
                    return False
        else:
            if meta.get(key) != cond:
                return False
    return True


class Collection:
    """One named embedding collection with exact cosine retrieval."""

    def __init__(
        self,
        path: str,
        name: str,
        metadata: Optional[Dict] = None,
        index: str = "exact",
    ):
        self.path = os.path.join(path, name)
        self.name = name
        self.metadata = dict(metadata or HNSW_COMPAT_METADATA)
        self._lock = threading.RLock()
        self._ids: List[str] = []
        self._id_index: Dict[str, int] = {}
        self._embeddings: Optional[np.ndarray] = None  # (N, D) float32
        self._metadatas: List[Dict[str, Any]] = []
        self._device_cache = None
        self._mesh = None  # opt-in corpus sharding (set_mesh)
        self._mesh_axis = "data"
        # retrieval mode: "exact" (default — matmul+top-k, the measured
        # winner at reference corpus scale) or "hnsw" (native graph index,
        # native/hnsw.cpp, built with this collection's hnsw:* metadata —
        # O(log n) walks for corpora where the O(n·d) scan stops being free)
        assert index in ("exact", "hnsw"), index
        self._index_mode = index
        self._hnsw = None
        self._hnsw_rows = 0  # corpus rows already inserted into the index
        self._load()

    def set_mesh(self, mesh, axis_name: str = "data") -> None:
        """Shard subsequent queries' corpus matmul over ``axis_name`` of
        ``mesh`` (exact, tie-identical to single-device — see
        ``sharded_masked_topk``). Pass ``None`` to return to one device."""
        with self._lock:
            self._mesh = mesh
            self._mesh_axis = axis_name
            self._device_cache = None

    # -- persistence --------------------------------------------------------

    def _load(self) -> None:
        bundle = os.path.join(self.path, "collection.npz")
        if os.path.exists(bundle):
            with np.load(bundle, allow_pickle=False) as data:
                self._embeddings = data["embeddings"]
                self._ids = json.loads(str(data["ids_json"]))
                self._metadatas = json.loads(str(data["metadata_json"]))
        elif os.path.exists(os.path.join(self.path, "embeddings.npy")):
            # legacy triple-file layout (pre-atomic)
            self._embeddings = np.load(os.path.join(self.path, "embeddings.npy"))
            with open(os.path.join(self.path, "ids.json")) as f:
                self._ids = json.load(f)
            self._metadatas = []
            with open(os.path.join(self.path, "metadata.jsonl")) as f:
                for line in f:
                    self._metadatas.append(json.loads(line))
        else:
            return
        n = min(len(self._ids), len(self._metadatas), len(self._embeddings))
        if (
            n != len(self._ids)
            or n != len(self._embeddings)
            or n != len(self._metadatas)
        ):
            logger.warning(
                "collection %s inconsistent (%d ids / %d rows) — truncating to %d",
                self.name, len(self._ids), len(self._embeddings), n,
            )
            self._ids = self._ids[:n]
            self._metadatas = self._metadatas[:n]
            self._embeddings = self._embeddings[:n]
        self._id_index = {i: n_ for n_, i in enumerate(self._ids)}
        logger.info(
            "loaded collection %s: %d embeddings", self.name, len(self._ids)
        )

    def persist(self) -> None:
        """Atomic persistence: everything goes into ONE .npz replaced in a
        single os.replace, so a crash can never leave ids/embeddings/
        metadata mutually inconsistent."""
        with self._lock:
            os.makedirs(self.path, exist_ok=True)
            if self._embeddings is None:
                # collection emptied: remove stale bundles so deleted rows
                # cannot resurrect on the next load
                for name in (
                    "collection.npz", "embeddings.npy", "ids.json", "metadata.jsonl"
                ):
                    target = os.path.join(self.path, name)
                    if os.path.exists(target):
                        os.remove(target)
                return
            tmp = os.path.join(self.path, ".tmp_collection.npz")
            np.savez(
                tmp,
                embeddings=self._embeddings,
                ids_json=np.asarray(json.dumps(self._ids)),
                metadata_json=np.asarray(json.dumps(self._metadatas)),
            )
            # np.savez appends .npz when missing — tmp already has it
            os.replace(tmp, os.path.join(self.path, "collection.npz"))

    # -- mutation -----------------------------------------------------------

    def upsert(
        self,
        ids: Sequence[str],
        embeddings: Sequence[Sequence[float]],
        metadatas: Optional[Sequence[Dict[str, Any]]] = None,
        documents: Optional[Sequence[str]] = None,
    ) -> None:
        with self._lock:
            embs = np.asarray(embeddings, np.float32)
            if embs.ndim == 1:
                embs = embs[None]
            metadatas = list(metadatas or [{} for _ in ids])
            if documents is not None:
                for m, d in zip(metadatas, documents):
                    m.setdefault("document", d)
            # duplicate ids within one call: last occurrence wins (Chroma
            # semantics) — dedup before touching indices
            latest = {}
            for i, item_id in enumerate(ids):
                latest[item_id] = i
            new_rows = []
            for i, (item_id, emb) in enumerate(zip(ids, embs)):
                if latest[item_id] != i:
                    continue
                if item_id in self._id_index:
                    idx = self._id_index[item_id]
                    if idx < self._hnsw_rows and not np.array_equal(
                        self._embeddings[idx], emb
                    ):
                        # in-place VECTOR change invalidates the graph —
                        # rebuild lazily; metadata-only re-upserts (the
                        # idempotent re-run flow) keep the index
                        self._hnsw = None
                        self._hnsw_rows = 0
                    self._embeddings[idx] = emb
                    self._metadatas[idx] = dict(metadatas[i])
                else:
                    self._id_index[item_id] = len(self._ids) + len(new_rows)
                    new_rows.append((item_id, emb, dict(metadatas[i])))
            if new_rows:
                add = np.stack([r[1] for r in new_rows])
                self._embeddings = (
                    add
                    if self._embeddings is None
                    else np.concatenate([self._embeddings, add])
                )
                self._ids.extend(r[0] for r in new_rows)
                self._metadatas.extend(r[2] for r in new_rows)
            self._device_cache = None
            if self._index_mode == "hnsw":
                # amortize index construction across ingest batches so the
                # first query after a large ingest doesn't pay one giant
                # single-threaded build under the lock
                self._sync_hnsw()
            self.persist()

    def delete(self, ids: Sequence[str]) -> None:
        with self._lock:
            drop = {i for i in ids if i in self._id_index}
            if not drop:
                return
            keep = [n for n, i in enumerate(self._ids) if i not in drop]
            self._embeddings = self._embeddings[keep] if len(keep) else None
            self._ids = [self._ids[n] for n in keep]
            self._metadatas = [self._metadatas[n] for n in keep]
            self._id_index = {i: n for n, i in enumerate(self._ids)}
            self._device_cache = None
            self._hnsw = None  # row renumbering — rebuild lazily
            self._hnsw_rows = 0
            self.persist()

    def set_index(self, mode: str) -> None:
        """Switch retrieval between ``"exact"`` and ``"hnsw"``."""
        assert mode in ("exact", "hnsw"), mode
        with self._lock:
            self._index_mode = mode

    def _sync_hnsw(self):
        """Build/extend the native graph index to cover the corpus (call
        under the lock). Returns the index, or None if the native library
        is unavailable (caller falls back to exact retrieval)."""
        from multimodal_embeddings_tpu.utils.native import HnswIndex

        n = len(self._ids)
        if self._hnsw is None:
            try:
                self._hnsw = HnswIndex(
                    int(self._embeddings.shape[1]),
                    m=int(self.metadata.get("hnsw:M", 32)),
                    ef_construction=int(
                        self.metadata.get("hnsw:construction_ef", 200)
                    ),
                    seed=0,
                )
            except RuntimeError as exc:
                logger.warning(
                    "hnsw index unavailable (%s) — falling back to exact "
                    "retrieval", exc,
                )
                self._index_mode = "exact"
                return None
            self._hnsw_rows = 0
        if self._hnsw_rows < n:
            self._hnsw.add(self._embeddings[self._hnsw_rows : n])
            self._hnsw_rows = n
        return self._hnsw

    # -- reads --------------------------------------------------------------

    def count(self) -> int:
        return len(self._ids)

    def get(
        self,
        ids: Optional[Sequence[str]] = None,
        where: Optional[Dict] = None,
        include: Sequence[str] = ("metadatas",),
        limit: Optional[int] = None,
    ) -> Dict[str, Any]:
        with self._lock:
            if ids is not None:
                idxs = [self._id_index[i] for i in ids if i in self._id_index]
            else:
                idxs = [
                    n
                    for n, m in enumerate(self._metadatas)
                    if _matches(m, where)
                ]
            if limit is not None:
                idxs = idxs[:limit]
            out: Dict[str, Any] = {"ids": [self._ids[n] for n in idxs]}
            if "embeddings" in include and self._embeddings is not None:
                out["embeddings"] = [self._embeddings[n].tolist() for n in idxs]
            elif "embeddings" in include:
                out["embeddings"] = []
            if "metadatas" in include:
                out["metadatas"] = [self._metadatas[n] for n in idxs]
            return out

    def _device_embeddings(self):
        """Unit-normalized corpus matrix cached on device — replicated on
        one device by default, row-sharded over the mesh data axis after
        ``set_mesh`` (rows padded to the shard multiple)."""
        import jax
        import jax.numpy as jnp

        with self._lock:
            if self._device_cache is None:
                norms = np.linalg.norm(self._embeddings, axis=1, keepdims=True)
                normed = self._embeddings / np.clip(norms, 1e-12, None)
                if self._mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    padded = _pad_rows(
                        normed.astype(np.float32),
                        self._mesh.shape[self._mesh_axis],
                    )
                    self._device_cache = jax.device_put(
                        padded,
                        NamedSharding(self._mesh, P(self._mesh_axis, None)),
                    )
                else:
                    self._device_cache = jnp.asarray(normed)
            return self._device_cache

    def query(
        self,
        query_embeddings: Sequence[Sequence[float]],
        n_results: int = 10,
        where: Optional[Dict] = None,
        include: Sequence[str] = ("metadatas", "distances"),
    ) -> Dict[str, Any]:
        """Cosine top-k. Default ("exact"): one fused matmul + mask + top_k
        on device for the whole query batch (replaces per-query HNSW
        walks). ``index="hnsw"`` collections walk the native graph index
        (``native/hnsw.cpp``) instead — approximate, built with this
        collection's ``hnsw:*`` metadata parameters."""
        import jax
        import jax.numpy as jnp

        with self._lock:
            n = len(self._ids)
            if n == 0:
                empty = [[] for _ in query_embeddings]
                return {"ids": empty, "distances": empty, "metadatas": empty}
            if self._index_mode == "hnsw" and self._sync_hnsw() is not None:
                return self._query_hnsw(
                    query_embeddings, n_results, where, include
                )
            corpus = self._device_embeddings()
            mask = np.fromiter(
                (_matches(m, where) for m in self._metadatas), bool, count=n
            )
            metadatas = list(self._metadatas)
            ids = list(self._ids)

        q = np.asarray(query_embeddings, np.float32)
        if q.ndim == 1:
            q = q[None]
        qn = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)

        k = min(n_results, int(mask.sum()))
        if k == 0:
            empty = [[] for _ in range(q.shape[0])]
            return {"ids": empty, "distances": empty, "metadatas": empty}

        if self._mesh is not None:
            mask_p = _pad_rows(mask, self._mesh.shape[self._mesh_axis])
            sims = _sharded_query(
                corpus, qn, mask_p, k, n, self._mesh, self._mesh_axis
            )
        else:
            sims = _masked_topk(corpus, jnp.asarray(qn), jnp.asarray(mask), k)
        top_sims, top_idx = (np.asarray(sims[0]), np.asarray(sims[1]))

        out: Dict[str, Any] = {
            "ids": [[ids[j] for j in row] for row in top_idx],
        }
        if "distances" in include:
            out["distances"] = (1.0 - top_sims).tolist()
        if "metadatas" in include:
            out["metadatas"] = [[metadatas[j] for j in row] for row in top_idx]
        if "embeddings" in include:
            with self._lock:
                out["embeddings"] = [
                    [self._embeddings[j].tolist() for j in row] for row in top_idx
                ]
        return out

    def _query_hnsw(
        self,
        query_embeddings,
        n_results: int,
        where: Optional[Dict],
        include: Sequence[str],
    ) -> Dict[str, Any]:
        """Native-graph retrieval path (called under the lock with the
        index synced). Same response shape as the exact path; rows with
        fewer than ``n_results`` filter matches return short lists, like
        the exact path's k clamping."""
        n = len(self._ids)
        q = np.asarray(query_embeddings, np.float32)
        if q.ndim == 1:
            q = q[None]
        mask = None
        if where:
            mask = np.fromiter(
                (_matches(m, where) for m in self._metadatas),
                np.uint8,
                count=n,
            )
        k = min(n_results, n if mask is None else int(mask.sum()))
        if k == 0:
            empty = [[] for _ in range(q.shape[0])]
            return {"ids": empty, "distances": empty, "metadatas": empty}
        ef = max(int(self.metadata.get("hnsw:search_ef", 200)), k)
        idx, dist = self._hnsw.search(q, k=k, ef=ef, mask=mask)
        # -1 padding (fewer than k matches reachable) sits at the tail
        rows = [[int(j) for j in row if j >= 0] for row in idx]
        out: Dict[str, Any] = {
            "ids": [[self._ids[j] for j in row] for row in rows]
        }
        if "distances" in include:
            out["distances"] = [
                [float(dist[i][p]) for p in range(len(row))]
                for i, row in enumerate(rows)
            ]
        if "metadatas" in include:
            out["metadatas"] = [
                [self._metadatas[j] for j in row] for row in rows
            ]
        if "embeddings" in include:
            out["embeddings"] = [
                [self._embeddings[j].tolist() for j in row] for row in rows
            ]
        return out


import functools as _functools


@_functools.lru_cache(maxsize=32)
def _masked_topk_fn(k: int):
    """Jitted masked-top-k factory, cached per k so repeated queries hit the
    jit cache instead of retracing (tunnel compiles cost minutes)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(corpus, queries, mask):
        sims = jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32)
        sims = jnp.where(mask[None, :], sims, -2.0)  # cosine floor is -1
        return jax.lax.top_k(sims, k)

    return run


def _masked_topk(corpus, queries, mask, k: int):
    """(N,D) corpus × (Q,D) queries → top-k similarities/indices among
    mask-true rows.

    k is bucketed to the next power of two (clamped to the corpus size) so
    a long-running serve process with shifting where-filters compiles a
    BOUNDED set of top-k programs — k tracks ``mask.sum()``, which varies
    per filter, and each new program costs minutes through the tunnel."""
    bucket = 1
    while bucket < k:
        bucket *= 2
    bucket = min(bucket, corpus.shape[0])
    sims, idx = _masked_topk_fn(bucket)(corpus, queries, mask)
    if bucket != k:
        sims, idx = sims[:, :k], idx[:, :k]
    return sims, idx


@_functools.lru_cache(maxsize=32)
def _sharded_topk_fn(k: int, mesh, axis_name: str):
    """Corpus-sharded masked top-k: each device scores its contiguous row
    shard (one local matmul + local top-k), the per-shard candidates ride
    ICI once (`all_gather` of k rows per device, not the full score
    matrix), and a final top-k merges them.

    Exactness: `lax.top_k` breaks score ties by LOWER index. Shards are
    contiguous row ranges in device order, so for equal scores a lower
    gather position always corresponds to a lower global row index — the
    merged result is identical (values AND indices) to a single-device
    top-k over the whole corpus.

    This is the scale-out form of the reference's ChromaDB/hnswlib query
    (``db_operations.py:65-85``): the corpus there is ~10^3 rows on one
    host; sharding the matmul over the mesh data axis serves corpora that
    exceed one chip's HBM.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:  # jax >= 0.8 top-level API; the experimental path is deprecated
        from jax import shard_map
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map

    def body(corpus_blk, queries, mask_blk):
        rows = corpus_blk.shape[0]
        sims = jnp.dot(
            queries, corpus_blk.T, preferred_element_type=jnp.float32
        )
        sims = jnp.where(mask_blk[None, :], sims, -2.0)  # cosine floor −1
        kk = min(k, rows)
        s, i = jax.lax.top_k(sims, kk)
        gidx = i + jax.lax.axis_index(axis_name) * rows
        s_all = jax.lax.all_gather(s, axis_name, axis=1, tiled=True)
        g_all = jax.lax.all_gather(gidx, axis_name, axis=1, tiled=True)
        fs, fpos = jax.lax.top_k(s_all, k)
        return fs, jnp.take_along_axis(g_all, fpos, axis=1)

    kwargs = dict(
        mesh=mesh,
        in_specs=(P(axis_name, None), P(), P(axis_name)),
        out_specs=(P(), P()),
    )
    # outputs are device-identical after all_gather; the replication-check
    # kwarg was renamed check_rep → check_vma in the jax-0.8 top-level API
    import inspect

    params = inspect.signature(shard_map).parameters
    kwargs["check_vma" if "check_vma" in params else "check_rep"] = False
    mapped = shard_map(body, **kwargs)
    return jax.jit(mapped)


def _pad_rows(arr: np.ndarray, n_shards: int) -> np.ndarray:
    """Zero-pad the leading axis to a multiple of ``n_shards``."""
    pad = (-arr.shape[0]) % n_shards
    if not pad:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths)


def _sharded_query(corpus_dev, queries, mask, k: int, n: int, mesh, axis_name):
    """Run the sharded top-k against an already-placed padded corpus.
    ``mask`` is host-side with the corpus's PADDED length (pads False);
    ``n`` is the true row count (bounds the k bucket)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    bucket = 1
    while bucket < k:
        bucket *= 2
    bucket = min(bucket, n)
    mask_dev = jax.device_put(
        np.asarray(mask, bool), NamedSharding(mesh, P(axis_name))
    )
    q_dev = jax.device_put(jnp.asarray(queries), NamedSharding(mesh, P()))
    sims, idx = _sharded_topk_fn(bucket, mesh, axis_name)(
        corpus_dev, q_dev, mask_dev
    )
    if bucket != k:
        sims, idx = sims[:, :k], idx[:, :k]
    return sims, idx


def sharded_masked_topk(corpus, queries, mask, k: int, mesh, axis_name: str):
    """Masked cosine top-k with the corpus rows sharded over ``axis_name``
    of ``mesh``. Pads the row count to the shard multiple (padded rows are
    masked out) and returns exactly the single-device result."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_shards = mesh.shape[axis_name]
    n = corpus.shape[0]
    corpus_p = _pad_rows(np.asarray(corpus), n_shards)
    mask_p = _pad_rows(np.asarray(mask, bool), n_shards)
    corpus_dev = jax.device_put(
        corpus_p, NamedSharding(mesh, P(axis_name, None))
    )
    return _sharded_query(corpus_dev, queries, mask_p, k, n, mesh, axis_name)


class Client:
    """Minimal persistent client (ChromaDB-shaped)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._collections: Dict[str, Collection] = {}

    def get_or_create_collection(
        self, name: str, metadata: Optional[Dict] = None, index: str = "exact"
    ) -> Collection:
        if name not in self._collections:
            self._collections[name] = Collection(
                self.path, name, metadata, index=index
            )
        return self._collections[name]

    def delete_collection(self, name: str) -> None:
        import shutil

        self._collections.pop(name, None)
        target = os.path.join(self.path, name)
        if os.path.isdir(target):
            shutil.rmtree(target)

    def list_collections(self) -> List[str]:
        stored = [
            d
            for d in os.listdir(self.path)
            if os.path.isdir(os.path.join(self.path, d))
        ]
        return sorted(set(stored) | set(self._collections))


def initialize_db(
    path: str = "db",
    collection_name: str = DEFAULT_COLLECTION,
    index: str = "exact",
) -> Tuple[Client, Collection]:
    """Reference-shaped entry point (``db_operations.py:17-61``).

    ``index="hnsw"`` opts into the native graph index (``native/hnsw.cpp``)
    built with the collection's ``hnsw:*`` metadata — the reference's
    actual hnswlib configuration — instead of the default exact retrieval."""
    client = Client(path)
    collection = client.get_or_create_collection(
        collection_name, metadata=HNSW_COMPAT_METADATA, index=index
    )
    logger.info(
        "store ready at %s, collection %r (%d items)",
        path,
        collection_name,
        collection.count(),
    )
    return client, collection


def get_embedding_from_db(collection: Collection, item_id: str) -> Optional[List[float]]:
    """Fetch one embedding with validity check (``db_operations.py:65-85``)."""
    result = collection.get(ids=[item_id], include=("embeddings",))
    if result["ids"] and result.get("embeddings"):
        emb = result["embeddings"][0]
        if emb and len(emb) > 0:
            return emb
    return None
