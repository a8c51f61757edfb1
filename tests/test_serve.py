"""Serve CLI + prefetch data-loader tests.

Locks the 3-stage serving pipeline (prefetch-decode → async device
execute → finalize/upsert) against the sequential per-page path, plus the
``Prefetcher`` contract (order, error position, close safety). Reference
analogue being replaced: the per-image decode-inside-the-loop serving of
``deprecated_package/embedder.py:104-137``.
"""

import os
import threading
import time

import numpy as np
import pytest
from PIL import Image

from multimodal_embeddings_tpu.cli.serve import FusedServer, build_parser
from multimodal_embeddings_tpu.io.prefetch import PrefetchError, Prefetcher


class TestPrefetcher:
    def test_order_preserved(self):
        items = list(range(20))
        got = list(Prefetcher(items, lambda x: x * x, depth=3))
        assert got == [(i, i * i) for i in items]

    def test_error_raised_at_failing_item_position(self):
        def fn(x):
            if x == 2:
                raise ValueError("boom")
            return -x

        it = iter(Prefetcher([0, 1, 2, 3], fn))
        assert next(it) == (0, 0)
        assert next(it) == (1, -1)
        with pytest.raises(PrefetchError) as err:
            next(it)
        assert err.value.item == 2
        assert isinstance(err.value.cause, ValueError)
        # the failing item is skipped, not fatal to the stream
        assert next(it) == (3, -3)

    def test_runs_ahead_of_consumer(self):
        started = []

        def fn(x):
            started.append(x)
            return x

        p = Prefetcher(list(range(4)), fn, depth=2)
        it = iter(p)
        first = next(it)
        # give the worker time to fill the depth-2 buffer beyond item 0
        deadline = time.time() + 2.0
        while len(started) < 3 and time.time() < deadline:
            time.sleep(0.01)
        assert first == (0, 0)
        assert len(started) >= 3, started  # items 1,2 prepared ahead
        p.close()

    def test_close_mid_iteration_joins_worker(self):
        p = Prefetcher(list(range(100)), lambda x: x, depth=2)
        it = iter(p)
        next(it)
        p.close()
        assert not p._thread.is_alive()

    def test_empty(self):
        assert list(Prefetcher([], lambda x: x)) == []

    def test_iterate_after_close_terminates(self):
        p = Prefetcher(list(range(50)), lambda x: x, depth=2)
        it = iter(p)
        next(it)
        p.close()
        # must terminate, not block on the drained queue
        assert list(it) == []


def _make_pages(folder, n=3, size=(120, 150)):
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = np.full((size[1], size[0], 3), 240, np.uint8)
        arr[20:40, 10:110] = rng.integers(0, 90, (20, 100, 3), dtype=np.uint8)
        arr[60 + 10 * i : 90 + 10 * i, 30:100] = rng.integers(
            0, 90, (30, 70, 3), dtype=np.uint8
        )
        path = os.path.join(folder, f"serve_page_{i}.png")
        Image.fromarray(arr).save(path)
        paths.append(path)
    return paths


def _tiny_server(input_folder, db_path, *extra):
    args = build_parser().parse_args(
        [
            "--input_folder",
            input_folder,
            "--db_path",
            db_path,
            "--imgsz",
            "64",
            "--variant",
            "n",
            "--grid_configs",
            "",
            "--num_regions",
            "4",
            "--embedder_family",
            "siglip",
            "--embedder_size",
            "tiny",
            *extra,
        ]
    )
    return FusedServer(args)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """One pipelined run_once over 3 tiny pages."""
    root = tmp_path_factory.mktemp("serve_e2e")
    pages = _make_pages(str(root / "pages"))
    server = _tiny_server(str(root / "pages"), str(root / "db"))
    n_pages = server.run_once()
    return server, pages, n_pages


class TestFusedServerE2E:
    def test_ingests_all_pages(self, served):
        server, pages, n_pages = served
        assert n_pages == len(pages)
        for p in pages:
            assert server.progress.is_completed(p)

    def test_store_contents(self, served):
        server, pages, _ = served
        got = server.collection.get(include=("metadatas",))
        region_ids = [i for i in got["ids"] if i.startswith("region_")]
        page_ids = [i for i in got["ids"] if not i.startswith("region_")]
        # every page got a whole-page entry; regions depend on detections
        assert sorted(page_ids) == sorted(os.path.basename(p) for p in pages)
        for rid, meta in zip(got["ids"], got["metadatas"]):
            if rid.startswith("region_"):
                assert meta["is_region"] is True
                assert "box" in meta and "region_type" in meta
        assert region_ids or True  # random weights may legitimately find 0

    def test_second_run_is_noop(self, served):
        server, _, _ = served
        assert server.run_once() == 0

    def test_corrupt_page_is_skipped_not_fatal(self, tmp_path):
        """A page that fails decode on the prefetch thread must be
        skipped (reference skip-errors contract) while the rest of the
        stream is served."""
        pages = _make_pages(str(tmp_path / "pages"), n=2)
        with open(str(tmp_path / "pages" / "corrupt_aa.png"), "wb") as f:
            f.write(b"not a png")
        server = _tiny_server(str(tmp_path / "pages"), str(tmp_path / "db_c"))
        assert server.run_once() == 3  # attempted all three
        for p in pages:
            assert server.progress.is_completed(p)
        assert not server.progress.is_completed(
            str(tmp_path / "pages" / "corrupt_aa.png")
        )
        page_ids = [
            i for i in server.collection.get()["ids"]
            if not i.startswith("region_")
        ]
        assert sorted(page_ids) == sorted(os.path.basename(p) for p in pages)

    def test_data_parallel_matches_sequential(self, tmp_path):
        """dp=4 serving on the 8-device virtual mesh (pages sharded over
        the data axis, last partial group padded) must fill the store
        identically to single-device sequential serving — the multi-chip
        replacement for the reference's per-GPU round-robin
        (embedder.py:190-224)."""
        pages = _make_pages(str(tmp_path / "pages"), n=5)
        dp = _tiny_server(
            str(tmp_path / "pages"), str(tmp_path / "db_dp"),
            "--data_parallel", "4",
        )
        assert dp.run_once() == len(pages)

        seq = _tiny_server(str(tmp_path / "pages"), str(tmp_path / "db_s"))
        for p in pages:
            seq.process_page(p)

        a = dp.collection.get(include=("embeddings",))
        b = seq.collection.get(include=("embeddings",))
        assert sorted(a["ids"]) == sorted(b["ids"]) and a["ids"]
        ea = dict(zip(a["ids"], a["embeddings"]))
        eb = dict(zip(b["ids"], b["embeddings"]))
        for rid in ea:
            np.testing.assert_allclose(ea[rid], eb[rid], atol=2e-5)

    def test_data_parallel_mme5_matches_sequential(self, tmp_path):
        """dp serving of the PARITY-architecture (mme5) family runs the
        two-program split batched over the data axis; store must equal
        single-device sequential serving."""
        pages = _make_pages(str(tmp_path / "pages"), n=3)
        dp = _tiny_server(
            str(tmp_path / "pages"), str(tmp_path / "db_mdp"),
            "--embedder_family", "mme5", "--data_parallel", "2",
        )
        assert dp.run_once() == len(pages)

        seq = _tiny_server(
            str(tmp_path / "pages"), str(tmp_path / "db_ms"),
            "--embedder_family", "mme5",
        )
        for p in pages:
            seq.process_page(p)

        a = dp.collection.get(include=("embeddings",))
        b = seq.collection.get(include=("embeddings",))
        assert sorted(a["ids"]) == sorted(b["ids"]) and a["ids"]
        ea = dict(zip(a["ids"], a["embeddings"]))
        eb = dict(zip(b["ids"], b["embeddings"]))
        for rid in ea:
            np.testing.assert_allclose(ea[rid], eb[rid], atol=3e-5)

    def test_model_parallel_mme5_matches_sequential(self, tmp_path):
        """dp=2 x tp=2 serving: pages sharded over the data axis AND the
        mme5 tree tensor-sharded over the model axis (the serving shape
        for weight trees one chip can't hold — bf16 11B at tp>=2). Store
        must equal single-device sequential serving."""
        pages = _make_pages(str(tmp_path / "pages"), n=3)
        tp = _tiny_server(
            str(tmp_path / "pages"), str(tmp_path / "db_tp"),
            "--embedder_family", "mme5",
            "--data_parallel", "2", "--model_parallel", "2",
        )
        assert tp.mesh is not None and tp.mesh.devices.size == 4
        assert tp.run_once() == len(pages)

        seq = _tiny_server(
            str(tmp_path / "pages"), str(tmp_path / "db_ts"),
            "--embedder_family", "mme5",
        )
        for p in pages:
            seq.process_page(p)

        a = tp.collection.get(include=("embeddings",))
        b = seq.collection.get(include=("embeddings",))
        assert sorted(a["ids"]) == sorted(b["ids"]) and a["ids"]
        ea = dict(zip(a["ids"], a["embeddings"]))
        eb = dict(zip(b["ids"], b["embeddings"]))
        for rid in ea:
            # TP splits each contraction into per-chip bf16 partial sums
            # (different rounding than the single-device reduction —
            # measured max abs ~2e-3 on these unit vectors), so the
            # equality gate is the BASELINE.json embedding-parity
            # criterion (cosine >= 0.999), not elementwise bits
            va, vb = np.asarray(ea[rid]), np.asarray(eb[rid])
            cos = float(
                va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            )
            assert cos >= 0.999, (rid, cos)
            np.testing.assert_allclose(va, vb, atol=5e-3)

    def test_model_parallel_rejects_siglip(self, tmp_path):
        """The siglip tower fits one chip; --model_parallel must refuse it
        with guidance rather than shard a 100MB tree."""
        _make_pages(str(tmp_path / "pages"), n=1)
        with pytest.raises(SystemExit):
            _tiny_server(
                str(tmp_path / "pages"), str(tmp_path / "db_x"),
                "--model_parallel", "2",
            )

    def test_pipelined_matches_sequential(self, tmp_path):
        """The 3-stage pipeline must produce exactly the store the
        sequential per-page path produces (ids + embeddings)."""
        pages = _make_pages(str(tmp_path / "pages"))
        pipelined = _tiny_server(str(tmp_path / "pages"), str(tmp_path / "db_a"))
        pipelined.run_once()

        sequential = _tiny_server(str(tmp_path / "pages"), str(tmp_path / "db_b"))
        for p in pages:
            # process_page = _prepare → _submit → _finalize (incl. the
            # whole-page embed + progress mark)
            sequential.process_page(p)

        a = pipelined.collection.get(include=("embeddings", "metadatas"))
        b = sequential.collection.get(include=("embeddings", "metadatas"))
        assert sorted(a["ids"]) == sorted(b["ids"])
        ea = {i: e for i, e in zip(a["ids"], a["embeddings"])}
        eb = {i: e for i, e in zip(b["ids"], b["embeddings"])}
        for rid in ea:
            np.testing.assert_allclose(ea[rid], eb[rid], rtol=0, atol=0)
