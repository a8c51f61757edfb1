"""ctypes bindings for the native host kernels (``native/libmmtpu.so``).

Auto-builds with ``make`` on first use when a compiler is available;
callers fall back to the NumPy host paths when the library is absent. The
native and NumPy implementations are bit-identical (float64, same
arithmetic order) — verified in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from multimodal_embeddings_tpu.io.logging_setup import get_logger

logger = get_logger("native")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmmtpu.so")
_lib = None
_load_attempted = False


def _try_build() -> bool:
    if not os.path.isdir(_NATIVE_DIR):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception as exc:  # noqa: BLE001
        logger.warning("native build failed: %s", exc)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted:
        return None
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:
        logger.warning("failed to load native library: %s", exc)
        return None
    # a .so built before hnsw.cpp existed lacks the hnsw_* symbols —
    # rebuild once rather than raising AttributeError out of a function
    # documented to return Optional (every native consumer falls back on
    # None)
    if not hasattr(lib, "hnsw_new"):
        logger.info("native library predates hnsw symbols — rebuilding")
        del lib
        if not _try_build():
            return None
        # dlopen caches by path: re-opening _LIB_PATH would return the
        # stale image already mapped above — load the rebuilt library
        # through a fresh temp copy instead
        import shutil
        import tempfile

        try:
            tmp = tempfile.NamedTemporaryFile(
                suffix=".so", delete=False
            )
            tmp.close()
            shutil.copy2(_LIB_PATH, tmp.name)
            lib = ctypes.CDLL(tmp.name)
        except OSError as exc:  # pragma: no cover - racing builds
            logger.warning("failed to reload native library: %s", exc)
            return None
        if not hasattr(lib, "hnsw_new"):
            logger.warning("rebuilt native library still lacks hnsw symbols")
            return None

    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_i64_p = ctypes.POINTER(ctypes.c_int64)
    c_u8_p = ctypes.POINTER(ctypes.c_uint8)

    lib.greedy_nms.restype = ctypes.c_int64
    lib.greedy_nms.argtypes = [
        c_double_p, c_double_p, c_double_p, ctypes.c_int64,
        ctypes.c_double, c_i64_p,
    ]
    lib.iou_matrix.restype = None
    lib.iou_matrix.argtypes = [
        c_double_p, ctypes.c_int64, c_double_p, ctypes.c_int64, c_double_p,
    ]
    lib.cosine_topk.restype = ctypes.c_int64
    lib.cosine_topk.argtypes = [
        c_float_p, ctypes.c_int64, ctypes.c_int64, c_float_p, c_u8_p,
        ctypes.c_int64, c_i64_p, c_float_p,
    ]
    lib.internal_edge_mask.restype = None
    lib.internal_edge_mask.argtypes = [
        c_double_p, ctypes.c_int64, c_double_p, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, c_u8_p,
    ]
    lib.hnsw_new.restype = ctypes.c_void_p
    lib.hnsw_new.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
    ]
    lib.hnsw_free.restype = None
    lib.hnsw_free.argtypes = [ctypes.c_void_p]
    lib.hnsw_size.restype = ctypes.c_int64
    lib.hnsw_size.argtypes = [ctypes.c_void_p]
    lib.hnsw_add.restype = None
    lib.hnsw_add.argtypes = [ctypes.c_void_p, c_float_p, ctypes.c_int64]
    lib.hnsw_search.restype = ctypes.c_int64
    lib.hnsw_search.argtypes = [
        ctypes.c_void_p, c_float_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, c_u8_p, c_i64_p, c_float_p,
    ]
    _lib = lib
    logger.info("native host kernels loaded from %s", _LIB_PATH)
    return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def greedy_nms_native(
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: Optional[np.ndarray],
    iou_threshold: float,
) -> Optional[np.ndarray]:
    """Native greedy NMS; None when the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float64).reshape(-1, 4)
    scores = np.ascontiguousarray(scores, np.float64)
    n = boxes.shape[0]
    keep = np.empty(n, np.int64)
    cls_ptr = None
    if classes is not None:
        classes = np.ascontiguousarray(classes, np.float64)
        cls_ptr = _ptr(classes, ctypes.c_double)
    count = lib.greedy_nms(
        _ptr(boxes, ctypes.c_double),
        _ptr(scores, ctypes.c_double),
        cls_ptr,
        n,
        float(iou_threshold),
        _ptr(keep, ctypes.c_int64),
    )
    return keep[:count]


def iou_matrix_native(
    boxes_a: np.ndarray, boxes_b: Optional[np.ndarray] = None
) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(boxes_a, np.float64).reshape(-1, 4)
    b = a if boxes_b is None else np.ascontiguousarray(boxes_b, np.float64).reshape(-1, 4)
    out = np.empty((a.shape[0], b.shape[0]), np.float64)
    lib.iou_matrix(
        _ptr(a, ctypes.c_double), a.shape[0], _ptr(b, ctypes.c_double), b.shape[0],
        _ptr(out, ctypes.c_double),
    )
    return out


def cosine_topk_native(
    corpus: np.ndarray,
    query: np.ndarray,
    k: int,
    mask: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = load()
    if lib is None:
        return None
    corpus = np.ascontiguousarray(corpus, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    n, d = corpus.shape
    idx = np.empty(k, np.int64)
    sims = np.empty(k, np.float32)
    mask_ptr = None
    if mask is not None:
        mask = np.ascontiguousarray(mask, np.uint8)
        mask_ptr = _ptr(mask, ctypes.c_uint8)
    count = lib.cosine_topk(
        _ptr(corpus, ctypes.c_float), n, d, _ptr(query, ctypes.c_float),
        mask_ptr, k, _ptr(idx, ctypes.c_int64), _ptr(sims, ctypes.c_float),
    )
    return idx[:count], sims[:count]


def internal_edge_mask_native(
    boxes: np.ndarray,
    cell_bounds,
    image_width: float,
    image_height: float,
    threshold: float,
) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float64).reshape(-1, 4)
    cell = np.asarray(cell_bounds, np.float64)
    out = np.empty(boxes.shape[0], np.uint8)
    lib.internal_edge_mask(
        _ptr(boxes, ctypes.c_double), boxes.shape[0], _ptr(cell, ctypes.c_double),
        float(image_width), float(image_height), float(threshold),
        _ptr(out, ctypes.c_uint8),
    )
    return out.astype(bool)


class HnswIndex:
    """Native HNSW index over cosine space (``native/hnsw.cpp``) — the
    in-repo equivalent of the reference's hnswlib dependency
    (``deprecated_package/db_operations.py:28-33``: space=cosine, M=32,
    ef_construction=200, ef=200). Labels are insertion order (the store
    maps them to ids). Raises RuntimeError if the native library is
    unavailable — callers decide their fallback (the store falls back to
    its exact matmul+top-k path).
    """

    def __init__(
        self,
        dim: int,
        m: int = 32,
        ef_construction: int = 200,
        seed: int = 0,
    ):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable (no compiler?)")
        self._lib = lib
        self.dim = int(dim)
        self._handle = ctypes.c_void_p(
            lib.hnsw_new(self.dim, int(m), int(ef_construction), int(seed))
        )

    def __del__(self):  # pragma: no cover - interpreter teardown
        handle = getattr(self, "_handle", None)
        if handle:
            try:
                self._lib.hnsw_free(handle)
            except Exception:  # noqa: BLE001
                pass
            self._handle = None

    def __len__(self) -> int:
        return int(self._lib.hnsw_size(self._handle))

    def add(self, vectors: np.ndarray) -> None:
        """Append rows (n, dim); normalized into the index (cosine)."""
        vecs = np.ascontiguousarray(vectors, np.float32)
        if vecs.ndim == 1:
            vecs = vecs[None]
        assert vecs.shape[1] == self.dim, vecs.shape
        self._lib.hnsw_add(
            self._handle, _ptr(vecs, ctypes.c_float), vecs.shape[0]
        )

    def search(
        self,
        queries: np.ndarray,
        k: int,
        ef: int = 200,
        mask: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Filtered k-NN: returns (indices, cosine distances), each
        (nq, k); missing results are (-1, inf) padded (fewer than k nodes
        matching the mask)."""
        q = np.ascontiguousarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        assert q.shape[1] == self.dim, q.shape
        nq = q.shape[0]
        idx = np.empty((nq, k), np.int64)
        dist = np.empty((nq, k), np.float32)
        mask_ptr = None
        if mask is not None:
            mask = np.ascontiguousarray(mask, np.uint8)
            assert mask.shape[0] == len(self), (mask.shape, len(self))
            mask_ptr = _ptr(mask, ctypes.c_uint8)
        self._lib.hnsw_search(
            self._handle, _ptr(q, ctypes.c_float), nq, int(k),
            int(max(ef, k)), mask_ptr, _ptr(idx, ctypes.c_int64),
            _ptr(dist, ctypes.c_float),
        )
        return idx, dist
