"""Threaded data-loader: decode/prepare items ahead of device execution.

The reference's serving analogue is fully sequential — one image decoded,
one CUDA forward, repeat (``deprecated_package/embedder.py:104-137``
decodes inside the per-image loop). On a 1-vCPU TPU host that serializes
page decode (PIL, tens to hundreds of ms for large scans) with the device
program, leaving the chip idle during every decode and the host idle
during every execution.

``Prefetcher`` is the TPU-native fix: a bounded background thread maps
``fn`` over ``items`` ahead of the consumer, preserving order, so host
preprocessing of page N+1 overlaps device execution of page N. Combined
with JAX's async dispatch (the device call returns before the program
finishes) the serving loop becomes a 3-stage software pipeline:
decode (thread) → execute (device) → finalize (host).

Exceptions raised by ``fn`` are re-raised at the consumer site, tagged
with the offending item, at the position where the item would have been
yielded — the consumer's per-item try/except keeps its skip-on-error
semantics identical to the sequential loop.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Generic, Iterable, Iterator, Tuple, TypeVar

T = TypeVar("T")
R = TypeVar("R")

_SENTINEL = object()


class PrefetchError(RuntimeError):
    """Wraps an exception raised while prefetching one item."""

    def __init__(self, item, cause: BaseException):
        super().__init__(f"prefetch failed on {item!r}: {cause}")
        self.item = item
        self.cause = cause


class Prefetcher(Generic[T, R]):
    """Iterate ``(item, fn(item))`` with ``depth`` items prepared ahead.

    ``depth=2`` keeps one result buffered while the consumer holds
    another — enough to hide preparation latency without unbounded
    memory growth (each prepared page can be a full padded uint8 canvas).
    """

    def __init__(
        self,
        items: Iterable[T],
        fn: Callable[[T], R],
        depth: int = 2,
    ):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = False
        self._items = list(items)
        self._fn = fn
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        for item in self._items:
            if self._stop.is_set():
                break
            try:
                result = (item, self._fn(item), None)
            except BaseException as exc:  # noqa: BLE001 — re-raised at consumer
                result = (item, None, exc)
            # blocking put bounds memory; poll so close() can't deadlock a
            # producer stuck on a full queue
            while not self._stop.is_set():
                try:
                    self._queue.put(result, timeout=0.1)
                    break
                except queue.Full:
                    continue
        self._queue.put(_SENTINEL)

    def __iter__(self) -> Iterator[Tuple[T, R]]:
        return self

    def __next__(self) -> Tuple[T, R]:
        """Raises PrefetchError for a failed item; the stream stays
        consumable — the next ``next()`` yields the following item (a
        generator would close on raise, killing skip-on-error loops)."""
        if self._done:
            raise StopIteration
        entry = self._queue.get()
        if entry is _SENTINEL:
            self._done = True
            raise StopIteration
        item, result, exc = entry
        if exc is not None:
            raise PrefetchError(item, exc) from exc
        return item, result

    def close(self) -> None:
        """Stop the worker and drain; safe to call mid-iteration.
        Iteration after close() terminates (the drain may consume the
        sentinel, so __next__ must not block on an empty queue)."""
        self._done = True
        self._stop.set()
        while True:
            try:
                if self._queue.get_nowait() is _SENTINEL:
                    break
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)
