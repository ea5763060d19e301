"""Host-side input prefetching.

The reference's input path is the torch DataLoader worker pool
(train_transformer_iqap.py:449-458).  Here batches are assembled by a
background thread (h5 gather + transforms overlap the device step) with a
bounded queue, so the accelerator never waits on the host during steady-state
training.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

__all__ = ["prefetch"]

_SENTINEL = object()


def prefetch(iterable: Iterable[Any], depth: int = 2) -> Iterator[Any]:
    """Yield items from ``iterable``, produced ahead of time by a daemon
    thread.  Exceptions in the producer re-raise at the consumer."""
    q: "queue.Queue[Any]" = queue.Queue(maxsize=depth)

    def producer() -> None:
        try:
            for item in iterable:
                q.put(item)
        except BaseException as exc:  # noqa: BLE001 — propagate to consumer
            q.put(exc)
            return
        q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
