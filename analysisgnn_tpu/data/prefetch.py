"""Background-thread batch prefetching.

The host-side sampler runs on CPU while the device computes; overlapping the
two (the role of torch DataLoader workers in the reference,
train_analysisgnn.py:60) is a bounded-queue producer thread.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterator: Iterator[T], buffer_size: int = 2) -> Iterator[T]:
    """Wrap an iterator so its work happens on a background thread."""
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    err: list = []

    def producer():
        try:
            for item in iterator:
                q.put(item)
        except Exception as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item


def prefetch_calls(fn: Callable[[], T], steps: int, buffer_size: int = 2) -> Iterator[T]:
    """Prefetch ``steps`` results of repeatedly calling ``fn``."""
    def gen():
        for _ in range(steps):
            yield fn()

    return prefetch(gen(), buffer_size)
