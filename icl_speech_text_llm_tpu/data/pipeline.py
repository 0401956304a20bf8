"""Host-side prefetch pipeline.

The reference feeds the GPU with torch DataLoader worker processes
(ref: train/train.py:338-365 — workers/prefetch_factor/pin_memory). The
TPU-native equivalent: a background thread (or threads) builds PackedBatches
ahead of device dispatch so collation/tokenization overlaps device compute.
Python-level threading suffices because the hot host loops (audio packing)
release the GIL inside the native runtime (runtime/iclrt.cc).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Callable, Iterator, Optional

logger = logging.getLogger(__name__)

_SENTINEL = object()


class PrefetchIterator:
    """Wrap a batch iterator with an N-deep background prefetch queue."""

    def __init__(self, make_iterator: Callable[[], Iterator], depth: int = 2):
        self._make_iterator = make_iterator
        self._depth = depth
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._make_iterator():
                self._queue.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._error = e
        finally:
            self._queue.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch_batches(dataset, batch_size: int, tokenizer, pack_cfg, depth: int = 2):
    """Prefetched equivalent of training.loop.iter_batches."""
    from ..training.loop import iter_batches

    return PrefetchIterator(
        lambda: iter_batches(dataset, batch_size, tokenizer, pack_cfg), depth=depth
    )
