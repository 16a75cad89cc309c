"""Host-side prefetch: overlap image decode/augmentation with device compute.

The reference relies on torch DataLoader workers (only in its vendored
trainer, run_lib_pytorch.py:85-88); the live pipeline decodes synchronously.
Here a background thread keeps a bounded queue of ready batches so the
accelerator never waits on PIL decode — the host/device pipeline analogue
of grain/tf.data prefetch.

The consumer may stop early (e.g. the trainer's ``max_iters_per_epoch``
break): the generator's ``finally`` signals the producer thread to exit, so
no thread or queued-batch memory leaks across epochs.
"""

from __future__ import annotations

import queue
import threading


class PrefetchIterator:
    """Wrap any batch iterable with an N-deep background prefetch queue."""

    _SENTINEL = object()

    def __init__(self, iterable, depth: int = 2):
        self._iterable = iterable
        self._depth = depth

    def __len__(self):
        return len(self._iterable)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        stop = threading.Event()
        err: list = []

        def _put(item) -> bool:
            """put() that gives up when the consumer has gone away."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self._iterable:
                    if not _put(item):
                        return
            except BaseException as exc:  # propagate to the consumer
                err.append(exc)
            finally:
                _put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # consumer exited (normally or via break/exception): release the
            # producer, which is possibly blocked on a full queue
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def prefetch(loader, depth: int = 2):
    """Wrap a dataset/loader (or a dict of them) with background prefetch."""
    if isinstance(loader, dict):
        return {
            k: (PrefetchIterator(v, depth) if v is not None else None)
            for k, v in loader.items()
        }
    return PrefetchIterator(loader, depth)
