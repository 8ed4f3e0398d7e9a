"""Background host→device prefetch for the input pipeline.

The reference hides preprocessing behind 16 DataLoader workers
(config/super_resolution.yaml:15); here a single producer thread prepares
and device_puts the next batches while the chip runs the current step, so
host preprocessing overlaps device compute.
"""

from __future__ import annotations

import queue
import threading

import jax


def prefetch_to_device(iterator, size: int = 2, device=None):
    """Wrap a host batch iterator with an N-deep device-side prefetch queue."""
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = object()

    def producer():
        try:
            for batch in iterator:
                put = tuple(
                    jax.device_put(x, device) if hasattr(x, "shape") else x for x in batch
                )
                q.put(put)
        finally:
            q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
