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
import jax.numpy as jnp


@jax.jit
def _normalize_uint8(x, denom):
    # denom is a traced ARGUMENT, not a constant: XLA rewrites division by a
    # constant into a 1-ulp-off reciprocal multiply; dividing by a traced
    # scalar keeps the true IEEE divide (asserted bit-identical in
    # tests/test_data_pipeline.py::test_uint8_transport_bit_identical)
    return x.astype(jnp.float32) / denom


def normalize_uint8(x):
    """Device-side inverse of resize_quantized's uint8 transport: bit-
    identical to the host resize_normalize float (the same uint8 values
    divided by the same f32 constant; the {0,255} mask channel lands
    exactly on 0.0/1.0).  Kept as its OWN tiny jit so serving graphs keep
    their compile-cache entries (fusing it into sr_forward would change the
    flagship HLO)."""
    return _normalize_uint8(x, jnp.float32(255.0))


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
