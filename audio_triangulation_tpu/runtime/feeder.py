"""Asynchronous host->device feeding: the chained-DMA analogue.

The reference arms two chained DMA channels once and the ADC then streams
into memory with zero CPU forever (``src/components/dma_sampler.c:28-55``).
The TPU-host equivalent: JAX dispatch is already asynchronous, so the device
computes batch k while the host prepares batch k+1; this module adds the
explicit double-buffered transfer thread so H2D copies of batch k+1 overlap
the device compute of batch k, and the event-driven pump that connects the
native ingest runtime's event queue to batched device inference.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import numpy as np
import jax


class DoubleBufferedFeeder:
    """Iterate device-resident batches with transfer/compute overlap.

    >>> for dev_batch in DoubleBufferedFeeder(host_batches, device):
    ...     out = step(dev_batch)   # H2D of the next batch overlaps this
    """

    def __init__(self, batches: Iterable, device=None, depth: int = 2):
        self._it = iter(batches)
        self._device = device or jax.devices()[0]
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._error = None
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _pump(self):
        try:
            for b in self._it:
                self._q.put(jax.device_put(b, self._device))
        except BaseException as e:  # surfaced to the consumer, not swallowed
            self._error = e
        finally:
            self._q.put(self._done)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._done:
                if self._error is not None:
                    raise self._error
                return
            yield item


class EventPump:
    """Drain an ingest runtime's event queue into fixed-size device batches.

    The cooperative pipeline<->render handoff of the reference (two counting
    semaphores, ``sample_compute.h:142-145``) becomes: ingest thread pushes
    events; this pump assembles [batch, M, N] arrays (padding the tail batch
    by repeating the last event, with a validity mask) and hands them to a
    callback running device inference."""

    def __init__(self, runtime, batch_size: int = 64,
                 on_batch: Optional[Callable] = None, device=None):
        self.runtime = runtime
        self.batch_size = batch_size
        self.on_batch = on_batch
        self._device = device or jax.devices()[0]
        self._pending: list[np.ndarray] = []
        self._stamps: list[int] = []

    def pump(self, flush: bool = False) -> int:
        """Poll all queued events; emit full batches (all batches when
        ``flush``).  Returns number of batches emitted."""
        while True:
            ev = self.runtime.poll()
            if ev is None:
                break
            frames, stamp = ev
            self._pending.append(frames)
            self._stamps.append(stamp)

        emitted = 0
        while len(self._pending) >= self.batch_size or (
            flush and self._pending
        ):
            take = min(self.batch_size, len(self._pending))
            batch = self._pending[:take]
            stamps = self._stamps[:take]
            del self._pending[:take], self._stamps[:take]
            valid = np.zeros(self.batch_size, bool)
            valid[:take] = True
            while len(batch) < self.batch_size:
                batch.append(batch[-1])
                stamps.append(stamps[-1])
            arr = jax.device_put(
                np.stack(batch).astype(np.float32), self._device)
            if self.on_batch is not None:
                self.on_batch(arr, np.asarray(stamps), valid)
            emitted += 1
        return emitted
