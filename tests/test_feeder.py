"""Async feeder: double-buffered transfers and the event->batch pump."""

import numpy as np
import jax

from audio_triangulation_tpu.runtime import native_rt
from audio_triangulation_tpu.runtime.feeder import DoubleBufferedFeeder, EventPump


def test_double_buffered_feeder_order(rng):
    batches = [rng.normal(size=(4, 8)).astype(np.float32) for _ in range(5)]
    out = list(DoubleBufferedFeeder(iter(batches)))
    assert len(out) == 5
    for a, b in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(a), b)
        assert isinstance(a, jax.Array)


def test_event_pump_batches(rng):
    rt = native_rt.create_ingest_runtime(3, frame_size=1024)
    # two events
    for burst_at in (1500, 1800):
        streams = rng.integers(127, 130, size=(3, 4000))
        n = 400
        burst = 90 * np.sin(np.linspace(0, 50, n)) * np.hanning(n)
        streams[:, burst_at: burst_at + n] += burst.astype(np.int64)
        rt.push(np.clip(streams, 0, 255).astype(np.int16).T)

    got = []

    def on_batch(arr, stamps, valid):
        got.append((np.asarray(arr), stamps, valid))

    pump = EventPump(rt, batch_size=4, on_batch=on_batch)
    n = pump.pump(flush=True)
    assert n == 1
    arr, stamps, valid = got[0]
    assert arr.shape == (4, 3, 1024)
    assert valid.sum() == rt.events_detected
    rt.close()


def test_feeder_propagates_producer_errors():
    import pytest

    def bad_gen():
        yield np.zeros((2, 2), np.float32)
        raise RuntimeError("producer died")

    feeder = DoubleBufferedFeeder(bad_gen())
    it = iter(feeder)
    next(it)
    with pytest.raises(RuntimeError, match="producer died"):
        for _ in it:
            pass
