"""Native (C++) ingest runtime vs golden semantics and the NumPy fallback."""

import numpy as np
import pytest

from audio_triangulation_tpu.runtime import native_rt
from audio_triangulation_tpu.utils import golden


def _stream_with_burst(rng, t_len=4000, burst_at=1800, amp=90):
    streams = rng.integers(127, 130, size=(3, t_len))
    n = 400
    burst = amp * np.sin(np.linspace(0, 50, n)) * np.hanning(n)
    for m in range(3):
        streams[m, burst_at: burst_at + n] = np.clip(
            streams[m, burst_at: burst_at + n] + burst, 0, 255)
    return streams.astype(np.int16)


def test_native_builds():
    assert native_rt.native_available(), "g++ build of libatrt.so failed"


@pytest.mark.parametrize("impl", ["native", "python"])
def test_trigger_matches_golden(impl, rng):
    streams = _stream_with_burst(rng)
    gp = golden.GoldenPipeline()
    ref_idx = gp.detect_index(streams.astype(np.uint8))
    assert ref_idx is not None
    ref_frame = np.stack([
        np.concatenate([r.buffer[r.head:], r.buffer[: r.head]])
        for r in gp.rings])

    rt = (native_rt.NativeIngestRuntime(3) if impl == "native"
          else native_rt.PyIngestRuntime(3))
    n_events = rt.push(streams.T)  # [T, 3]
    assert n_events == 1
    frames, stamp = rt.poll()
    assert stamp == ref_idx
    np.testing.assert_array_equal(frames, ref_frame)
    assert rt.poll() is None
    rt.close()


def test_native_matches_python_on_multiple_events(rng):
    s1 = _stream_with_burst(rng, burst_at=1500)
    s2 = _stream_with_burst(rng, burst_at=2000)
    streams = np.concatenate([s1, s2], axis=1)

    rt_n = native_rt.NativeIngestRuntime(3)
    rt_p = native_rt.PyIngestRuntime(3)
    rt_n.push(streams.T)
    rt_p.push(streams.T)
    assert rt_n.events_detected == rt_p.events_detected >= 2
    while True:
        a, b = rt_n.poll(), rt_p.poll()
        assert (a is None) == (b is None)
        if a is None:
            break
        np.testing.assert_array_equal(a[0], b[0])
        assert a[1] == b[1]
    rt_n.close()


def test_chunked_push_equals_bulk(rng):
    streams = _stream_with_burst(rng)
    rt_a = native_rt.NativeIngestRuntime(3)
    rt_b = native_rt.NativeIngestRuntime(3)
    rt_a.push(streams.T)
    for i in range(0, streams.shape[1], 128):
        rt_b.push(streams.T[i: i + 128])
    ea, eb = rt_a.poll(), rt_b.poll()
    assert ea is not None and eb is not None
    np.testing.assert_array_equal(ea[0], eb[0])
    assert ea[1] == eb[1]


def test_powers_observability(rng):
    streams = rng.integers(127, 130, size=(2000, 3)).astype(np.int16)
    rt = native_rt.NativeIngestRuntime(3)
    rt.push(streams)
    inc, out = rt.powers()
    assert inc.shape == (3,)
    # int64-exact vs one golden ring
    gr = golden.RollingBuffer()
    for t in range(streams.shape[0]):
        gr.push(int(streams[t, 0]))
    assert inc[0] == gr.get_incoming_power()
    assert out[0] == gr.get_outgoing_power()
    rt.close()


def test_factory():
    rt = native_rt.create_ingest_runtime(4, frame_size=512)
    assert rt.frame_size == 512
    rt.close()


def test_threaded_producer_consumer(rng):
    """Concurrency correctness of the SPSC event queue: a producer thread
    pushes while the main thread polls (the runtime's intended topology)."""
    import threading

    streams = np.concatenate(
        [_stream_with_burst(rng, t_len=4000, burst_at=1500 + 300 * i)
         for i in range(4)], axis=-1)
    rt = native_rt.NativeIngestRuntime(3, queue_capacity=8)

    def producer():
        for i in range(0, streams.shape[1], 64):
            rt.push(streams.T[i: i + 64])

    th = threading.Thread(target=producer)
    th.start()
    events = []
    while True:
        ev = rt.poll()
        if ev is not None:
            events.append(ev)
        elif not th.is_alive():
            break
    th.join()
    # drain: the producer may have enqueued between our last empty poll
    # and the liveness check (the r4 load-induced flake — a racy test
    # assertion, not a queue race; join() gives the happens-before edge
    # that makes the counter reads and the final drain exact)
    while (ev := rt.poll()) is not None:
        events.append(ev)
    assert len(events) == rt.events_detected - rt.events_dropped
    assert len(events) >= 3
    # stamps strictly increasing, frames intact
    stamps = [e[1] for e in events]
    assert stamps == sorted(stamps)
    for frames, _ in events:
        assert frames.shape == (3, 1024)
    rt.close()


def test_fuzz_native_vs_python(rng):
    """Randomized streams and chunkings: the C++ and NumPy runtimes must
    agree exactly on every event."""
    for trial in range(4):
        t_len = int(rng.integers(3000, 9000))
        streams = rng.integers(120, 140, size=(3, t_len)).astype(np.int16)
        # random loud segments
        for _ in range(int(rng.integers(0, 3))):
            at = int(rng.integers(0, t_len - 500))
            ln = int(rng.integers(200, 500))
            streams[:, at: at + ln] = np.clip(
                streams[:, at: at + ln]
                + rng.integers(-120, 120, size=(3, ln)), 0, 255)
        rt_n = native_rt.NativeIngestRuntime(3)
        rt_p = native_rt.PyIngestRuntime(3)
        i = 0
        while i < t_len:
            step = int(rng.integers(1, 700))
            rt_n.push(streams.T[i: i + step])
            rt_p.push(streams.T[i: i + step])
            i += step
        assert rt_n.events_detected == rt_p.events_detected, trial
        while True:
            a, b = rt_n.poll(), rt_p.poll()
            assert (a is None) == (b is None)
            if a is None:
                break
            np.testing.assert_array_equal(a[0], b[0])
            assert a[1] == b[1]
        rt_n.close()
