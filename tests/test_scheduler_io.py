"""Cooperative scheduler (protothreads parity) and WAV I/O."""

import numpy as np

from audio_triangulation_tpu.runtime.scheduler import Scheduler, Semaphore
from audio_triangulation_tpu.utils import io as audio_io


def test_producer_consumer_rendezvous():
    """The reference's pipeline<->VGA handoff pattern: two counting
    semaphores serializing access (sample_compute.h:142-145)."""
    data_ready = Semaphore()
    buffer_free = Semaphore(1)
    log = []

    def pipeline():
        for i in range(3):
            yield buffer_free.wait()
            log.append(f"produce{i}")
            data_ready.signal()
            yield

    def render():
        for i in range(3):
            yield data_ready.wait()
            log.append(f"render{i}")
            buffer_free.signal()
            yield

    s = Scheduler()
    s.add("pipeline", pipeline())
    s.add("render", render())
    s.run(max_rounds=50)
    # strict alternation
    assert log == ["produce0", "render0", "produce1", "render1",
                   "produce2", "render2"]
    assert "pipeline" in s.stats_report()


def test_priority_mode_orders_tasks():
    order = []

    def t(name):
        order.append(name)
        yield

    s = Scheduler(priority_mode=True)
    s.add("low", t("low"), priority=5)
    s.add("high", t("high"), priority=0)
    s.round()
    assert order == ["high", "low"]


def test_wav_roundtrip_int16(tmp_path, rng):
    x = rng.integers(-30000, 30000, size=(3, 500)).astype(np.int16)
    p = str(tmp_path / "t.wav")
    audio_io.write_wav(p, x, 50_000)
    y, rate = audio_io.read_wav(p)
    assert rate == 50_000
    np.testing.assert_array_equal(x, y)


def test_wav_roundtrip_uint8(tmp_path, rng):
    x = rng.integers(0, 255, size=(3, 400)).astype(np.uint8)
    p = str(tmp_path / "t8.wav")
    audio_io.write_wav(p, x, 48_000)
    y, rate = audio_io.read_wav(p)
    assert y.dtype == np.uint8
    np.testing.assert_array_equal(x, y)


def test_wav_float_written_as_int16(tmp_path, rng):
    x = rng.uniform(-1, 1, size=(2, 300))
    p = str(tmp_path / "tf.wav")
    audio_io.write_wav(p, x, 16_000)
    y, _ = audio_io.read_wav(p)
    np.testing.assert_allclose(y / 32767.0, x, atol=1e-4)


def test_wav_24bit_and_32bit_paths(tmp_path, rng):
    """Hand-written 24/32-bit WAVs decode through the narrowing paths."""
    import struct
    import wave

    # 24-bit: write raw frames manually
    x = rng.integers(-2**23, 2**23 - 1, size=(1, 64)).astype(np.int32)
    p = str(tmp_path / "t24.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(48000)
        raw = b"".join(
            struct.pack("<i", int(v))[:3] for v in x[0])
        w.writeframes(raw)
    y, rate = audio_io.read_wav(p)
    np.testing.assert_array_equal(y[0], (x[0] >> 8).astype(np.int16))

    # 32-bit
    p32 = str(tmp_path / "t32.wav")
    with wave.open(p32, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(48000)
        w.writeframes((x[0] << 8).astype(np.int32).tobytes())
    y32, _ = audio_io.read_wav(p32)
    np.testing.assert_array_equal(y32[0], ((x[0] << 8) >> 16).astype(np.int16))
