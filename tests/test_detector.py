"""Vectorized detector vs the golden sequential ring-buffer semantics."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.ops import detector
from audio_triangulation_tpu.utils import golden

CFG = PipelineConfig()


def _stream_with_burst(rng, t_len=3000, burst_at=1500, amp=90):
    """3-mic uint8 streams: quiet DC + a loud burst (as the ADC would see).

    Base noise must stay small: the detector statistic is 512*sum(x^2)-sum^2
    over 512-sample halves, so noise at +-8 LSB (~var 21) produces half-window
    power ~5.6M >> the 524288 threshold and random triggers — by design, the
    reference would behave identically (sample_compute.h:89)."""
    streams = rng.integers(127, 130, size=(3, t_len))
    n = 400
    burst = amp * np.sin(np.linspace(0, 50, n)) * np.hanning(n)
    for m in range(3):
        streams[m, burst_at: burst_at + n] = np.clip(
            streams[m, burst_at: burst_at + n] + burst, 0, 255)
    return streams.astype(np.uint8)


def test_powers_match_golden_ring(rng):
    streams = _stream_with_burst(rng, t_len=2200)
    inc, out = detector.half_window_powers(
        jnp.asarray(streams.astype(np.int64)), CFG.frame_size)
    inc, out = np.asarray(inc), np.asarray(out)

    rb = golden.RollingBuffer()
    for t in range(streams.shape[1]):
        rb.push(int(streams[0, t]))
        if rb.is_full:
            assert inc[0, t] == rb.get_incoming_power(), t
            assert out[0, t] == rb.get_outgoing_power(), t


def test_first_trigger_matches_golden_pipeline(rng):
    streams = _stream_with_burst(rng)
    gp = golden.GoldenPipeline()
    ref_idx = gp.detect_index(streams)
    assert ref_idx is not None

    idx, found = detector.first_trigger(
        jnp.asarray(streams.astype(np.int64))[None], CFG)
    assert bool(found[0])
    assert int(idx[0]) == ref_idx


def test_no_trigger_on_quiet_stream(rng):
    streams = rng.integers(126, 130, size=(1, 3, 2500)).astype(np.int64)
    idx, found = detector.first_trigger(jnp.asarray(streams), CFG)
    assert not bool(found[0])


def test_extract_frames_matches_ring_contents(rng):
    streams = _stream_with_burst(rng)
    gp = golden.GoldenPipeline()
    ref_idx = gp.detect_index(streams)
    # golden ring now holds the frame; write it out (pre-DC-removal ring order)
    ring0 = np.concatenate([
        gp.rings[0].buffer[gp.rings[0].head:],
        gp.rings[0].buffer[: gp.rings[0].head]])

    frames = detector.extract_frames_at(
        jnp.asarray(streams.astype(np.int64))[None],
        jnp.asarray([ref_idx]), CFG.frame_size)
    np.testing.assert_array_equal(np.asarray(frames)[0, 0], ring0)


def test_multiple_triggers_with_refractory(rng):
    streams = np.concatenate([
        _stream_with_burst(rng, t_len=3000, burst_at=1300),
        _stream_with_burst(rng, t_len=3000, burst_at=1500),
    ], axis=-1)
    idxs, valid = detector.all_triggers_capped(
        jnp.asarray(streams.astype(np.int64))[None], CFG, max_events=3)
    idxs, valid = np.asarray(idxs)[0], np.asarray(valid)[0]
    assert valid[0] and valid[1]
    assert idxs[1] - idxs[0] >= CFG.frame_size
    # first trigger near the first burst's tail entering the outgoing half
    assert 1300 < idxs[0] < 3000
    assert 4300 < idxs[1] < 6000


def test_trigger_position_semantics(rng):
    """Trigger fires when the transient sits in the OUTGOING (older) half:
    roughly burst_end + half frame later."""
    burst_at, burst_len = 1500, 400
    streams = _stream_with_burst(rng, burst_at=burst_at)
    idx, found = detector.first_trigger(
        jnp.asarray(streams.astype(np.int64))[None], CFG)
    t = int(idx[0])
    assert bool(found[0])
    assert burst_at + burst_len < t < burst_at + burst_len + CFG.frame_size


def test_parametric_frame_size_matches_golden(rng):
    """The reference supports any BUFFER_SIZE_BITS (buffer.h:5-6); our
    detector and conditioning must bit-match the golden ring at other sizes."""
    import jax.numpy as jnp

    from audio_triangulation_tpu.ops import conditioning
    from audio_triangulation_tpu.ops import window as window_ops

    for bits in (8, 9, 11):
        n = 1 << bits
        cfg = PipelineConfig(frame_size_bits=bits)
        stream = rng.integers(0, 256, size=3 * n).astype(np.int64)
        inc, out = detector.half_window_powers(
            jnp.asarray(stream)[None], n)
        inc, out = np.asarray(inc)[0], np.asarray(out)[0]
        rb = golden.RollingBuffer(size_bits=bits)
        for t in range(stream.shape[0]):
            rb.push(int(stream[t]))
            if rb.is_full:
                assert inc[t] == rb.get_incoming_power(), (bits, t)
                assert out[t] == rb.get_outgoing_power(), (bits, t)

        # write-out + conditioning parity at this size
        frame, power = rb.write_out()
        start = stream.shape[0] - n
        ours = np.asarray(conditioning.dc_remove_int(
            jnp.asarray(stream[start:].astype(np.int16))[None], bits))[0]
        np.testing.assert_array_equal(ours, frame)

        # Q15 window strides the 1024 table (buffer.c:8 semantics)
        table = golden.window_table_q15()
        ref_w = golden.apply_window(frame, table)
        got_w = np.asarray(window_ops.apply_window_q15(
            jnp.asarray(frame)[None],
            jnp.asarray(table[np.arange(n) * (1024 // n)])))[0]
        np.testing.assert_array_equal(got_w, ref_w)
