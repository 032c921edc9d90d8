"""Two-rate serving (detect every chunk, localize at event rate) must agree
with the dense vmapped stream_step path on identical inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu import PipelineConfig, geometry
from audio_triangulation_tpu.core.config import StreamConfig
from audio_triangulation_tpu.models.streaming import (
    StreamingLocalizer, TwoRateStreamingLocalizer)
from audio_triangulation_tpu.utils import synth

MICS = geometry.square_array(0.3)
CFG = PipelineConfig(fft_pad_mode="circular")
SC = StreamConfig(chunk_size=512)


def _streams(n_streams=6, t=4096, burst_streams=(1, 4), seed=0,
             stagger=300):
    """Silence everywhere except a synthetic burst in selected streams."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_streams, 4, t)).astype(np.float32) * 0.001
    src = np.array([0.5, -0.4, 1.2])
    src = src / np.linalg.norm(src) * 1.2
    frame = np.asarray(synth.synth_scene(src, MICS, noise_rms=0.01,
                                         seed=3))[0]  # [4, 1024]
    for i, s in enumerate(burst_streams):
        at = 1500 + stagger * i
        base[s, :, at:at + 1024] += frame * 30
    return base


def test_tworate_matches_dense_states():
    streams = _streams()
    s_count, _, t = streams.shape
    dense = StreamingLocalizer.create(MICS, CFG, stream=SC, with_solver=True)
    tworate = TwoRateStreamingLocalizer.create(
        MICS, CFG, stream=SC, event_capacity=4, with_solver=True)

    st_d = dense.init_states(s_count)
    st_t = tworate.init_states(s_count)
    c = SC.chunk_size
    got_xy = {}
    dense_xy = {}
    for i in range(0, t, c):
        chunk = jnp.asarray(streams[:, :, i:i + c])
        st_d, out_d = dense.step_many(st_d, chunk)
        st_t, det = tworate.detect_many(st_t, chunk)
        trig = np.asarray(det["triggered"])
        assert trig.shape == (s_count,)
        if trig.any():
            st_t, ev = tworate.localize_triggered(st_t, det)
            acc = np.asarray(ev["accepted"])
            idx = np.asarray(ev["stream_idx"])
            for slot in np.nonzero(acc)[0]:
                got_xy[int(idx[slot])] = np.asarray(ev["xy"])[slot]
            assert int(ev["overflow"]) == 0
        for s in np.nonzero(np.asarray(out_d["event"]))[0]:
            dense_xy[int(s)] = np.asarray(out_d["xy"])[s]

    # identical carried state (EMA, clocks, counters) stream by stream;
    # the burst runs at different batch shapes (vmapped-per-stream vs
    # compacted batch), so float tolerance rather than bit equality
    np.testing.assert_allclose(
        np.asarray(st_d.ema_corr), np.asarray(st_t.ema_corr),
        rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(st_d.event_count), np.asarray(st_t.event_count))
    np.testing.assert_allclose(
        np.asarray(st_d.last_event_s), np.asarray(st_t.last_event_s))
    np.testing.assert_array_equal(
        np.asarray(st_d.suppress), np.asarray(st_t.suppress))
    np.testing.assert_allclose(
        np.asarray(st_d.context), np.asarray(st_t.context))

    # both saw events on exactly the burst streams, with matching positions
    assert set(got_xy) == set(dense_xy) == {1, 4}
    for s in got_xy:
        np.testing.assert_allclose(got_xy[s], dense_xy[s], atol=1e-4)


def test_tworate_overflow_accounting():
    # simultaneous bursts (stagger 0) so all four trigger in the same chunk
    streams = _streams(n_streams=5, burst_streams=(0, 1, 2, 3), seed=2,
                       stagger=0)
    tworate = TwoRateStreamingLocalizer.create(
        MICS, CFG, stream=SC, event_capacity=2, with_solver=False)
    st = tworate.init_states(5)
    c = SC.chunk_size
    overflowed = 0
    for i in range(0, streams.shape[-1], c):
        st, det = tworate.detect_many(st, jnp.asarray(streams[:, :, i:i + c]))
        if np.asarray(det["triggered"]).any():
            st, ev = tworate.localize_triggered(st, det)
            overflowed += int(ev["overflow"])
            # capacity slots are filled triggered-first
            trig = np.asarray(ev["triggered"])
            assert trig.shape == (2,)
    # four near-simultaneous bursts, capacity 2 -> someone overflowed
    assert overflowed > 0


def test_tworate_with_audio_extracts_waveform():
    """with_audio=True: localize_triggered also returns the beamformed
    source waveform of each accepted event."""
    from audio_triangulation_tpu.utils.synth import chirp_burst

    streams = _streams(n_streams=4, burst_streams=(2,), seed=5)
    tworate = TwoRateStreamingLocalizer.create(
        MICS, CFG, stream=SC, event_capacity=2, with_solver=True,
        with_audio=True)
    st = tworate.init_states(4)
    c = SC.chunk_size
    sig = chirp_burst(1024, CFG.sample_rate_hz)
    got = None
    for i in range(0, streams.shape[-1], c):
        st, det = tworate.detect_many(st, jnp.asarray(streams[:, :, i:i + c]))
        if np.asarray(det["triggered"]).any():
            st, ev = tworate.localize_triggered(st, det)
            acc = np.asarray(ev["accepted"])
            if acc.any():
                got = np.asarray(ev["audio"])[np.argmax(acc)]
    assert got is not None and got.shape == (CFG.frame_size,)
    # extracted waveform correlates strongly with the emitted burst
    a = got - got.mean()
    b = sig - sig.mean()
    cc = np.correlate(a, b, mode="full")
    corr = np.max(np.abs(cc)) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.8, corr
