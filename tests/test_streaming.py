"""Streaming localizer: chunked steps vs offline processing; EMA behavior."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import StreamConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.streaming import StreamingLocalizer
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()


def _place(x, y, h=1.2):
    p = np.array([x, y, h], np.float64)
    return np.array([x, y]), p * (h / np.linalg.norm(p))


def _quiet_stream_with_event(source, t_len=8000, event_at=3000, seed=0):
    """[M, T] uint8 stream: quiet DC + an event burst from ``source``."""
    rng = np.random.default_rng(seed)
    frames = synth.synth_scene(source, MICS, noise_rms=0.0, seed=seed)[0]
    streams = rng.integers(127, 130, size=(3, t_len)).astype(np.float64)
    streams[:, event_at: event_at + 1024] += 110.0 * frames
    return np.clip(np.round(streams), 0, 255)


def test_stream_detects_and_localizes_event():
    plane, source = _place(0.8, 0.5)
    streams = _quiet_stream_with_event(source)
    sl = StreamingLocalizer.create(MICS, stream=StreamConfig(chunk_size=512))
    state, outs = sl.run(streams)

    events = [o for o in outs if o["event"]]
    assert len(events) >= 1
    assert int(state.event_count) >= 1
    # after the event, grid peak near the true plane position
    xy = events[-1]["xy_grid"]
    assert np.linalg.norm(xy - plane) < 0.25, (xy, plane)


def test_stream_quiet_produces_no_events():
    rng = np.random.default_rng(5)
    streams = rng.integers(127, 130, size=(3, 6000)).astype(np.float64)
    sl = StreamingLocalizer.create(MICS, stream=StreamConfig(chunk_size=512))
    state, outs = sl.run(streams)
    assert int(state.event_count) == 0
    assert not any(o["event"] for o in outs)


def test_stream_refractory_after_event():
    """Triggers within a frame of a previous trigger are suppressed
    (the reference re-inits its rings after each capture)."""
    plane, source = _place(0.3, 0.6)
    streams = _quiet_stream_with_event(source, t_len=12000, event_at=3000)
    # a second event right after the first
    frames2 = synth.synth_scene(source, MICS, noise_rms=0.0, seed=9)[0]
    streams[:, 4200: 4200 + 1024] += 110.0 * frames2
    streams = np.clip(streams, 0, 255)

    sl = StreamingLocalizer.create(MICS, stream=StreamConfig(chunk_size=512))
    state, outs = sl.run(streams)
    trig = [int(o["trigger_abs"]) for o in outs if o["triggered"]]
    for a, b in zip(trig, trig[1:]):
        assert b - a >= 1024, trig


def test_ema_accumulates_over_events():
    plane, source = _place(-0.5, 0.7)
    sl = StreamingLocalizer.create(MICS, stream=StreamConfig(chunk_size=512))
    state = sl.init_state()
    for seed in range(3):
        streams = _quiet_stream_with_event(source, t_len=6000, seed=seed)
        for i in range(0, 6000, 512):
            state, out = sl(state, jnp.asarray(streams[:, i: i + 512]))
    assert int(state.event_count) >= 2
    # smoothed correlograms are nonzero and peak where expected
    ema = np.asarray(state.ema_corr)
    assert np.abs(ema).max() > 0
    xy = np.asarray(out["xy_grid"])
    assert np.linalg.norm(xy - plane) < 0.25, (xy, plane)


def test_step_many_stream_chunking_matches_unchunked():
    """step_many's sub-batch lax.map path (batch_chunk_streams, the fix
    for the >1,024-stream VMEM-spill cliff) must agree with the single
    vmapped program — including the zero-padded remainder sub-batch."""
    mk = lambda cs: StreamingLocalizer.create(  # noqa: E731
        MICS, stream=StreamConfig(chunk_size=512, batch_chunk_streams=cs))
    sl_chunked, sl_plain = mk(2), mk(None)

    planes_sources = [_place(0.8, 0.5), _place(-0.4, 0.7), _place(0.2, -0.9)]
    streams = np.stack([
        _quiet_stream_with_event(src, t_len=4096, event_at=1500 + 300 * i,
                                 seed=40 + i)
        for i, (_, src) in enumerate(planes_sources)
    ])  # 3 streams -> one full sub-batch of 2 + a padded remainder of 1
    # (3 streams also lets the plain program share its compile with
    # test_batched_streams_match_single's [3, ...] shapes)

    st_c, st_p = sl_chunked.init_states(3), sl_plain.init_states(3)
    for i in range(0, 4096, 512):
        chunk = jnp.asarray(streams[:, :, i: i + 512], jnp.float32)
        st_c, out_c = sl_chunked.step_many(st_c, chunk)
        st_p, out_p = sl_plain.step_many(st_p, chunk)
        np.testing.assert_array_equal(np.asarray(out_c["trigger_abs"]),
                                      np.asarray(out_p["trigger_abs"]))
        np.testing.assert_allclose(np.asarray(out_c["xy"]),
                                   np.asarray(out_p["xy"]),
                                   rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_c.event_count),
                                  np.asarray(st_p.event_count))
    assert int(np.asarray(st_p.event_count).sum()) >= 3


def test_batched_streams_match_single():
    """vmapped multi-stream stepping == per-stream stepping."""
    sl = StreamingLocalizer.create(MICS, stream=StreamConfig(chunk_size=512))
    planes_sources = [_place(0.8, 0.5), _place(-0.4, 0.7), _place(0.2, -0.9)]
    streams = np.stack([
        _quiet_stream_with_event(src, t_len=6144, event_at=2000 + 700 * i,
                                 seed=10 + i)
        for i, (_, src) in enumerate(planes_sources)
    ])  # [S, M, T]

    # batched
    states = sl.init_states(3)
    batched_events = []
    for i in range(0, 6144, 512):
        states, out = sl.step_many(
            states, jnp.asarray(streams[:, :, i: i + 512], jnp.float32))
        batched_events.append(np.asarray(out["trigger_abs"]))
    batched_counts = np.asarray(states.event_count)

    # single-stream references
    for s in range(3):
        st, outs = sl.run(streams[s])
        assert int(st.event_count) == batched_counts[s]
        single_triggers = [int(o["trigger_abs"]) for o in outs
                           if o["triggered"]]
        batched_triggers = [int(ev[s]) for ev in batched_events
                            if ev[s] >= 0]
        assert single_triggers == batched_triggers


def test_ema_dt_bookkeeping_matches_manual():
    """The stream's EMA must use the REAL inter-event time (trigger-to-
    trigger, correlations.c:40-43), not the chunk cadence.  Verified against
    a hand-computed float EMA over events at known sample positions."""
    import jax

    from audio_triangulation_tpu.models import localizer as L
    from audio_triangulation_tpu.ops import xcorr

    sl = StreamingLocalizer.create(MICS, stream=StreamConfig(chunk_size=500))
    plane, source = _place(0.6, 0.4)
    event_pos = [2500, 7000, 13000]
    t_len = 16000
    rng = np.random.default_rng(55)
    streams = rng.integers(127, 130, size=(3, t_len)).astype(np.float64)
    for i, at in enumerate(event_pos):
        fr = synth.synth_scene(source, MICS, noise_rms=0.0, seed=50 + i)[0]
        streams[:, at: at + 1024] += 110.0 * fr
    streams = np.clip(np.round(streams), 0, 255)

    state, outs = sl.run(streams)
    triggers = [int(o["trigger_abs"]) for o in outs if o["triggered"]]
    assert len(triggers) == 3

    # manual float EMA with the same triggers
    fs = 50_000.0
    ema = np.zeros((3, 93), np.float32)
    last_t = 0.0
    for trig in triggers:
        start = trig - 1023
        frame = jnp.asarray(streams[:, start: start + 1024],
                            jnp.float32)[None]
        x = L.condition_frames(frame, sl.params.window, sl.pipeline)
        corr = L.correlate_frames(x, sl.params, sl.pipeline)[0]
        shifts = xcorr.best_lag(corr, 46)
        corr_t = np.asarray(xcorr.peak_taper(corr, 46, 36.0, shifts))
        t_ev = (trig + 1) / fs
        decay = 1.0 - np.exp(-(t_ev - last_t) / 0.5)
        ema = ema + (corr_t - ema) * np.float32(decay)
        last_t = t_ev
    np.testing.assert_allclose(
        np.asarray(state.ema_corr), ema, rtol=2e-4, atol=2e-2)


def test_step_many_under_enclosing_jit_falls_back():
    """step_many called inside a user's jit must detect the trace and use
    the plain vmapped program (dispatch-level sub-batching needs host
    control; inlining the split/concat would re-create the spill the
    feature fixes) — and the result must match the host chunked path."""
    import jax

    sl = StreamingLocalizer.create(
        MICS, stream=StreamConfig(chunk_size=512, batch_chunk_streams=2))
    sources = [_place(0.5, 0.4), _place(-0.3, 0.6), _place(0.7, -0.2)]
    streams = np.stack([
        _quiet_stream_with_event(src, t_len=4096, event_at=1500 + 250 * i,
                                 seed=90 + i)
        for i, (_, src) in enumerate(sources)
    ])  # 3 streams: the host path reuses the chunking test's programs

    jitted = jax.jit(lambda st, ch: sl.step_many(st, ch))
    st_h, st_j = sl.init_states(3), sl.init_states(3)
    for i in range(0, 4096, 512):
        chunk = jnp.asarray(streams[:, :, i: i + 512], jnp.float32)
        st_h, out_h = sl.step_many(st_h, chunk)      # host: sub-batched
        st_j, out_j = jitted(st_j, chunk)            # traced: plain vmap
        np.testing.assert_array_equal(np.asarray(out_h["trigger_abs"]),
                                      np.asarray(out_j["trigger_abs"]))
        np.testing.assert_allclose(np.asarray(out_h["xy"]),
                                   np.asarray(out_j["xy"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_h.event_count),
                                  np.asarray(st_j.event_count))
    assert int(np.asarray(st_j.event_count).sum()) >= 3
