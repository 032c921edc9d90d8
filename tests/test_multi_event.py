"""Multi-event-per-chunk streaming and the streaming-path Gauss-Newton solve.

Round-1 gap coverage: stream_step used to take only the FIRST trigger per
chunk (argmax of the mask), silently dropping a second event inside the same
chunk, and returned only the grid peak ``xy_grid`` — never the flagship
GN-refined ``xy``.  Reference analogue: the firmware processes one capture
at a time but never drops events, because its loop re-arms immediately after
the ring refill (src/sample_compute.h:45-150).
"""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer
from audio_triangulation_tpu.core.config import PipelineConfig, StreamConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.streaming import StreamingLocalizer
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()
CFG_SMALL = PipelineConfig(frame_size_bits=8, max_shift_samples=16)


def _place(x, y, h=1.2):
    p = np.array([x, y, h], np.float64)
    return np.array([x, y]), p * (h / np.linalg.norm(p))


def _stream_with_bursts(source, t_len, bursts, n=256, seed=0):
    rng = np.random.default_rng(seed)
    streams = rng.integers(127, 130, size=(3, t_len)).astype(np.float64)
    for i, at in enumerate(bursts):
        fr = synth.synth_scene(source, MICS, n=n, noise_rms=0.0,
                               seed=seed + 10 * i)[0]
        streams[:, at: at + n] += 110.0 * fr
    return np.clip(np.round(streams), 0, 255)


def test_two_events_in_one_chunk_detected():
    """Two bursts 600 samples apart inside ONE 2048-sample chunk: with
    max_events_per_chunk > 1 both are detected; the frame size is 256 so the
    refill holdoff (256) does not suppress the second."""
    _, source = _place(0.5, 0.4)
    streams = _stream_with_bursts(source, t_len=4096, bursts=(800, 1400))

    sl = StreamingLocalizer.create(
        MICS, CFG_SMALL,
        stream=StreamConfig(chunk_size=2048, max_events_per_chunk=4))
    state, outs = sl.run(streams)
    assert int(state.event_count) == 2, int(state.event_count)
    abs_pos = np.concatenate(
        [np.asarray(o["event_trigger_abs"])[np.asarray(o["events"])]
         for o in outs])
    assert len(abs_pos) == 2
    gap = abs_pos[1] - abs_pos[0]
    assert 500 <= gap <= 700, abs_pos  # the bursts are 600 apart


def test_single_event_mode_drops_second_trigger():
    """Contrast case: the round-1 behavior (max_events_per_chunk=1) only
    takes the first trigger of the chunk."""
    _, source = _place(0.5, 0.4)
    streams = _stream_with_bursts(source, t_len=4096, bursts=(800, 1400))
    sl = StreamingLocalizer.create(
        MICS, CFG_SMALL,
        stream=StreamConfig(chunk_size=2048, max_events_per_chunk=1))
    state, _ = sl.run(streams)
    assert int(state.event_count) == 1


def test_multi_event_respects_refill_holdoff():
    """A second burst INSIDE the refill window of the first must still be
    suppressed even with multi-event extraction enabled."""
    _, source = _place(0.5, 0.4)
    streams = _stream_with_bursts(source, t_len=4096, bursts=(800, 950))
    sl = StreamingLocalizer.create(
        MICS, CFG_SMALL,
        stream=StreamConfig(chunk_size=2048, max_events_per_chunk=4))
    state, outs = sl.run(streams)
    trig = np.concatenate(
        [np.asarray(o["event_trigger_abs"])[np.asarray(o["events_found"])
                                            & (np.asarray(
                                                o["event_trigger_abs"]) >= 0)]
         for o in outs])
    for a, b in zip(trig, trig[1:]):
        assert b - a >= 256, trig


def test_multi_event_matches_sequential_chunks():
    """The same stream processed with big chunks + multi-event equals small
    chunks + single-event: identical accepted-trigger positions and the same
    final EMA state (order- and dt-preserving merge)."""
    _, source = _place(-0.3, 0.6)
    streams = _stream_with_bursts(
        source, t_len=8192, bursts=(800, 1500, 4000), seed=3)

    big = StreamingLocalizer.create(
        MICS, CFG_SMALL,
        stream=StreamConfig(chunk_size=2048, max_events_per_chunk=8))
    small = StreamingLocalizer.create(
        MICS, CFG_SMALL,
        stream=StreamConfig(chunk_size=256, max_events_per_chunk=1))

    st_b, outs_b = big.run(streams)
    st_s, outs_s = small.run(streams)
    trig_b = sorted(
        int(t) for o in outs_b
        for t in np.asarray(o["event_trigger_abs"])[np.asarray(o["events"])])
    trig_s = [int(o["trigger_abs"]) for o in outs_s if o["event"]]
    assert trig_b == trig_s and len(trig_b) == 3
    np.testing.assert_allclose(np.asarray(st_b.ema_corr),
                               np.asarray(st_s.ema_corr),
                               rtol=1e-5, atol=1e-3)


def test_streaming_solver_matches_batch_path():
    """The streaming GN-refined ``xy`` matches the batch pipeline's ``xy``
    on the same scene to cm level (round-1 gap: streaming returned only the
    coarser grid peak)."""
    plane, source = _place(0.45, 0.35)
    rng = np.random.default_rng(7)
    streams = rng.integers(127, 130, size=(3, 8000)).astype(np.float64)
    frame = synth.synth_scene(source, MICS, noise_rms=0.0, seed=1)[0]
    streams[:, 3000: 3000 + 1024] += 110.0 * frame
    streams = np.clip(np.round(streams), 0, 255)

    sl = StreamingLocalizer.create(
        MICS, stream=StreamConfig(chunk_size=512), with_solver=True)
    state, outs = sl.run(streams)
    events = [o for o in outs if o["event"]]
    assert len(events) == 1
    xy_stream = np.asarray(events[-1]["xy"])
    assert np.all(np.isfinite(xy_stream))

    # batch path on the exact captured frame
    trig = int(events[-1]["trigger_abs"])
    captured = jnp.asarray(
        streams[:, trig - 1023: trig + 1], jnp.float32)[None]
    loc = Localizer.create(MICS)
    xy_batch = np.asarray(loc(captured)["xy"])[0]

    assert np.linalg.norm(xy_stream - xy_batch) < 0.02, (xy_stream, xy_batch)
    assert np.linalg.norm(xy_stream - plane) < 0.1, (xy_stream, plane)


def test_streaming_solver_in_batched_streams():
    """with_solver works under the vmapped multi-stream path."""
    _, source = _place(0.45, 0.35)
    streams = np.stack([
        _stream_with_bursts(source, t_len=2048, bursts=(900,), seed=s)
        for s in range(2)
    ])
    sl = StreamingLocalizer.create(
        MICS, CFG_SMALL,
        stream=StreamConfig(chunk_size=512), with_solver=True)
    states = sl.init_states(2)
    for i in range(0, 2048, 512):
        states, out = sl.step_many(
            states, jnp.asarray(streams[:, :, i: i + 512], jnp.float32))
    assert out["xy"].shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(out["xy"])))


def test_float_ema_golden_chain():
    """The streaming float EMA reproduces the C float chain of
    correlations_average (correlations.c:38-49): delta and sum in float32,
    the float path simply skipping the final int64 truncation.  The only
    divergence is exp() precision (C: double exp narrowed to float32; XLA:
    float32 exp), which bounds decay at ~1e-7 absolute — asserted here."""
    from audio_triangulation_tpu.ops import xcorr

    rng = np.random.default_rng(11)
    est = rng.normal(size=(6, 93)).astype(np.float32) * 1e6
    new = rng.normal(size=(6, 93)).astype(np.float32) * 1e6

    for dt_s in (0.0, 0.01, 0.3, 2.0):
        # C chain (correlations.c:40-49) without the int64 truncate
        arg = -np.float32(dt_s) / np.float32(0.5)
        decay_c = np.float32(np.float64(1.0) - np.exp(np.float64(arg)))
        expect = np.float32(
            est + np.float32((new - est) * decay_c))

        decay_j = xcorr.ema_decay(jnp.float32(dt_s), 0.5)
        assert abs(float(decay_j) - float(decay_c)) < 3e-6
        got = np.asarray(xcorr.ema_update(
            jnp.asarray(est), jnp.asarray(new), decay_j))
        # values are ~1e6; the exp precision gap bounds the bin error
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=16.0)

    # and the int path stays bit-exact vs the golden model
    from audio_triangulation_tpu.utils import golden

    est_i = (est[0] * 4).astype(np.int64)
    new_i = (new[0] * 4).astype(np.int64)
    ref, _ = golden.xcorr_average(est_i.copy(), new_i, 0.07)
    got_i = np.asarray(xcorr.ema_update_int(
        jnp.asarray(est_i), jnp.asarray(new_i), 0.07))
    np.testing.assert_array_equal(got_i, ref)
