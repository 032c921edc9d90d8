"""Fault-tolerant streaming: per-mic consistency scores auto-down-weight a
failing channel's pairs in the live SRP init + GN solve
(StreamConfig.health_weighting; ops/consistency.mic_weights/pair_weights).

New capability — the reference has no health handling at all; its only
quality gate is the shift-sum heuristic (sample_compute.h:124-134)."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import PipelineConfig, geometry
from audio_triangulation_tpu.core.config import StreamConfig
from audio_triangulation_tpu.models.streaming import StreamingLocalizer
from audio_triangulation_tpu.ops import consistency
from audio_triangulation_tpu.utils import synth

M = 6
MICS = geometry.circular_array(M, 0.25)
PAIRS = geometry.mic_pairs(M)


# ---------------------------------------------------------------- op units
def test_mic_weights_uniform_when_healthy():
    scores = jnp.full((M,), 3e-6)
    w = np.asarray(consistency.mic_weights(scores))
    assert np.allclose(w, w[0]), w  # uniform
    assert w[0] > 0.85  # near 1 (only relative weights matter downstream)


def test_mic_weights_collapse_for_outlier_mic():
    scores = jnp.asarray([2e-6, 2e-6, 2e-6, 2e-6, 2e-6, 2e-4])
    w = np.asarray(consistency.mic_weights(scores, ratio=3.0))
    assert w[:5].min() > 0.8
    assert w[5] < 0.01, w


def test_pair_weights_are_products():
    w_mic = jnp.asarray([1.0, 0.5, 1.0, 0.1, 1.0, 1.0])
    w2 = np.asarray(consistency.pair_weights(w_mic, jnp.asarray(PAIRS), M))
    for p, (i, j) in enumerate(PAIRS):
        assert np.isclose(w2[p], w_mic[i] * w_mic[j]), (p, i, j)


# ------------------------------------------------------------- stream e2e
def _stream_with_events(frame, n_events=3, t_len=16000, seed=0):
    """[M, T] uint8 stream with ``n_events`` copies of ``frame`` [M, N]."""
    rng = np.random.default_rng(seed)
    streams = rng.integers(127, 130, size=(M, t_len)).astype(np.float64)
    for k in range(n_events):
        at = 2500 + 4000 * k
        streams[:, at: at + frame.shape[-1]] += 110.0 * frame
    return np.clip(np.round(streams), 0, 255)


def _run(stream_cfg, streams):
    sl = StreamingLocalizer.create(
        MICS, PipelineConfig(phat=True), stream=stream_cfg,
        with_solver=True)
    _, outs = sl.run(streams)
    events = [o for o in outs if o["event"]]
    assert events, "stream produced no accepted events"
    return events[-1]


def test_healthy_array_unaffected():
    """With every channel healthy, weighting on ~= weighting off."""
    src = np.array([0.5, 0.4, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    frame = np.asarray(synth.synth_scene(src, MICS, noise_rms=0.01,
                                         seed=1))[0]
    streams = _stream_with_events(frame, n_events=2)
    off = _run(StreamConfig(chunk_size=2000), streams)
    on = _run(StreamConfig(chunk_size=2000, health_weighting=True), streams)
    assert np.linalg.norm(np.asarray(on["xy"]) - np.asarray(off["xy"])) < 0.02
    # no MIC is flagged (individual noisy PAIRS may legitimately be
    # down-weighted — that is the robustness working, not a fault call)
    w_mic = np.asarray(on["mic_weight"])
    assert w_mic.min() > 0.5 * w_mic.max(), w_mic


def test_dead_channel_recovered():
    """One channel replaced by noise: weighting keeps the solve accurate
    (its pairs are suppressed) where the unweighted solve degrades."""
    rng = np.random.default_rng(7)
    src = np.array([0.6, 0.4, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    plane = src[:2]
    frame = np.asarray(synth.synth_scene(src, MICS, noise_rms=0.0, seed=2))[0]
    frame[3] = rng.normal(0, 0.3, frame.shape[-1])  # dead channel
    streams = _stream_with_events(frame, n_events=3, seed=3)

    on = _run(StreamConfig(chunk_size=2000, health_weighting=True), streams)
    off = _run(StreamConfig(chunk_size=2000), streams)

    err_on = np.linalg.norm(np.asarray(on["xy"]) - plane)
    err_off = np.linalg.norm(np.asarray(off["xy"]) - plane)
    assert err_on < 0.10, (err_on, err_off)
    assert err_on <= err_off + 1e-6, (err_on, err_off)

    # the mic weights identify the culprit unambiguously
    w_mic = np.asarray(on["mic_weight"])
    assert w_mic.argmin() == 3, w_mic
    assert w_mic[3] < 0.2 * np.delete(w_mic, 3).min(), w_mic
    # and every strongly suppressed pair touches mic 3
    w2 = np.asarray(on["pair_weight"])
    bad = w2 < 0.5 * np.median(w2)
    assert bad.any(), w2
    assert all(3 in PAIRS[p] for p in np.nonzero(bad)[0]), (w2, PAIRS)
