"""TDOA cycle-consistency projection and mic-fault diagnosis
(ops/consistency; graph-TDOA redundancy, cf. arXiv:2507.07087)."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import PipelineConfig, geometry
from audio_triangulation_tpu.ops import consistency, solver
from audio_triangulation_tpu.utils import synth

M = 8
MICS = geometry.circular_array(M, 0.25)
PAIRS = geometry.mic_pairs(M)


def _true_tdoas(plane_xy):
    mic3 = jnp.zeros((M, 3), jnp.float32).at[:, :2].set(
        jnp.asarray(MICS, jnp.float32))
    return solver.predicted_tdoas(
        jnp.asarray(plane_xy, jnp.float32)[None], mic3,
        jnp.asarray(PAIRS), 343.0, 1.2, True)  # [1, P] seconds


def test_consistent_tdoas_are_fixed_points():
    tau = _true_tdoas([0.6, 0.4])
    tau_c, t, resid = consistency.project_consistent(
        tau, jnp.asarray(PAIRS), M)
    np.testing.assert_allclose(np.asarray(tau_c), np.asarray(tau),
                               atol=1e-9)
    assert float(jnp.abs(resid).max()) < 1e-9
    # gauge: arrival times are zero-mean
    assert abs(float(t.sum())) < 1e-7


def test_projection_denoises():
    """Random TDOA noise is reduced by the consistency redundancy (the
    consistent subspace has dim M-1 = 7 of P = 28)."""
    rng = np.random.default_rng(0)
    tau = np.asarray(_true_tdoas([0.6, 0.4]))
    noisy = tau + rng.normal(0, 1e-5, tau.shape)
    tau_c, _, _ = consistency.project_consistent(
        jnp.asarray(noisy), jnp.asarray(PAIRS), M)
    err_before = np.abs(noisy - tau).mean()
    err_after = np.abs(np.asarray(tau_c) - tau).mean()
    assert err_after < 0.7 * err_before, (err_before, err_after)


def test_delayed_mic_is_consistent():
    """A constant per-mic delay is a valid arrival-time shift — no
    residual, by design."""
    tau = np.array(_true_tdoas([0.6, 0.4]))
    d = 3.7e-4
    for p, (i, j) in enumerate(PAIRS):
        if j == 2:
            tau[0, p] += d
        elif i == 2:
            tau[0, p] -= d
    out = consistency.diagnose_mics(jnp.asarray(tau), jnp.asarray(PAIRS), M)
    assert float(out["residual_rms"][0]) < 1e-9
    assert not bool(np.asarray(out["faulty"]).any())


def test_garbage_mic_is_flagged():
    """Random (mutually inconsistent) TDOAs on every pair touching one mic
    flag exactly that mic."""
    rng = np.random.default_rng(3)
    tau = np.array(_true_tdoas([0.6, 0.4]))
    bad = 5
    for p, (i, j) in enumerate(PAIRS):
        if bad in (i, j):
            tau[0, p] = rng.uniform(-8e-4, 8e-4)
    out = consistency.diagnose_mics(jnp.asarray(tau), jnp.asarray(PAIRS), M)
    faulty = np.asarray(out["faulty"])[0]
    assert faulty[bad], np.asarray(out["scores"])[0]
    assert faulty.sum() == 1, faulty


def test_batched_and_weighted():
    rng = np.random.default_rng(1)
    tau = np.concatenate([np.asarray(_true_tdoas([x, y]))
                          for x, y in [(0.6, 0.4), (-0.3, 0.7)]])  # [2, P]
    noisy = tau + rng.normal(0, 1e-5, tau.shape)
    w = jnp.asarray(np.full(tau.shape, 1.0, np.float32))
    tau_c, t, resid = consistency.project_consistent(
        jnp.asarray(noisy, jnp.float32), jnp.asarray(PAIRS), M, w)
    assert tau_c.shape == tau.shape and t.shape == (2, M)
    # weighted with unit weights == unweighted
    tau_u, _, _ = consistency.project_consistent(
        jnp.asarray(noisy, jnp.float32), jnp.asarray(PAIRS), M)
    np.testing.assert_allclose(np.asarray(tau_c), np.asarray(tau_u),
                               rtol=1e-5, atol=1e-8)


def test_e2e_from_frames():
    """End-to-end: a mic replaced by noise is diagnosed from the measured
    TDOAs of a real pipeline run."""
    from audio_triangulation_tpu import Localizer

    rng = np.random.default_rng(2)
    src = np.array([0.6, 0.4, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    frames = np.asarray(synth.synth_scene(src, MICS, noise_rms=0.01, seed=2))
    frames[0, 3] = rng.normal(0, 0.3, frames.shape[-1])  # dead channel
    loc = Localizer.create(MICS, PipelineConfig(phat=True))
    out = loc(jnp.asarray(frames, jnp.float32))
    tdoas = out["tdoa_samples"] / 50_000.0
    diag = consistency.diagnose_mics(
        tdoas, loc.params.pairs, M, ratio_thresh=2.5)
    faulty = np.asarray(diag["faulty"])[0]
    assert faulty[3], np.asarray(diag["scores"])[0]


def test_streaming_emits_health_metrics():
    """The streaming step reports consistency_rms + per-mic scores; a dead
    channel drives the per-mic score of exactly that mic up."""
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    rng = np.random.default_rng(4)
    src = np.array([0.6, 0.4, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    frame = np.asarray(synth.synth_scene(src, MICS, noise_rms=0.0, seed=4))[0]
    frame[3] = rng.normal(0, 0.3, frame.shape[-1])  # dead channel
    streams = rng.integers(127, 130, size=(M, 8000)).astype(np.float64)
    streams[:, 3000:3000 + 1024] += 110.0 * frame
    sl = StreamingLocalizer.create(
        MICS, PipelineConfig(phat=True),
        stream=StreamConfig(chunk_size=512))
    _, outs = sl.run(np.clip(np.round(streams), 0, 255))
    events = [o for o in outs if o["event"]]
    assert events
    out = events[-1]
    assert out["consistency_rms"] > 1e-6  # inconsistency detected
    scores = np.asarray(out["mic_consistency"])
    assert scores.argmax() == 3, scores
