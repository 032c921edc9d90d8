"""In-kernel spectral-stats mode of the fused GCC Pallas kernel.

Since r5 the hands-free flagship configuration — ``phat=True,
band_hz='auto', subsample_method='hybrid'`` — runs on the fused kernel:
the smoothed coherence, the per-event auto band weight
(ops.xcorr.auto_band_weight) and the phase-slope sub-sample regression
(ops.xcorr.tdoa_phase_slope) are all computed on the VMEM-resident
spectra inside gcc_kernel (stage_front_stats / stage_cross_stats /
phase_slope_tdoa).  The unfused XLA-FFT path remains the reference
implementation; these tests pin the two together.

Reference being generalized: the correlator,
``/root/reference/src/components/correlations.c:4-33`` (no spectral
processing at all there).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.utils import synth

MICS = geometry.square_array(0.3)
H = 1.2
B = 32


def _frames(n_scenes=B, noise=0.02, seed=1):
    rng = np.random.default_rng(7)
    planes = rng.uniform(-1.2, 1.2, (n_scenes, 2))
    sources = np.stack([
        np.array([x, y, H]) * (H / np.linalg.norm([x, y, H]))
        for x, y in planes])
    return jnp.asarray(
        synth.synth_scene(sources, MICS, noise_rms=noise, seed=seed),
        jnp.float32)


def _run(frames, fused, **kw):
    loc = Localizer.create(
        MICS, PipelineConfig(fft_pad_mode="circular",
                             fused_kernel="on" if fused else "off", **kw))
    return loc(frames)


CONFIGS = [
    ("auto", dict(phat=True, band_hz="auto")),
    ("auto_hybrid", dict(phat=True, band_hz="auto",
                         subsample_method="hybrid")),
    ("hybrid_fullband", dict(phat=True, subsample_method="hybrid")),
    ("static_band_hybrid", dict(phat=True, band_hz=(800.0, 6000.0),
                                subsample_method="hybrid")),
    ("auto_nophat", dict(band_hz="auto")),
    ("auto_phase", dict(phat=True, band_hz="auto",
                        subsample_method="phase")),
]


@pytest.mark.parametrize("name,kw", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_fused_stats_matches_unfused(name, kw):
    """The kernel's stats path must reproduce the unfused reference to
    float tolerance — correlograms, sub-sample TDOAs, shifts, solve."""
    frames = _frames()
    a = _run(frames, True, **kw)
    b = _run(frames, False, **kw)
    for key, tol in [("correlograms", 2e-4), ("tdoa_samples", 1e-4),
                     ("xy", 1e-4)]:
        va = np.asarray(a[key], np.float64)
        vb = np.asarray(b[key], np.float64)
        scale = max(1e-12, float(np.abs(vb).max()))
        assert np.abs(va - vb).max() / scale < tol, (name, key)
    np.testing.assert_array_equal(
        np.asarray(a["best_shift"]), np.asarray(b["best_shift"]))


def test_fused_flagship_accuracy_on_chirp():
    """The flagship config through the FUSED path keeps the accuracy
    story: p90 TDOA error < 0.1 samples on high-SNR chirp scenes (the
    bar of test_band_auto.test_hybrid_beats_parabolic_on_coherent_chirp,
    which exercises the unfused path)."""
    from audio_triangulation_tpu.ops import solver as solver_ops

    rng = np.random.default_rng(7)
    planes = rng.uniform(-1.2, 1.2, (B, 2))
    sources = np.stack([
        np.array([x, y, H]) * (H / np.linalg.norm([x, y, H]))
        for x, y in planes])
    mic3 = jnp.zeros((4, 3), jnp.float32).at[:, :2].set(jnp.asarray(MICS))
    pairs = geometry.mic_pairs(4)
    true_tau = np.asarray(jax.vmap(
        lambda q: solver_ops.predicted_tdoas(
            q, mic3, jnp.asarray(pairs), 343.0, H, True)
    )(jnp.asarray(planes, jnp.float32))) * 50_000.0
    noise = 0.8 / (10 ** (40 / 20.0)) / np.sqrt(2)  # 40 dB SNR
    frames = jnp.asarray(
        synth.synth_scene(sources, MICS, noise_rms=noise, seed=40),
        jnp.float32)
    out = _run(frames, True, phat=True, band_hz="auto",
               subsample_method="hybrid")
    err = np.abs(np.asarray(out["tdoa_samples"]) - true_tau)
    assert np.percentile(err, 90) < 0.1, np.percentile(err, 90)


def test_fused_stats_small_batch_falls_back():
    """Tiny batches still route to the unfused path (padding a full tile
    would dominate) and agree with it."""
    frames = _frames(2)
    a = _run(frames, True, phat=True, band_hz="auto",
             subsample_method="hybrid")
    b = _run(frames, False, phat=True, band_hz="auto",
             subsample_method="hybrid")
    np.testing.assert_allclose(
        np.asarray(a["tdoa_samples"]), np.asarray(b["tdoa_samples"]),
        atol=1e-5)


def test_mxu_engine_band_auto_matches_fft_reference():
    """The unfused MXU engine (the streaming burst's correlator) folds
    the auto band into the spectra (mxu_fft.autoband_scale_reim): its
    correlograms must equal the XLA-FFT reference path's."""
    from audio_triangulation_tpu.core.config import PipelineConfig as PC
    from audio_triangulation_tpu.models.localizer import condition_frames
    from audio_triangulation_tpu.ops import (
        mxu_fft, window as window_ops, xcorr)

    frames = _frames(8)
    pairs = jnp.asarray(geometry.mic_pairs(4))
    for kw in (dict(phat=True), dict()):
        cfg = PC(fft_pad_mode="circular", band_hz="auto", **kw)
        win = jnp.asarray(window_ops.window_for(cfg))
        x = condition_frames(frames, win, cfg)
        got = np.asarray(mxu_fft.xcorr_mxu(x, pairs, cfg))
        ref = np.asarray(xcorr.xcorr_fft(x, pairs, cfg))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)
        blocked = np.asarray(mxu_fft.xcorr_mxu_pairblocked(
            x, pairs, cfg, pair_chunk=4))
        np.testing.assert_allclose(
            blocked / scale, ref / scale, atol=2e-5)
