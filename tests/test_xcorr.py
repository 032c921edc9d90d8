"""Float correlation engine: FFT path vs time-domain, known-delay recovery,
PHAT, sub-sample interpolation."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.ops import xcorr
from audio_triangulation_tpu.utils import synth

CFG = PipelineConfig()
PAIRS2 = jnp.asarray([[0, 1]], dtype=jnp.int32)


def test_fft_linear_equals_time_domain(rng):
    frames = jnp.asarray(
        rng.normal(size=(3, 2, 1024)).astype(np.float32))
    via_fft = xcorr.xcorr_fft(frames, PAIRS2, CFG)
    via_time = xcorr.xcorr_time(frames, PAIRS2, CFG.max_shift)
    np.testing.assert_allclose(np.asarray(via_fft), np.asarray(via_time),
                               rtol=2e-4, atol=2e-2)


def test_fft_length_covers_linear_correlation():
    assert CFG.fft_length >= CFG.frame_size + CFG.max_shift
    assert CFG.fft_length == 2048  # next pow2 of 1070


def test_known_integer_delay_recovered(rng):
    sig = synth.chirp_burst(1024, 50_000.0)
    for d in (-30, -7, 0, 13, 41):
        b = synth.fractional_delay(sig, np.float64(d))
        frames = jnp.asarray(np.stack([sig, b])[None].astype(np.float32))
        corr = xcorr.xcorr_fft(frames, PAIRS2, CFG)
        shift = np.asarray(xcorr.best_lag(corr, CFG.max_shift))[0, 0]
        assert shift == d, (d, shift)


def test_fractional_delay_subsample_peak(rng):
    sig = synth.chirp_burst(1024, 50_000.0)
    for d in (-12.3, -0.4, 2.75, 33.5):
        b = synth.fractional_delay(sig, np.float64(d))
        frames = jnp.asarray(np.stack([sig, b])[None].astype(np.float32))
        corr = xcorr.xcorr_fft(frames, PAIRS2, CFG)
        tdoa, _ = xcorr.subsample_peak(corr, CFG.max_shift)
        err = abs(float(tdoa[0, 0]) - d)
        assert err < 0.1, (d, float(tdoa[0, 0]))


def test_phat_sharpens_and_recovers_delay(rng):
    cfg = PipelineConfig(phat=True)
    sig = synth.chirp_burst(1024, 50_000.0)
    b = synth.fractional_delay(sig, np.float64(9.0))
    noisy = np.stack([sig, b]) + rng.normal(0, 0.05, (2, 1024))
    frames = jnp.asarray(noisy[None].astype(np.float32))
    corr = np.asarray(xcorr.xcorr_fft(frames, PAIRS2, cfg))[0, 0]
    assert abs(int(np.argmax(corr)) - cfg.max_shift - 9) <= 1
    # whitened correlogram concentrates energy at the peak
    peak_frac = corr.max() / np.abs(corr).sum()
    corr_raw = np.asarray(xcorr.xcorr_fft(frames, PAIRS2, CFG))[0, 0]
    raw_frac = corr_raw.max() / np.abs(corr_raw).sum()
    assert peak_frac > raw_frac


def test_peak_taper_float_suppresses_far_lobes(rng):
    corr = jnp.asarray(np.ones((1, 93), np.float32))
    tapered = np.asarray(xcorr.peak_taper(corr, 46))
    assert tapered[0, 0] == 1.0  # peak (first max) untouched
    assert tapered[0, 92] < 1e-6


def test_ema_update_float():
    state = jnp.zeros((3, 93), jnp.float32)
    new = jnp.ones((3, 93), jnp.float32)
    decay = xcorr.ema_decay(jnp.float32(0.5), 0.5)
    out = xcorr.ema_update(state, new, decay)
    np.testing.assert_allclose(np.asarray(out), 1 - np.exp(-1.0), rtol=1e-5)


def test_batched_shapes_and_pairs(rng):
    frames = jnp.asarray(rng.normal(size=(5, 4, 1024)).astype(np.float32))
    pairs = jnp.asarray(
        [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=jnp.int32)
    corr = xcorr.xcorr_fft(frames, pairs, CFG)
    assert corr.shape == (5, 6, 93)
    # pair symmetry: swapping mics reverses the correlogram
    rev_pairs = jnp.asarray([[1, 0]], dtype=jnp.int32)
    c_fwd = np.asarray(xcorr.xcorr_fft(frames, PAIRS2, CFG))
    c_rev = np.asarray(xcorr.xcorr_fft(frames, rev_pairs, CFG))
    np.testing.assert_allclose(c_fwd, c_rev[..., ::-1], rtol=1e-4, atol=1e-3)


def test_phat_beats_plain_under_reverberation():
    """PHAT's raison d'etre: in reverberant scenes the whitened correlogram
    keeps a sharp direct-path peak while plain correlation gets biased by
    echo energy.  (In additive-noise-only scenes plain GCC is better — see
    BENCH_ACCURACY.json.)"""
    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.ops import solver as solver_ops
    import jax

    mics = geometry.square_array(0.3)
    pairs = jnp.asarray(geometry.mic_pairs(4))
    mic3 = jnp.zeros((4, 3), jnp.float32).at[:, :2].set(jnp.asarray(mics))
    rng = np.random.default_rng(11)
    planes = rng.uniform(-1.0, 1.0, (24, 2))
    sources = np.stack([
        np.array([x, y, 1.2]) * (1.2 / np.linalg.norm([x, y, 1.2]))
        for x, y in planes])
    # colored (speech-like) source + echoes: the regime PHAT is built for
    sig = synth.colored_burst(1024, 50_000.0, seed=5)
    frames = synth.synth_scene_reverb(
        sources, mics, signal=sig, noise_rms=0.02, n_echoes=8,
        echo_gain=0.8, room_scale=2.0, seed=12)
    true_tau = np.asarray(jax.vmap(
        lambda q: solver_ops.predicted_tdoas(
            q, mic3, pairs, 343.0, 1.2, True)
    )(jnp.asarray(planes, jnp.float32))) * 50_000.0

    errs = {}
    for phat in (False, True):
        cfg = PipelineConfig(phat=phat)
        corr = xcorr.xcorr_fft(
            jnp.asarray(frames, jnp.float32)
            * jnp.asarray(np.hanning(1024), jnp.float32), pairs, cfg)
        tdoa, _ = xcorr.subsample_peak(corr, cfg.max_shift)
        errs[phat] = float(np.median(np.abs(np.asarray(tdoa) - true_tau)))
    assert errs[True] < 0.5 < errs[False], errs
