"""Fused GCC Pallas kernel (interpret mode on CPU) vs the unfused MXU path."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.ops import mxu_fft
from audio_triangulation_tpu.ops.pallas import gcc_kernel
from audio_triangulation_tpu.ops import window as window_ops


def _setup(rng, b=8, m=3, n=1024):
    frames = rng.normal(size=(b, m, n)).astype(np.float32) * 50 + 128
    win = window_ops.dpss_window(n)
    pairs = geometry.mic_pairs(m)
    return jnp.asarray(frames), jnp.asarray(win), pairs


def _reference(frames, win, pairs, cfg):
    x = frames - jnp.mean(frames, axis=-1, keepdims=True)
    x = x * 256.0 * win
    return mxu_fft.xcorr_mxu(x, jnp.asarray(pairs), cfg)


def test_fused_matches_unfused(rng):
    cfg = PipelineConfig(fft_pad_mode="circular")
    frames, win, pairs = _setup(rng)
    got = np.asarray(gcc_kernel.fused_gcc(
        frames, win, pairs, cfg, tile_b=4, interpret=True))
    ref = np.asarray(_reference(frames, win, pairs, cfg))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


def test_fused_phat(rng):
    cfg = PipelineConfig(fft_pad_mode="circular", phat=True, phat_eps=1e-9)
    frames, win, pairs = _setup(rng, b=4)
    got = np.asarray(gcc_kernel.fused_gcc(
        frames, win, pairs, cfg, tile_b=4, interpret=True))
    ref = np.asarray(_reference(frames, win, pairs, cfg))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fused_linear_mode(rng):
    cfg = PipelineConfig(fft_pad_mode="linear")
    frames, win, pairs = _setup(rng, b=4, m=4)
    got = np.asarray(gcc_kernel.fused_gcc(
        frames, win, pairs, cfg, tile_b=2, interpret=True))
    ref = np.asarray(_reference(frames, win, pairs, cfg))
    scale = np.abs(ref).max()
    assert got.shape == ref.shape == (4, 6, 93)
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


def test_vmem_estimate():
    cfg = PipelineConfig(fft_pad_mode="circular")
    assert gcc_kernel.fused_gcc_fits_vmem(4, 1024, cfg, tile_b=64)
    # 64 mics cannot fit the per-pair cross-power in VMEM
    assert not gcc_kernel.fused_gcc_fits_vmem(64, 4096, cfg, tile_b=64)


def test_fused_peaks_matches_unfused_ops(rng):
    from audio_triangulation_tpu.ops import xcorr as xcorr_ops

    cfg = PipelineConfig(fft_pad_mode="circular", phat=True)
    frames, win, pairs = _setup(rng, b=8)
    corr = _reference(frames, win, pairs, cfg)
    k = cfg.max_shift
    exp_shifts = np.asarray(xcorr_ops.best_lag(corr, k))
    exp_tdoa, exp_peak = xcorr_ops.subsample_peak(corr, k)
    exp_tapered = np.asarray(
        xcorr_ops.peak_taper(corr, k, cfg.taper_denom))

    (got_corr, got_shifts, got_tdoa, got_peak,
     got_psr) = gcc_kernel.fused_gcc_peaks(
        frames, win, pairs, cfg, tile_b=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_shifts), exp_shifts)
    np.testing.assert_allclose(np.asarray(got_tdoa), np.asarray(exp_tdoa),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_peak), np.asarray(exp_peak),
                               rtol=1e-5, atol=1e-5)
    scale = np.abs(exp_tapered).max()
    np.testing.assert_allclose(
        np.asarray(got_corr) / scale, exp_tapered / scale, atol=1e-5)
    exp_psr = np.asarray(xcorr_ops.peak_confidence(corr, k))
    np.testing.assert_allclose(np.asarray(got_psr), exp_psr, rtol=1e-4)


def test_fused_phat_2mic_matches_unfused(rng):
    """2-mic arrays whiten per pair (P = 1 < M = 2, ops.xcorr.phat_per_mic);
    the fused kernel must agree with the unfused path on that branch too."""
    cfg = PipelineConfig(fft_pad_mode="circular", phat=True, phat_eps=1e-9)
    frames, win, pairs = _setup(rng, b=4, m=2)
    got = np.asarray(gcc_kernel.fused_gcc(
        frames, win, pairs, cfg, tile_b=4, interpret=True))
    ref = np.asarray(_reference(frames, win, pairs, cfg))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_sub_tiles_equivalent(rng):
    """fused_sub_tiles re-orders emission per sub-tile: same math per row,
    but the smaller matmul shapes may contract in a different order, so
    equality is to float tolerance (peaks/shifts must match exactly)."""
    frames, win, pairs = _setup(rng, b=8, m=4)
    for phat in (False, True):
        base = PipelineConfig(fft_pad_mode="circular", phat=phat)
        piped = PipelineConfig(
            fft_pad_mode="circular", phat=phat, fused_sub_tiles=4)
        a = gcc_kernel.fused_gcc_peaks(
            frames, win, pairs, base, tile_b=8, interpret=True)
        b = gcc_kernel.fused_gcc_peaks(
            frames, win, pairs, piped, tile_b=8, interpret=True)
        scale = max(float(np.abs(np.asarray(a[0])).max()), 1e-9)
        np.testing.assert_allclose(
            np.asarray(a[0]) / scale, np.asarray(b[0]) / scale, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        np.testing.assert_allclose(
            np.asarray(a[2]), np.asarray(b[2]), atol=1e-4)
