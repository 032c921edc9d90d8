"""Large-array chunked Pallas GCC kernel vs the XLA pair-blocked path."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.ops import mxu_fft
from audio_triangulation_tpu.ops.pallas import gcc_large


def test_large_kernel_matches_pairblocked(rng):
    cfg = PipelineConfig(fft_pad_mode="circular", phat=True,
                         max_shift_samples=30)
    m = 8
    frames = jnp.asarray(rng.normal(size=(4, m, 512)).astype(np.float32))
    pairs = geometry.mic_pairs(m)  # 28 pairs -> padded to one chunk of 32
    got = np.asarray(gcc_large.xcorr_large(
        frames, pairs, cfg, tile_b=2, chunk=32, interpret=True))
    ref = np.asarray(mxu_fft.xcorr_mxu_pairblocked(
        frames, jnp.asarray(pairs), cfg, pair_chunk=16))
    scale = np.abs(ref).max()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


def test_large_kernel_multi_chunk(rng):
    cfg = PipelineConfig(fft_pad_mode="circular", max_shift_samples=20)
    m = 12  # 66 pairs -> 3 chunks of 24 (padded)
    frames = jnp.asarray(rng.normal(size=(2, m, 256)).astype(np.float32))
    pairs = geometry.mic_pairs(m)
    got = np.asarray(gcc_large.xcorr_large(
        frames, pairs, cfg, tile_b=2, chunk=24, interpret=True))
    ref = np.asarray(mxu_fft.xcorr_mxu(frames, jnp.asarray(pairs), cfg))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


def test_large_kernel_in_kernel_peaks_match_external(rng):
    """xcorr_large_peaks (in-kernel argmax/sub-sample/psr/taper, the r3
    config-5b fast path) == xcorr_large + the external peak ops."""
    from audio_triangulation_tpu.ops import xcorr as xcorr_ops

    cfg = PipelineConfig(fft_pad_mode="circular", phat=True,
                         max_shift_samples=30)
    k = cfg.max_shift
    m = 8
    frames = jnp.asarray(rng.normal(size=(4, m, 512)).astype(np.float32))
    pairs = geometry.mic_pairs(m)
    corr = gcc_large.xcorr_large(
        frames, pairs, cfg, tile_b=2, chunk=32, interpret=True)
    ref_shift = np.asarray(xcorr_ops.best_lag(corr, k))
    ref_tdoa, ref_peak = map(np.asarray, xcorr_ops.subsample_peak(corr, k))
    ref_psr = np.asarray(xcorr_ops.peak_confidence(corr, k))
    ref_tapered = np.asarray(
        xcorr_ops.peak_taper(corr, k, cfg.taper_denom,
                             jnp.asarray(ref_shift)))

    tapered, shift, tdoa, peak, psr = map(np.asarray, (
        gcc_large.xcorr_large_peaks(
            frames, pairs, cfg, tile_b=2, chunk=32, interpret=True)))
    np.testing.assert_array_equal(shift, ref_shift)
    np.testing.assert_allclose(tdoa, ref_tdoa, rtol=0, atol=1e-5)
    np.testing.assert_allclose(peak, ref_peak, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(psr, ref_psr, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(tapered, ref_tapered, rtol=1e-5, atol=1e-7)


def test_large_kernel_peaks_honors_taper_disabled(rng):
    """Regression: taper_enabled=False must flow into the in-kernel peaks
    path — the written correlogram is the RAW one, matching the external
    path's semantics for the flag (reference correlations.c:26-33 is the
    tapered default; the flag turns it off everywhere)."""
    cfg = PipelineConfig(fft_pad_mode="circular", phat=True,
                         max_shift_samples=30, taper_enabled=False)
    m = 8
    frames = jnp.asarray(rng.normal(size=(2, m, 512)).astype(np.float32))
    pairs = geometry.mic_pairs(m)
    raw = np.asarray(gcc_large.xcorr_large(
        frames, pairs, cfg, tile_b=2, chunk=32, interpret=True))
    out, *_ = gcc_large.xcorr_large_peaks(
        frames, pairs, cfg, tile_b=2, chunk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), raw, rtol=1e-6, atol=1e-7)


def test_large_kernel_bf16_matmul_close(rng):
    """matmul_dtype='bfloat16' (for chips where bf16 outrates f32) stays
    within bf16 tolerance of the f32 kernel and preserves the peak lag."""
    from audio_triangulation_tpu.ops import xcorr as xcorr_ops

    from audio_triangulation_tpu.utils import synth

    m = 8
    base = dict(fft_pad_mode="circular", phat=True, max_shift_samples=30)
    mics = geometry.circular_array(m, 0.25)
    src = np.array([0.5, 0.4, 1.2])
    src = src * (1.2 / np.linalg.norm(src))
    one = synth.synth_scene(src, mics, n=512, noise_rms=0.01, seed=9)
    frames = jnp.asarray(np.broadcast_to(one, (4, m, 512)).copy(),
                         jnp.float32)
    pairs = geometry.mic_pairs(m)
    ref = np.asarray(gcc_large.xcorr_large(
        frames, pairs, PipelineConfig(**base), tile_b=2, chunk=32,
        interpret=True))
    got = np.asarray(gcc_large.xcorr_large(
        frames, pairs, PipelineConfig(**base, matmul_dtype="bfloat16"),
        tile_b=2, chunk=32, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-2)
    k = PipelineConfig(**base).max_shift
    assert np.array_equal(
        np.asarray(xcorr_ops.best_lag(jnp.asarray(got), k)),
        np.asarray(xcorr_ops.best_lag(jnp.asarray(ref), k)))


def test_large_kernel_band_auto_matches_reference(rng):
    """band_hz='auto' on the large-array path: the kernel sees spectra
    pre-scaled by sqrt(w) (gcc_large._prep_spectra), which must equal
    weighting the cross-power by w directly; w comes from the strided
    pair subsample (ops.xcorr.band_pair_subset)."""
    from audio_triangulation_tpu.ops import xcorr as xcorr_ops

    cfg = PipelineConfig(fft_pad_mode="circular", phat=True,
                         frame_size_bits=8, max_shift_samples=20,
                         band_hz="auto")
    m = 12
    # band-limited frames so the auto band actually selects a sub-band
    n = 256
    t = np.arange(n)
    base = np.sin(2 * np.pi * 0.08 * t) * np.exp(
        -0.5 * ((t - n / 2) / (n / 6)) ** 2)
    frames = np.asarray(
        base[None, None, :] + 0.05 * rng.normal(size=(4, m, n)),
        np.float32)
    frames = jnp.asarray(frames)
    pairs = geometry.mic_pairs(m)  # 66 pairs

    got = np.asarray(gcc_large.xcorr_large(
        frames, pairs, cfg, tile_b=2, chunk=24, interpret=True))

    # reference: raw spectra -> subset band weight -> PHAT cross-power * w
    spectra = xcorr_ops.rfft_frames(frames, cfg.fft_length)
    sub = xcorr_ops.band_pair_subset(pairs)
    w = xcorr_ops.auto_band_weight(spectra, jnp.asarray(sub), cfg)
    r = xcorr_ops.cross_power(spectra, jnp.asarray(pairs), phat=True,
                              phat_eps=cfg.phat_eps)
    ref = np.asarray(xcorr_ops.correlogram_from_cross_power(
        r * w[..., None, :], cfg.fft_length, cfg.max_shift))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)
    # the weight did select a band (not the full-interior fallback)
    wn = np.asarray(w)
    assert (wn.sum(-1) < wn.shape[-1] - 2).all()


def test_band_pair_subset_identity_and_stride():
    from audio_triangulation_tpu.ops import xcorr as xcorr_ops

    pairs = geometry.mic_pairs(8)  # 28 <= 64 -> identity
    np.testing.assert_array_equal(
        xcorr_ops.band_pair_subset(pairs), pairs)
    big = geometry.mic_pairs(64)  # 2016 -> strided subset
    sub = xcorr_ops.band_pair_subset(big)
    assert sub.shape[0] <= 64
    assert (sub[0] == big[0]).all() and (sub[-1] == big[-1]).all()
