"""Phase-slope sub-sample TDOA regression (subsample_method='phase').

New capability — the reference stops at integer shifts
(src/components/correlations.c:20-23); this is the classic frequency-domain
alternative to parabolic peak interpolation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.ops import xcorr
from audio_triangulation_tpu.utils import synth


def _pair():
    return jnp.asarray(np.array([[0, 1]], np.int32))


def test_exact_on_circular_delay():
    """A circular fractional delay has EXACTLY linear phase on the N-point
    grid, so with fft_length == N the regression recovers it to float32
    rounding."""
    n = 1024
    sig = synth.colored_burst(n, 50_000.0, seed=2)
    for d in (3.3, -6.75, 0.1):
        b = synth.fractional_delay(sig, np.array(d))
        frames = jnp.asarray(np.stack([sig, b])[None], jnp.float32)
        spectra = xcorr.rfft_frames(frames, n)
        coarse = jnp.asarray([[round(d)]], jnp.int32)
        got = float(np.asarray(xcorr.tdoa_phase_slope(
            spectra, _pair(), coarse, fft_length=n))[0, 0])
        assert abs(got - d) < 5e-3, (d, got)


def _linear_delay_pair(d, sig_seed, noise_seed, noise, n=1024, m=2048):
    """True (non-circular) delay: crop two windows out of a longer
    signal."""
    rng = np.random.default_rng(noise_seed)
    long = synth.colored_burst(m, 50_000.0, seed=sig_seed)
    longd = synth.fractional_delay(long, np.array(d))
    a = long[512: 512 + n] + rng.normal(0, noise, n)
    b = longd[512: 512 + n] + rng.normal(0, noise, n)
    return jnp.asarray(np.stack([a, b])[None], jnp.float32)


def test_beats_parabolic_at_high_snr():
    """Aggregate over a delay/seed sweep with true linear delays: the
    phase regression's mean |error| is below 3-point parabolic's (the
    regime it is for; measured ~30% better)."""
    cfg = PipelineConfig()
    errs_ph, errs_pa = [], []
    for i, d in enumerate(np.linspace(-9.7, 9.7, 13)):
        for seed in (5, 11):
            frames = _linear_delay_pair(d, seed, seed + i, 0.005)
            corr = xcorr.xcorr_fft(frames, _pair(), cfg)
            shifts = xcorr.best_lag(corr, cfg.max_shift)
            t_pa, _ = xcorr.subsample_peak(corr, cfg.max_shift)
            spectra = xcorr.rfft_frames(frames, cfg.fft_length)
            t_ph = xcorr.tdoa_phase_slope(
                spectra, _pair(), shifts, fft_length=cfg.fft_length)
            errs_pa.append(abs(float(t_pa[0, 0]) - d))
            errs_ph.append(abs(float(t_ph[0, 0]) - d))
    assert np.mean(errs_ph) < np.mean(errs_pa), (
        np.mean(errs_ph), np.mean(errs_pa))
    assert np.mean(errs_ph) < 0.05, np.mean(errs_ph)


def test_localizer_phase_method_e2e():
    mics = geometry.reference_array()
    # grid/solver coordinates are pre-projection plane coords: cell (x, y)
    # means 3-D point (x, y, h) * h/|(x, y, h)| (vga_heatmap.h:57-60)
    plane = np.array([0.8, 0.5])
    src = np.array([0.8, 0.5, 1.2])
    src = src * (1.2 / np.linalg.norm(src))
    frames = jnp.asarray(
        synth.synth_scene(src, mics, noise_rms=0.005, seed=4), jnp.float32)
    loc = Localizer.create(
        mics, PipelineConfig(subsample_method="phase"))
    out = loc(frames)
    xy = np.asarray(out["xy"])[0]
    assert np.linalg.norm(xy - plane) < 0.05, xy
    # integer part agrees with the correlogram argmax
    assert np.allclose(np.round(np.asarray(out["tdoa_samples"])[0]),
                       np.asarray(out["best_shift"])[0], atol=1)


def test_phase_method_fused_dispatch():
    """Since r5 the phase-slope regression runs IN-KERNEL (gcc_kernel
    spectral-stats mode), so 'phase' no longer disables the fused path —
    only configurations the kernel cannot express (band-crop) do."""
    from audio_triangulation_tpu.models.localizer import _fused_tile

    cfg = PipelineConfig(subsample_method="phase", fused_kernel="on")
    assert _fused_tile(cfg, 4, 1024) == cfg.fused_tile_b
    cfg2 = PipelineConfig(subsample_method="phase", fused_kernel="on",
                          subsample_peak=False)
    assert _fused_tile(cfg2, 4, 1024) == cfg2.fused_tile_b
    cfg3 = PipelineConfig(subsample_method="phase", fused_kernel="on",
                          band_hz=(800.0, 6000.0), band_crop=True)
    assert _fused_tile(cfg3, 4, 1024) is None


def test_validate_rejects_unknown_method():
    with pytest.raises(ValueError):
        PipelineConfig(subsample_method="spline")  # __post_init__ validates
