"""Band-limited GCC (band_hz) and partial PHAT whitening (phat_beta).

New capability addressing PHAT's classic failure mode on band-limited
sources: whitening equalizes out-of-band noise bins up to the signal's
level, dragging TDOAs samples off (measured 26 cm position error on a
chirp scene the unwhitened path localizes to < 1 mm).  The band mask is
folded into the lag-synthesis matrices on the MXU/fused paths (zero
runtime cost); beta < 1 keeps some magnitude weighting.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.ops import mxu_fft, xcorr
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()
PAIRS = jnp.asarray(geometry.mic_pairs(3))


def _scene_frames(noise=0.01, seed=2):
    src = np.array([0.8, 0.5, 1.2])
    src = src * (1.2 / np.linalg.norm(src))
    return jnp.asarray(
        synth.synth_scene(src, MICS, noise_rms=noise, seed=seed),
        jnp.float32)


def test_band_mask_values():
    cfg = PipelineConfig(band_hz=(800.0, 6000.0))
    m = xcorr.band_mask(cfg)
    freqs = np.arange(m.size) * cfg.sample_rate_hz / cfg.fft_length
    assert m.dtype == np.float32
    assert set(np.unique(m)) <= {0.0, 1.0}
    assert (m[(freqs >= 800) & (freqs <= 6000)] == 1).all()
    assert (m[freqs < 800] == 0).all() and (m[freqs > 6000] == 0).all()
    assert xcorr.band_mask(PipelineConfig()) is None


def test_mxu_fft_band_parity():
    """Masked-synthesis MXU path == cross-power-masked FFT path."""
    frames = _scene_frames()
    cfg = PipelineConfig(phat=True, band_hz=(800.0, 6000.0))
    c_fft = np.asarray(xcorr.xcorr_fft(frames, PAIRS, cfg))
    c_mxu = np.asarray(mxu_fft.xcorr_mxu(frames, PAIRS, cfg))
    np.testing.assert_allclose(
        c_mxu, c_fft, rtol=2e-3, atol=2e-4 * np.abs(c_fft).max())


def test_fused_kernel_band_parity():
    """The fused Pallas kernel (interpret mode) with band_hz matches the
    unfused path, including the disabled Nyquist reconstruction."""
    from audio_triangulation_tpu.ops.pallas import gcc_kernel

    frames = _scene_frames()
    cfg = PipelineConfig(phat=True, band_hz=(800.0, 6000.0),
                         fused_kernel="on")
    from audio_triangulation_tpu.ops.window import window_for

    win = jnp.asarray(np.asarray(window_for(cfg), np.float32))
    fused = gcc_kernel.fused_gcc(
        frames, win, np.asarray(PAIRS), cfg, tile_b=frames.shape[0],
        interpret=True)
    from audio_triangulation_tpu.models.localizer import condition_frames
    cond = condition_frames(frames, win, cfg)
    ref = mxu_fft.xcorr_mxu(cond, PAIRS, cfg)
    l = ref.shape[-1]
    np.testing.assert_allclose(
        np.asarray(fused)[..., :l], np.asarray(ref), rtol=2e-3,
        atol=2e-4 * float(jnp.abs(ref).max()))


def test_beta_parity_mxu_vs_fft():
    frames = _scene_frames()
    cfg = PipelineConfig(phat=True, phat_beta=0.5)
    c_fft = np.asarray(xcorr.xcorr_fft(frames, PAIRS, cfg))
    c_mxu = np.asarray(mxu_fft.xcorr_mxu(frames, PAIRS, cfg))
    np.testing.assert_allclose(
        c_mxu, c_fft, rtol=2e-3, atol=2e-4 * np.abs(c_fft).max())


def test_band_phat_fixes_chirp_scene():
    """The headline fix: full PHAT is >10 cm off on the band-limited chirp
    scene; band-limited PHAT and PHAT-beta both restore cm-level."""
    frames = _scene_frames()
    plane = np.array([0.8, 0.5])

    def err(**kw):
        loc = Localizer.create(MICS, PipelineConfig(**kw))
        return np.linalg.norm(np.asarray(loc(frames)["xy"])[0] - plane)

    assert err(phat=True) > 0.10  # the failure is real
    assert err(phat=True, band_hz=(800.0, 6000.0)) < 0.03
    assert err(phat=True, phat_beta=0.5) < 0.03
    assert err() < 0.01  # unwhitened baseline is fine either way


def test_beta_gates_fused_path():
    from audio_triangulation_tpu.models.localizer import _fused_tile

    cfg = PipelineConfig(phat=True, phat_beta=0.5, fused_kernel="on")
    assert _fused_tile(cfg, 4, 1024) is None
    # band_hz does NOT gate the fused kernel (mask folds into matrices)
    cfg2 = PipelineConfig(phat=True, band_hz=(800.0, 6000.0),
                          fused_kernel="on")
    assert _fused_tile(cfg2, 4, 1024) == cfg2.fused_tile_b


def test_full_band_mask_is_identity():
    frames = _scene_frames()
    cfg0 = PipelineConfig(phat=True)
    nyq = cfg0.sample_rate_hz / 2
    cfg1 = PipelineConfig(phat=True, band_hz=(0.0, nyq))
    c0 = np.asarray(mxu_fft.xcorr_mxu(frames, PAIRS, cfg0))
    c1 = np.asarray(mxu_fft.xcorr_mxu(frames, PAIRS, cfg1))
    np.testing.assert_allclose(c1, c0, rtol=1e-6, atol=1e-7)


def test_band_crop_matches_masked():
    """The band-crop fast path (only in-band bins computed) produces the
    same correlograms as the masked full-band form, on the XLA-MXU path
    and the fused kernel."""
    from audio_triangulation_tpu.ops.pallas import gcc_kernel
    from audio_triangulation_tpu.ops.window import window_for
    from audio_triangulation_tpu.models.localizer import condition_frames

    frames = _scene_frames()
    base = dict(phat=True, band_hz=(800.0, 6000.0))
    cfg_m = PipelineConfig(**base)
    cfg_c = PipelineConfig(**base, band_crop=True)
    c_mask = np.asarray(mxu_fft.xcorr_mxu(frames, PAIRS, cfg_m))
    c_crop = np.asarray(mxu_fft.xcorr_mxu(frames, PAIRS, cfg_c))
    np.testing.assert_allclose(
        c_crop, c_mask, rtol=1e-5, atol=1e-6 * np.abs(c_mask).max())

    win = jnp.asarray(np.asarray(window_for(cfg_c), np.float32))
    fused = gcc_kernel.fused_gcc(
        frames, win, np.asarray(PAIRS), cfg_c, tile_b=frames.shape[0],
        interpret=True)
    cond = condition_frames(frames, win, cfg_c)
    ref = mxu_fft.xcorr_mxu(cond, PAIRS, cfg_c)
    l = ref.shape[-1]
    np.testing.assert_allclose(
        np.asarray(fused)[..., :l], np.asarray(ref), rtol=2e-3,
        atol=2e-4 * float(jnp.abs(ref).max()))


def test_band_crop_e2e_localizes():
    frames = _scene_frames()
    plane = np.array([0.8, 0.5])
    loc = Localizer.create(MICS, PipelineConfig(
        phat=True, band_hz=(800.0, 6000.0), band_crop=True))
    xy = np.asarray(loc(frames)["xy"])[0]
    assert np.linalg.norm(xy - plane) < 0.03, xy


def test_band_crop_shapes():
    cfg = PipelineConfig(band_hz=(800.0, 6000.0), band_crop=True)
    lo, hi = mxu_fft.crop_bins(cfg)
    f_full = cfg.fft_length // 2 + 1
    assert 0 < hi - lo < f_full // 3  # ~21% of the band
    x = jnp.zeros((2, 3, cfg.frame_size), jnp.float32)
    re, im = mxu_fft.forward_spectra_band(x, cfg.fft_length, lo, hi)
    assert re.shape == (2, 3, hi - lo)


def test_srp_freq_honors_band():
    """Frequency-domain estimators restrict their bins to band_hz (and
    still localize)."""
    from audio_triangulation_tpu.core.config import GridConfig
    from audio_triangulation_tpu.ops import srp_freq

    grid = GridConfig(half_cells_x=16, half_cells_y=16, cells_per_m=12.0)
    pairs = geometry.mic_pairs(3)
    cfg_b = PipelineConfig(band_hz=(800.0, 6000.0))
    _, _, bins_b = srp_freq.freq_steering_matrices(
        grid, MICS, pairs, cfg_b)
    freqs = bins_b * cfg_b.sample_rate_hz / cfg_b.fft_length
    assert freqs.min() >= 800 and freqs.max() <= 6000
    _, _, bins_full = srp_freq.freq_steering_matrices(
        grid, MICS, pairs, PipelineConfig())
    assert bins_b.size < bins_full.size

    a, bins_m, w = srp_freq.mic_steering_vectors(grid, MICS, cfg_b)
    freqs_m = bins_m * cfg_b.sample_rate_hz / cfg_b.fft_length
    assert freqs_m.min() >= 800 and freqs_m.max() <= 6000
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)

    frames = _scene_frames()
    out = srp_freq.localize_freq(frames, MICS, grid, cfg_b)
    xy = np.asarray(out["xy_grid"])[0]
    assert np.linalg.norm(xy - [0.8, 0.5]) < 0.15, xy


def test_validate_rejects_bad_band_and_beta():
    # __post_init__ validates at construction
    with pytest.raises(ValueError):
        PipelineConfig(band_hz=(6000.0, 800.0))
    with pytest.raises(ValueError):
        PipelineConfig(band_hz=(0.0, 50_000.0))  # > nyquist
    with pytest.raises(ValueError):
        PipelineConfig(phat_beta=0.0)
    with pytest.raises(ValueError):
        PipelineConfig(phat_beta=1.5)
    with pytest.raises(ValueError):
        PipelineConfig(band_hz=(800.0, 6000.0), xcorr_mode="time")
    with pytest.raises(ValueError):
        PipelineConfig(band_crop=True)  # requires band_hz
