"""Fused GCC Pallas kernel (interpret mode on CPU) vs the unfused MXU path."""

import pytest
import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.ops import mxu_fft
from audio_triangulation_tpu.ops.pallas import gcc_kernel
from audio_triangulation_tpu.ops import window as window_ops

pytestmark = pytest.mark.smoke  # fused kernel (interpret) parity



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


def test_in_kernel_srp_matches_external(rng):
    """Mode B (srp_onehot given): the kernel's SRP argmax cell and max
    score match the external bf16 matmul + argmax on the same tapered
    correlograms, and the extra outputs leave the first five unchanged."""
    from audio_triangulation_tpu.core.config import GridConfig
    from audio_triangulation_tpu.core import geometry as geo

    cfg = PipelineConfig(fft_pad_mode="circular", phat=True)
    frames, win, pairs = _setup(rng, b=8, m=3)
    mics = geo.reference_array()
    grid = GridConfig(half_cells_x=16, half_cells_y=16, cells_per_m=8.0)
    lut = geo.lag_lut(grid, mics, pairs, cfg)
    oh = geo.lag_onehot(lut, cfg.num_lags)  # [P*L, G]
    p, l, g = pairs.shape[0], cfg.num_lags, oh.shape[-1]
    l_pad = ((l + 127) // 128) * 128
    oh3 = np.zeros((p, l_pad, g), np.float32)
    oh3[:, :l] = oh.reshape(p, l, g)

    base = gcc_kernel.fused_gcc_peaks(
        frames, win, pairs, cfg, tile_b=4, interpret=True)
    got = gcc_kernel.fused_gcc_peaks(
        frames, win, pairs, cfg, tile_b=4, interpret=True,
        srp_onehot=jnp.asarray(oh3))
    assert len(base) == 5 and len(got) == 7
    for a, b_ in zip(base, got[:5]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    corr_t = np.asarray(base[0])  # [B, P, L] tapered
    flat = jnp.asarray(corr_t).astype(jnp.bfloat16).reshape(8, p * l)
    ref_scores = np.asarray(jnp.matmul(
        flat, jnp.asarray(oh).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32))
    cell, score = np.asarray(got[5]), np.asarray(got[6])
    # per-pair f32 partial accumulation vs one flat dot: tiny differences,
    # so compare score values to tolerance and cells via score-equivalence
    np.testing.assert_allclose(
        score, ref_scores.max(-1), rtol=2e-2, atol=1e-3)
    picked = ref_scores[np.arange(8), cell]
    np.testing.assert_allclose(
        picked, ref_scores.max(-1), rtol=2e-2, atol=1e-3)


def test_localizer_mode_b_matches_f32_path(rng):
    """End-to-end: the Mode B localizer (bf16 in-kernel SRP + argmax cell)
    agrees with the plain unfused float32 pipeline on solved positions."""
    from audio_triangulation_tpu import Localizer
    from audio_triangulation_tpu.core import geometry as geo
    from audio_triangulation_tpu.utils import synth

    mics = geo.square_array(0.3)
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frames = np.asarray(synth.synth_scene(
        src, mics, noise_rms=0.01, seed=3))
    frames = np.broadcast_to(frames, (8, 4, 1024)).astype(np.float32)

    cfg_b = PipelineConfig(phat=True, fft_pad_mode="circular",
                           srp_dtype="bfloat16", fused_kernel="on",
                           fused_srp="on", fused_tile_b=8)
    loc_b = Localizer.create(mics, cfg_b, with_solver=True,
                             init_grid_stride=3)
    # confirm Mode B is actually active for this configuration
    assert loc_b.srp_form == "matmul"
    assert loc_b.params.onehot_pad is not None

    cfg_f = PipelineConfig(phat=True, fft_pad_mode="circular",
                           fused_kernel="off")
    loc_f = Localizer.create(mics, cfg_f, with_solver=True)

    out_b = loc_b(jnp.asarray(frames))
    out_f = loc_f(jnp.asarray(frames))
    np.testing.assert_allclose(
        np.asarray(out_b["xy"]), np.asarray(out_f["xy"]), atol=2e-3)
    # grid init cell may differ by bf16 rounding, but must be in the basin
    np.testing.assert_allclose(
        np.asarray(out_b["xy_grid"]), np.asarray(out_f["xy_grid"]),
        atol=0.25)
