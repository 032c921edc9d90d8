"""Bit-exact validation of the integer ops against the golden C-semantics
model (SURVEY.md §4: unit tests with a NumPy port of the C as oracle)."""

import pytest
import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.ops import conditioning, window as window_ops, xcorr
from audio_triangulation_tpu.utils import golden

pytestmark = pytest.mark.smoke  # golden C-semantics bit-exactness


CFG = PipelineConfig()


def _random_u8_frames(rng, b=2, m=3, n=1024):
    """Frames resembling post-trigger ring contents (8-bit ADC, DC ~128)."""
    base = rng.integers(100, 156, size=(b, m, n))
    burst = (80 * np.sin(np.linspace(0, 60, n)) *
             np.exp(-((np.arange(n) - 512) / 150.0) ** 2))
    return np.clip(base + burst, 0, 255).astype(np.uint8)


def test_window_table_q15_matches_reference_shape():
    t = golden.window_table_q15()
    assert t.shape == (1024,)
    assert t.max() == 32767
    assert t.dtype == np.int32
    # symmetric-ish, peaked mid-table (window_function.h:37-38)
    assert abs(int(np.argmax(t)) - 512) <= 1


def test_dc_remove_int_matches_golden(rng):
    frames = _random_u8_frames(rng)
    ours = np.asarray(
        conditioning.dc_remove_int(jnp.asarray(frames.astype(np.int16)), 10)
    )
    for b in range(frames.shape[0]):
        for m in range(frames.shape[1]):
            total = int(frames[b, m].astype(np.int64).sum())
            offset = total >> 10
            ref = (frames[b, m].astype(np.int64) - offset).astype(np.int16)
            np.testing.assert_array_equal(ours[b, m], ref)


def test_normalize_shift8_matches_golden(rng):
    frames = rng.integers(-300, 300, size=(4, 1024)).astype(np.int16)
    ours = np.asarray(conditioning.normalize_shift8_int(jnp.asarray(frames)))
    ref = np.stack([golden.normalize_shift8(f) for f in frames])
    np.testing.assert_array_equal(ours, ref)


def test_normalize_full_range_matches_golden(rng):
    frames = rng.integers(-3000, 3000, size=(4, 1024)).astype(np.int16)
    ours = np.asarray(conditioning.normalize_full_range_int(jnp.asarray(frames)))
    ref = np.stack([golden.normalize_full_range(f) for f in frames])
    np.testing.assert_array_equal(ours, ref)


def test_apply_window_q15_matches_golden(rng):
    table = golden.window_table_q15()
    frames = rng.integers(-32768, 32767, size=(3, 1024)).astype(np.int16)
    ours = np.asarray(
        window_ops.apply_window_q15(jnp.asarray(frames), jnp.asarray(table))
    )
    ref = np.stack([golden.apply_window(f, table) for f in frames])
    np.testing.assert_array_equal(ours, ref)


def test_xcorr_time_int_matches_golden(rng):
    a = rng.integers(-20000, 20000, size=1024).astype(np.int16)
    b = np.roll(a, 7) + rng.integers(-500, 500, size=1024).astype(np.int16)
    b = b.astype(np.int16)
    frames = jnp.asarray(np.stack([a, b])[None])  # [1, 2, N]
    pairs = jnp.asarray([[0, 1]], dtype=jnp.int32)
    ours = np.asarray(xcorr.xcorr_time_int(frames, pairs, CFG.max_shift))[0, 0]
    ref, best = golden.xcorr_init(a, b, taper=False)
    np.testing.assert_array_equal(ours, ref)
    shifts = np.asarray(xcorr.best_lag(jnp.asarray(ours)[None], CFG.max_shift))
    assert shifts[0] == best


def test_peak_taper_int_matches_golden(rng):
    a = rng.integers(-20000, 20000, size=1024).astype(np.int16)
    b = np.roll(a, -5).astype(np.int16)
    ref_tapered, _ = golden.xcorr_init(a, b, taper=True)
    frames = jnp.asarray(np.stack([a, b])[None])
    pairs = jnp.asarray([[0, 1]], dtype=jnp.int32)
    raw = xcorr.xcorr_time_int(frames, pairs, CFG.max_shift)
    ours = np.asarray(xcorr.peak_taper_int(raw, CFG.max_shift))[0, 0]
    np.testing.assert_array_equal(ours, ref_tapered)


def test_ema_int_matches_golden(rng):
    est = rng.integers(-10**12, 10**12, size=93).astype(np.int64)
    new = rng.integers(-10**12, 10**12, size=93).astype(np.int64)
    for dt in (0.05, 0.5, 3.0):
        ref, ref_best = golden.xcorr_average(est, new, dt)
        ours = np.asarray(
            xcorr.ema_update_int(jnp.asarray(est), jnp.asarray(new), dt)
        )
        np.testing.assert_array_equal(ours, ref)


def test_full_event_burst_matches_golden(rng):
    """End-to-end int path: u8 frames -> conditioned -> xcorr -> taper."""
    from audio_triangulation_tpu.models.localizer import localize_frames_int
    from audio_triangulation_tpu.core import geometry

    frames = _random_u8_frames(rng, b=1)
    table = golden.window_table_q15()
    mics = golden.mic_locations()
    pairs = geometry.mic_pairs(3)
    luts = golden.heatmap_luts(mics)
    lut_flat = luts.reshape(3, -1).astype(np.int32)

    out = localize_frames_int(
        jnp.asarray(frames), jnp.asarray(pairs), jnp.asarray(table),
        jnp.asarray(lut_flat), CFG,
    )

    # golden path on the same frames
    exp_corr, exp_best = [], []
    gframes = []
    for m in range(3):
        f = frames[0, m].astype(np.int64)
        offset = int(f.sum()) >> 10
        f16 = (f - offset).astype(np.int16)
        f16 = golden.normalize_shift8(f16)
        f16 = golden.apply_window(f16, table)
        gframes.append(f16)
    for i, j in ((0, 1), (0, 2), (1, 2)):
        c, s = golden.xcorr_init(gframes[i], gframes[j], taper=True)
        exp_corr.append(c)
        exp_best.append(s)

    np.testing.assert_array_equal(
        np.asarray(out["frames_conditioned"])[0], np.stack(gframes))
    np.testing.assert_array_equal(
        np.asarray(out["correlograms"])[0], np.stack(exp_corr))
    np.testing.assert_array_equal(
        np.asarray(out["best_shift"])[0], np.asarray(exp_best))

    # SRP scores + heat levels vs golden heatmap
    ref_scores = golden.srp_scores(luts, *exp_corr)
    np.testing.assert_array_equal(
        np.asarray(out["scores"])[0].reshape(101, 101), ref_scores)
    ref_levels = golden.heatmap_colors(ref_scores)
    np.testing.assert_array_equal(
        np.asarray(out["heat_levels"])[0].reshape(101, 101), ref_levels)


def test_normalize_none_and_window_disabled(rng):
    """Config branches: normalize 'none' and window off pass frames through."""
    import jax.numpy as jnp

    from audio_triangulation_tpu.models.localizer import condition_frames

    cfg = PipelineConfig(normalize_mode="none", window_enabled=False)
    frames = rng.normal(size=(2, 3, 1024)).astype(np.float32)
    win = jnp.ones((1024,), jnp.float32)
    out = np.asarray(condition_frames(jnp.asarray(frames), win, cfg))
    ref = frames - frames.mean(-1, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)
