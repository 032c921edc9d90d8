"""SMP pair merging for azimuth SRP (Grondin et al., arXiv:2203.14409).

Same-displacement pairs share the far-field TDOA at every bearing, so
their cross-power can be summed into one correlogram before synthesis —
exact for the azimuth scores, with far fewer synthesis/steering rows on
regular arrays.
"""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import PipelineConfig, geometry
from audio_triangulation_tpu.models.doa import DoaEstimator, merge_pairs
from audio_triangulation_tpu.utils import synth


def _linear_array(n=8, pitch=0.04):
    mics = np.zeros((n, 2), np.float32)
    mics[:, 0] = (np.arange(n) - (n - 1) / 2) * pitch
    return mics


def _farfield_frames(mics, az_deg, seed=0, noise=0.005):
    """Plane wave from bearing az_deg: per-mic delays -m.u/c."""
    rng = np.random.default_rng(seed)
    u = np.array([np.cos(np.radians(az_deg)), np.sin(np.radians(az_deg))])
    tau = -(mics @ u) / 343.0 * 50_000.0  # samples
    sig = synth.chirp_burst(1024, 50_000.0)
    out = synth.fractional_delay(
        np.broadcast_to(sig, (mics.shape[0], 1024)), tau)
    return jnp.asarray(
        (out + rng.normal(0, noise, out.shape))[None], jnp.float32)


def test_merge_pairs_linear_array():
    mics = _linear_array(8)
    pairs = geometry.mic_pairs(8)
    merge, disp = merge_pairs(mics, pairs)
    assert merge.shape == (28, 7)  # 28 pairs -> 7 unique baselines
    assert (merge.sum(axis=1) == 1).all()  # every pair in exactly 1 group
    # group sizes: baseline k*pitch appears (8 - k) times
    sizes = np.sort(merge.sum(axis=0))
    np.testing.assert_array_equal(sizes, np.arange(1, 8))


def test_merge_pairs_circular_array_mild_collapse():
    """A regular octagon's chords are mostly rotated copies (unmergeable),
    but a few parallel equal chords do coincide: 28 -> 22 groups."""
    mics = geometry.circular_array(8, 0.25)
    pairs = geometry.mic_pairs(8)
    merge, disp = merge_pairs(mics, pairs)
    assert disp.shape[0] == 22
    assert (merge.sum(axis=1) == 1).all()


def test_smp_scores_match_unmerged():
    """Azimuth scores are EXACTLY equal (up to float) with taper off —
    the score is linear in the correlograms."""
    mics = _linear_array(8)
    cfg = PipelineConfig(phat=True, taper_enabled=False)
    est = DoaEstimator.create(mics, cfg, n_azimuths=180)
    est_smp = DoaEstimator.create(mics, cfg, n_azimuths=180, smp=True)
    frames = _farfield_frames(mics, 60.0)
    s0 = np.asarray(est(frames)["scores"])
    s1 = np.asarray(est_smp(frames)["scores"])
    np.testing.assert_allclose(
        s1, s0, rtol=1e-4, atol=1e-4 * np.abs(s0).max())


def test_smp_recovers_bearing():
    mics = _linear_array(8)
    est = DoaEstimator.create(mics, PipelineConfig(phat=True), smp=True)
    for az in (40.0, 120.0):
        out = est(_farfield_frames(mics, az, seed=int(az)))
        got = float(np.asarray(out["azimuth_deg"])[0])
        # a LINEAR array is ambiguous about reflection across its axis
        # (y -> -y): accept either bearing
        alt = (-az) % 360.0
        err = min(abs((got - az + 180) % 360 - 180),
                  abs((got - alt + 180) % 360 - 180))
        assert err < 4.0, (az, got)


def test_smp_with_band_crop():
    mics = _linear_array(8)
    cfg = PipelineConfig(phat=True, band_hz=(800.0, 6000.0),
                         band_crop=True)
    est = DoaEstimator.create(mics, cfg, smp=True)
    out = est(_farfield_frames(mics, 75.0, seed=7))
    got = float(np.asarray(out["azimuth_deg"])[0])
    err = min(abs((got - 75.0 + 180) % 360 - 180),
              abs((got - (-75.0) % 360 + 180) % 360 - 180))
    assert err < 4.0, got


def test_smp_rejects_unsupported_configs():
    import pytest

    mics = _linear_array(8)
    with pytest.raises(ValueError):
        DoaEstimator.create(mics, PipelineConfig(weighting="scot"), smp=True)
    with pytest.raises(ValueError):
        DoaEstimator.create(mics, PipelineConfig(xcorr_mode="fft"), smp=True)
