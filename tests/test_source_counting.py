"""Automatic source counting (wideband Wax-Kailath MDL/AIC).

New capability — MUSIC / multi-source localization / JPDA previously
required the source count as a given; this estimates it from the
per-frequency spatial-covariance eigenvalue structure.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import PipelineConfig, geometry
from audio_triangulation_tpu.core.config import GridConfig
from audio_triangulation_tpu.ops import srp_freq
from audio_triangulation_tpu.utils import synth

MICS = geometry.circular_array(8, 0.25)
CFG = PipelineConfig()


def _place(x, y):
    p = np.array([x, y, 1.2])
    return p * 1.2 / np.linalg.norm(p)


def _snaps(sources, n_snap=24, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for t in range(n_snap):
        fr = np.zeros((MICS.shape[0], 1024))
        for j, src in enumerate(sources):
            sig = synth.colored_burst(1024, 50_000.0, seed=100 * t + j)
            fr = fr + synth.synth_scene(
                src, MICS, signal=sig, noise_rms=0.0, seed=0)[0]
        out.append(fr + rng.normal(0, noise, fr.shape))
    return jnp.asarray(np.stack(out), jnp.float32)


P1 = _place(0.6, -0.4)
P2 = _place(-0.7, 0.5)
P3 = _place(0.1, 0.9)


@pytest.mark.parametrize("criterion", ["mdl", "aic"])
@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_counts_sources(criterion, k):
    frames = _snaps([P1, P2, P3][:k])
    got = srp_freq.estimate_n_sources(frames, CFG, criterion=criterion)
    assert got == k, (criterion, k, got)


def test_band_limit_respected():
    frames = _snaps([P1])
    got = srp_freq.estimate_n_sources(
        frames, PipelineConfig(band_hz=(800.0, 6000.0)))
    assert got == 1


def test_max_sources_cap():
    frames = _snaps([P1, P2])
    got = srp_freq.estimate_n_sources(frames, CFG, max_sources=1)
    assert got == 1


def test_rejects_unknown_criterion():
    with pytest.raises(ValueError):
        srp_freq.estimate_n_sources(_snaps([P1]), CFG, criterion="bic")


def test_music_auto_order():
    """localize_music(n_sources='auto') resolves the count itself and
    still localizes."""
    grid = GridConfig(half_cells_x=24, half_cells_y=24, cells_per_m=16.0)
    frames = _snaps([P1], n_snap=16)
    out = srp_freq.localize_music(frames, MICS, grid, CFG,
                                  n_sources="auto", bin_stride=8)
    xy = np.asarray(out["xy_grid"])
    assert np.linalg.norm(xy - [0.6, -0.4]) < 0.15, xy


def test_doa_music_auto_order():
    """estimate_doa_music(n_sources='auto') counts and resolves both
    bearings."""
    from audio_triangulation_tpu.models.doa import estimate_doa_music

    frames = _snaps([P1, P2], n_snap=20)
    out = estimate_doa_music(frames, MICS, CFG, n_sources="auto",
                             bin_stride=8)
    assert out["n_sources"] == 2
    az = np.sort(np.asarray(out["azimuth_deg"]))
    want = np.sort([np.degrees(np.arctan2(-0.4, 0.6)) % 360,
                    np.degrees(np.arctan2(0.5, -0.7)) % 360])
    assert np.abs(az - want).max() < 10.0, (az, want)


def test_auto_reports_raw_estimate_on_silence():
    """n_sources_estimated exposes the MDL count (0 = silence) even though
    MUSIC itself runs with a clamped >=1 subspace."""
    grid = GridConfig(half_cells_x=12, half_cells_y=12, cells_per_m=12.0)
    frames = _snaps([], n_snap=16)
    out = srp_freq.localize_music(frames, MICS, grid, CFG,
                                  n_sources="auto", bin_stride=8)
    assert out["n_sources_estimated"] == 0
    assert out["n_sources"] == 1
