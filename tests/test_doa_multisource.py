"""DoA model (8-mic circular SRP-PHAT) and multi-source peak extraction."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import GridConfig, PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.doa import DoaEstimator
from audio_triangulation_tpu.ops import srp
from audio_triangulation_tpu.utils import synth

MICS8 = geometry.circular_array(8, 0.15)


def _farfield_frames(az_deg, rng=None, dist=60.0, noise=0.0, seed=0):
    ang = np.deg2rad(az_deg)
    src = np.array([dist * np.cos(ang), dist * np.sin(ang), 0.0])
    return synth.synth_scene(src, MICS8, noise_rms=noise, seed=seed)


def test_doa_recovers_azimuth():
    est = DoaEstimator.create(MICS8)
    for az in (0.0, 37.0, 123.4, 250.0, 359.0):
        frames = _farfield_frames(az, noise=0.005, seed=int(az))
        out = est(jnp.asarray(frames, jnp.float32))
        got = float(out["azimuth_deg"][0])
        err = min(abs(got - az), 360 - abs(got - az))
        assert err < 3.0, (az, got)
        # LS bearing agrees
        u = np.asarray(out["bearing"])[0]
        got_b = np.rad2deg(np.arctan2(u[1], u[0])) % 360
        err_b = min(abs(got_b - az), 360 - abs(got_b - az))
        assert err_b < 5.0, (az, got_b)


def test_doa_batched_shapes():
    est = DoaEstimator.create(MICS8, n_azimuths=180)
    frames = np.concatenate([
        _farfield_frames(40.0, seed=1), _farfield_frames(200.0, seed=2)])
    out = est(jnp.asarray(frames, jnp.float32))
    assert out["scores"].shape == (2, 180)
    assert out["tdoa_samples"].shape == (2, 28)


def test_top_k_peaks_two_sources():
    grid = GridConfig(half_cells_x=32, half_cells_y=32, cells_per_m=16.0)
    pts = geometry.grid_points(grid)  # [H, W, 3]
    cell_xy = jnp.asarray(pts[..., :2].reshape(-1, 2))
    h, w = grid.height, grid.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    bump = (np.exp(-((yy - 20) ** 2 + (xx - 15) ** 2) / 8.0)
            + 0.8 * np.exp(-((yy - 45) ** 2 + (xx - 50) ** 2) / 8.0))
    scores = jnp.asarray(bump.reshape(1, -1).astype(np.float32))
    xys, vals = srp.top_k_peaks(scores, cell_xy, k=2, min_separation_m=0.5)
    xys = np.asarray(xys)[0]
    # strongest first
    assert vals[0, 0] >= vals[0, 1]
    exp0 = pts[20, 15, :2]
    exp1 = pts[45, 50, :2]
    assert np.linalg.norm(xys[0] - exp0) < 0.1
    assert np.linalg.norm(xys[1] - exp1) < 0.1


def test_multisource_scene_end_to_end():
    """Two simultaneous sources -> two SRP peaks at the right cells."""
    from audio_triangulation_tpu import Localizer

    mics = geometry.circular_array(8, 0.15)
    loc = Localizer.create(mics, PipelineConfig(phat=True))
    h = 1.2

    def place(x, y):
        p = np.array([x, y, h])
        return p * (h / np.linalg.norm(p))

    f1 = synth.synth_scene(place(0.9, 0.3), mics, seed=1)
    sig2 = synth.chirp_burst(1024, 50_000.0, f0=2000, f1=9000, center=0.45)
    f2 = synth.synth_scene(place(-0.7, -0.6), mics, signal=sig2, seed=2)
    frames = jnp.asarray(f1 + f2, jnp.float32)

    out = loc(frames)
    pts = geometry.grid_points(loc.grid)
    cell_xy = jnp.asarray(pts[..., :2].reshape(-1, 2))
    # top_k works on plane coords: use the raw plane mapping, not sphere
    xs = (np.arange(loc.grid.width) - loc.grid.half_cells_x) / loc.grid.cells_per_m
    ys = (loc.grid.half_cells_y - np.arange(loc.grid.height)) / loc.grid.cells_per_m
    gx, gy = np.meshgrid(xs, ys)
    plane_xy = jnp.asarray(
        np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32))
    xys, vals = srp.top_k_peaks(out["scores"], plane_xy, k=2,
                                min_separation_m=0.4)
    xys = np.asarray(xys)[0]
    targets = np.array([[0.9, 0.3], [-0.7, -0.6]])
    # each target matched by one of the two peaks within 25 cm
    for t in targets:
        assert min(np.linalg.norm(xys - t, axis=-1)) < 0.25, (xys, t)


# ----------------------------------------------------------------------
# Azimuth-domain MUSIC (subspace DoA)


def _farfield_snapshots(az_list, n_snap=12, noise=0.02, seed=0):
    """Independent (mutually uncorrelated) source signals per snapshot —
    the standard multi-source model; fully coherent sources (identical
    waveforms every snapshot) make the covariance rank-1 and defeat any
    subspace method."""
    rng = np.random.default_rng(seed)
    frames = []
    for s in range(n_snap):
        acc = None
        for k, az in enumerate(az_list):
            sig = synth.colored_burst(
                1024, 50_000.0, cutoff_hz=1500.0,
                seed=seed + 1000 * (k + 1) + s)
            ang = np.deg2rad(az_list[k])
            src = np.array([60.0 * np.cos(ang), 60.0 * np.sin(ang), 0.0])
            f = synth.synth_scene(src, MICS8, signal=sig, noise_rms=0.0,
                                  seed=0)[0]
            acc = f if acc is None else acc + f
        frames.append(acc + rng.normal(0, noise, acc.shape))
    return jnp.asarray(np.stack(frames), jnp.float32)


def test_music_doa_recovers_azimuth():
    from audio_triangulation_tpu.models.doa import estimate_doa_music

    cfg = PipelineConfig()
    for az in (20.0, 137.0, 301.5):
        frames = _farfield_snapshots([az], seed=int(az))
        out = estimate_doa_music(frames, MICS8, cfg, n_sources=1)
        got = float(out["azimuth_deg"][0])
        err = min(abs(got - az), 360 - abs(got - az))
        assert err < 3.0, (az, got)


def test_music_doa_resolves_close_sources():
    """Two simultaneous sources 25 degrees apart: subspace MUSIC separates
    them on the bearing circle."""
    from audio_triangulation_tpu.models.doa import estimate_doa_music

    cfg = PipelineConfig()
    az_a, az_b = 90.0, 115.0
    frames = _farfield_snapshots([az_a, az_b], n_snap=16, seed=3)
    out = estimate_doa_music(frames, MICS8, cfg, n_sources=2,
                             min_separation_deg=10.0)
    got = sorted(float(a) for a in out["azimuth_deg"])
    err_a = min(abs(got[0] - az_a), 360 - abs(got[0] - az_a))
    err_b = min(abs(got[1] - az_b), 360 - abs(got[1] - az_b))
    assert err_a < 6.0 and err_b < 6.0, (got, az_a, az_b)


def test_circular_peaks_wraparound():
    from audio_triangulation_tpu.models.doa import circular_peaks

    s = np.zeros(360)
    s[2] = 10.0   # peak near 0 wrap
    s[359] = 9.0  # should be suppressed by the first (within +-10)
    s[180] = 8.0
    got = circular_peaks(s, 2, 10)
    assert got[0] == 2 and got[1] == 180, got
