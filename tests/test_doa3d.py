"""Spherical (azimuth + elevation) SRP DoA (models.doa.Doa3dEstimator):
Fibonacci-lattice steering over unit bearings + dimension-generic LS
bearing refinement.  New capability beyond the reference (whose only
spatial model is the planar near-field grid, vga_heatmap.h:48-93)."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.doa import (
    Doa3dEstimator, sphere_directions, sphere_lag_lut)
from audio_triangulation_tpu.ops import solver as solver_ops
from audio_triangulation_tpu.utils import synth

FS = 50_000.0
C = 343.0


def _bearing(az_deg, el_deg):
    az, el = np.radians(az_deg), np.radians(el_deg)
    return np.array([np.cos(el) * np.cos(az),
                     np.cos(el) * np.sin(az),
                     np.sin(el)])


def _farfield_frames(mics3, az_deg, el_deg, seed=0, noise=0.003):
    """Plane wave from bearing (az, el): per-mic delays -m.u/c."""
    rng = np.random.default_rng(seed)
    u = _bearing(az_deg, el_deg)
    tau = -(np.asarray(mics3, np.float64) @ u) / C * FS  # samples
    sig = synth.chirp_burst(1024, FS)
    out = synth.fractional_delay(
        np.broadcast_to(sig, (mics3.shape[0], 1024)), tau)
    return jnp.asarray(
        (out + rng.normal(0, noise, out.shape))[None], jnp.float32)


def test_sphere_directions_lattice():
    full = sphere_directions(512)
    assert full.shape == (512, 3)
    np.testing.assert_allclose(np.linalg.norm(full, axis=1), 1.0, atol=1e-5)
    # near-uniform: both hemispheres covered about equally
    assert abs(int((full[:, 2] > 0).sum()) - 256) <= 1
    hemi = sphere_directions(512, hemisphere=True)
    assert (hemi[:, 2] >= 0).all()


def test_sphere_lut_matches_direct_tdoa():
    mics = geometry.tetrahedral_array(0.3)
    pairs = geometry.mic_pairs(4)
    cfg = PipelineConfig(
        max_shift_samples=geometry.max_lag_for_array(mics, PipelineConfig()))
    dirs = sphere_directions(64)
    lut = sphere_lag_lut(mics, pairs, cfg, dirs)
    d = np.asarray(mics)[pairs[:, 1]] - np.asarray(mics)[pairs[:, 0]]
    tau = -(d @ dirs.T) / C * FS
    k = cfg.max_shift
    want = np.clip(np.trunc(tau + np.copysign(0.5, tau)), -k, k) + k
    np.testing.assert_array_equal(lut, want.astype(np.int32))


def test_farfield_bearing_3d_exact():
    """Dimension-generic LS bearing: exact sub-sample TDOAs -> exact u."""
    mics = jnp.asarray(geometry.tetrahedral_array(0.3), jnp.float64)
    pairs = geometry.mic_pairs(4)
    u_true = _bearing(210.0, 35.0)
    d = np.asarray(mics)[pairs[:, 1]] - np.asarray(mics)[pairs[:, 0]]
    tdoas = -(d @ u_true) / C  # seconds
    u = solver_ops.farfield_bearing(
        jnp.asarray(tdoas)[None], mics, jnp.asarray(pairs), C)
    assert np.linalg.norm(np.asarray(u[0]) - u_true) < 1e-6


def test_doa3d_tetra_recovers_az_el():
    mics = geometry.tetrahedral_array(0.3)
    cfg = PipelineConfig(
        phat=True, window_enabled=False,
        max_shift_samples=geometry.max_lag_for_array(mics, PipelineConfig()))
    est = Doa3dEstimator.create(mics, cfg, n_dirs=1024)
    for az, el, seed in ((40.0, 25.0, 1), (200.0, -15.0, 2),
                         (310.0, 60.0, 3)):
        out = est(_farfield_frames(mics, az, el, seed=seed))
        got_az = float(out["azimuth_deg"][0])
        got_el = float(out["elevation_deg"][0])
        az_err = abs((got_az - az + 180.0) % 360.0 - 180.0)
        assert az_err < 3.0, (az, el, got_az, got_el)
        assert abs(got_el - el) < 3.0, (az, el, got_az, got_el)
        # refined bearing agrees with the lattice peak to lattice resolution
        u_grid = np.asarray(out["bearing_grid"][0])
        assert float(u_grid @ _bearing(az, el)) > 0.99


def test_doa3d_default_config_auto_widens_lag_window():
    """Regression: ``Doa3dEstimator.create`` with the DEFAULT pipeline must
    widen max_shift to the array aperture like VolumeLocalizer.create does.
    The reference's fixed +-46 (constants.h:12) clips the tetrahedral
    array's +-73-sample pair TDOAs, which used to saturate the LUT and
    return ~179 deg azimuth for a 310-deg source with no warning."""
    mics = geometry.tetrahedral_array(0.3)
    est = Doa3dEstimator.create(mics)  # default PipelineConfig(phat=True)
    need = geometry.max_lag_for_array(
        np.pad(mics, [(0, 0), (0, 3 - mics.shape[1])]), PipelineConfig())
    assert est.pipeline.max_shift >= need
    out = est(_farfield_frames(mics, 310.0, 40.0, seed=3))
    az_err = abs((float(out["azimuth_deg"][0]) - 310.0 + 180.0) % 360.0
                 - 180.0)
    assert az_err < 4.0
    assert abs(float(out["elevation_deg"][0]) - 40.0) < 4.0
    # an explicit max_shift_samples is respected, not overridden
    est2 = Doa3dEstimator.create(mics, PipelineConfig(max_shift_samples=50))
    assert est2.pipeline.max_shift == 50


def test_doa3d_coplanar_hemisphere():
    """A planar array auto-selects the upper hemisphere: azimuth stays
    LS-sharp, elevation is grid-coarse but unambiguous (>= 0)."""
    mics = geometry.circular_array(6, 0.12)  # [6, 2] planar
    cfg = PipelineConfig(
        phat=True, window_enabled=False,
        max_shift_samples=geometry.max_lag_for_array(mics, PipelineConfig()))
    est = Doa3dEstimator.create(mics, cfg, n_dirs=1024)
    assert bool(np.asarray(est.dirs)[:, 2].min() >= 0)
    m3 = np.zeros((6, 3))
    m3[:, :2] = np.asarray(mics)
    out = est(_farfield_frames(m3, 120.0, 30.0, seed=4))
    az_err = abs((float(out["azimuth_deg"][0]) - 120.0 + 180.0) % 360.0
                 - 180.0)
    assert az_err < 3.0
    el = float(out["elevation_deg"][0])
    assert 0.0 <= el <= 90.0
    assert abs(el - 30.0) < 12.0  # grid + small-aperture coarseness
