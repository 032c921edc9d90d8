"""Volumetric (3-D) SRP localization: full-box grid search + free-xyz
Gauss-Newton refinement (generalizes the reference's fixed-height grid,
vga_heatmap.h:48-93 / vga.h:35)."""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import PipelineConfig, VolumeConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.volume import (
    VolumeLocalizer, volume_peak_xyz)
from audio_triangulation_tpu.utils import synth

MICS_T = geometry.tetrahedral_array(0.3)
# Accuracy-oriented config: PHAT confined to the chirp band (out-of-band
# bins are pure noise and PHAT weights them equally), window disabled (the
# DPSS taper amplitude-modulates frames whose inter-mic delays here reach
# +/-61 samples, biasing the correlation peak by ~1 sample).
CFG_T = PipelineConfig(
    phat=True,
    band_hz=(700.0, 7000.0),
    window_enabled=False,
    max_shift_samples=geometry.max_lag_for_array(MICS_T, PipelineConfig()))
VOL = VolumeConfig(half_cells_x=16, half_cells_y=16, cells_per_m=10.0,
                   z_min_m=0.3, z_max_m=2.1, z_cells=19)


def _frames(src, noise=0.005, seed=4):
    return jnp.asarray(
        synth.synth_scene(src, MICS_T, noise_rms=noise, seed=seed),
        jnp.float32)


def test_tetrahedral_array_geometry():
    m = MICS_T
    assert m.shape == (4, 3)
    r = np.linalg.norm(m, axis=-1)
    np.testing.assert_allclose(r, 0.3, rtol=1e-6)
    np.testing.assert_allclose(m.mean(axis=0), 0.0, atol=1e-7)
    # all 6 edges equal (regular tetrahedron)
    pairs = geometry.mic_pairs(4)
    d = geometry.pair_distances(m, pairs)
    np.testing.assert_allclose(d, d[0], rtol=1e-6)


def test_volume_lut_matches_planar_slice():
    """A 1-slice volume at z = height_m must reproduce the planar
    (projection='plane') lag LUT exactly."""
    from audio_triangulation_tpu.core.config import GridConfig

    mics = geometry.circular_array(6, 0.2)
    cfg = PipelineConfig()
    pairs = geometry.mic_pairs(6)
    grid = GridConfig(half_cells_x=12, half_cells_y=12, cells_per_m=12.0,
                      height_m=1.1, projection="plane")
    vol = VolumeConfig(half_cells_x=12, half_cells_y=12, cells_per_m=12.0,
                       z_min_m=1.1, z_max_m=1.1, z_cells=1)
    lut2 = geometry.lag_lut(grid, mics, pairs, cfg)          # [P, H, W]
    lut3 = geometry.volume_lag_lut(vol, mics, pairs, cfg)    # [P, 1, H, W]
    np.testing.assert_array_equal(lut3[:, 0], lut2)


def test_volume_localizes_xyz():
    """Source anywhere in the box: grid peak within a cell, GN within cm."""
    loc = VolumeLocalizer.create(MICS_T, CFG_T, VOL)
    src = np.array([[0.5, -0.3, 1.4], [-0.8, 0.6, 0.7]])
    out = loc(_frames(src))
    xyz_g = np.asarray(out["xyz_grid"])
    xyz = np.asarray(out["xyz"])
    cell = 1.0 / VOL.cells_per_m
    for b in range(2):
        assert np.linalg.norm(xyz_g[b] - src[b]) < 1.5 * cell, (
            b, xyz_g[b], src[b])
        # ~0.2-sample residual TDOA error x the 0.3 m array's 3-D GDOP at
        # 1.5 m range ~= several cm; match the planar e2e tolerance.
        assert np.linalg.norm(xyz[b] - src[b]) < 0.10, (b, xyz[b], src[b])


def test_volume_resolves_height():
    """Two sources sharing (x, y) at different heights — the axis the
    reference's fixed-height grid cannot see — come back separated."""
    loc = VolumeLocalizer.create(MICS_T, CFG_T, VOL)
    src = np.array([[0.4, 0.2, 0.6], [0.4, 0.2, 1.8]])
    xyz = np.asarray(loc(_frames(src))["xyz"])
    assert abs(xyz[0, 2] - 0.6) < 0.1, xyz[0]
    assert abs(xyz[1, 2] - 1.8) < 0.1, xyz[1]


def test_volume_peak_refinement_subcell():
    """Per-axis parabolic refinement recovers a smooth bump's continuous
    maximum to well under a cell."""
    vol = VolumeConfig(half_cells_x=8, half_cells_y=8, cells_per_m=10.0,
                       z_min_m=0.5, z_max_m=1.5, z_cells=11)
    true = np.array([0.234, -0.158, 0.973])
    pts = geometry.volume_points(vol).astype(np.float64)  # [D, H, W, 3]
    d2 = ((pts - true) ** 2).sum(-1)
    scores = jnp.asarray(np.exp(-d2 / 0.08).reshape(-1), jnp.float32)
    xyz = np.asarray(volume_peak_xyz(scores[None], vol, refine=True))[0]
    assert np.linalg.norm(xyz - true) < 0.03, (xyz, true)
    # unrefined is cell-quantized: refinement must be strictly better
    xyz0 = np.asarray(volume_peak_xyz(scores[None], vol, refine=False))[0]
    assert (np.linalg.norm(xyz - true) < np.linalg.norm(xyz0 - true))


def test_volume_gather_form_matches_matmul():
    """srp_form='gather' and 'matmul' score identically."""
    lm = VolumeLocalizer.create(MICS_T, CFG_T, VOL, srp_form="matmul")
    lg = VolumeLocalizer.create(MICS_T, CFG_T, VOL, srp_form="gather")
    fr = _frames(np.array([[0.5, -0.3, 1.4]]))
    sm = np.asarray(lm(fr)["scores"])
    sg = np.asarray(lg(fr)["scores"])
    np.testing.assert_allclose(sm, sg, rtol=1e-5, atol=1e-5 * sm.max())


def test_volume_rejects_bad_frames():
    loc = VolumeLocalizer.create(MICS_T, CFG_T, VOL)
    with pytest.raises(ValueError):
        loc(jnp.zeros((2, 3, CFG_T.frame_size)))  # wrong mic count


# ---------------------------------------------------------------------
# Planar-array height recovery (originally tests/test_volumetric.py,
# consolidated when models/volumetric merged into models/volume)
# ---------------------------------------------------------------------

# a planar array cannot resolve the z sign; use sources above the array
# and a z range strictly > 0.  Range observability needs aperture: 0.5 m.
MICS8 = geometry.circular_array(8, 0.5)
VOL8 = VolumeConfig(half_cells_x=24, half_cells_y=24, cells_per_m=16.0,
                    z_min_m=0.4, z_max_m=1.2, z_cells=5)


def test_planar_array_recovers_xyz():
    # plain GCC: on clean additive-noise scenes its sub-sample TDOAs are
    # ~100x tighter than PHAT's (see BENCH_ACCURACY.json), which the
    # weakly observable range direction needs
    vl = VolumeLocalizer.create(MICS8, PipelineConfig(), VOL8)
    sources = np.array([
        [0.3, 0.2, 0.6],
        [-0.3, 0.4, 1.0],
        [0.5, -0.3, 0.8],
    ])
    frames = synth.synth_scene(sources, MICS8, noise_rms=0.01, seed=61)
    out = vl(jnp.asarray(frames, jnp.float32))
    xyz = np.asarray(out["xyz"])
    for i, s in enumerate(sources):
        # the free-xyz GN refinement resolves the coarse grid to cm level
        assert np.linalg.norm(xyz[i] - s) < 0.05, (i, xyz[i], s)


def test_z_refinement_resolves_range_ambiguity():
    """Integer-lag SRP grids are nearly flat along the source ray (range
    is weakly observable from rounded lags), so the coarse z argmax can
    land a plane off — the free-xyz GN refinement from sub-sample TDOAs
    is what pins the height."""
    vol = VolumeConfig(half_cells_x=24, half_cells_y=24, cells_per_m=16.0,
                       z_min_m=0.4, z_max_m=1.2, z_cells=3)
    vl = VolumeLocalizer.create(MICS8, PipelineConfig(), vol)
    src = np.array([[0.2, 0.4, 0.8]])
    frames = synth.synth_scene(src, MICS8, noise_rms=0.0, seed=62)
    out = vl(jnp.asarray(frames, jnp.float32))
    # coarse argmax: within one z plane of truth
    zi = int(np.asarray(out["scores"])[0].argmax()) \
        // (vol.height * vol.width)
    assert abs(zi - 1) <= 1
    # refined: centimeter-level height
    assert abs(float(out["xyz"][0, 2]) - 0.8) < 0.05


def test_streaming_solve_xyz():
    """stream.solve_xyz: the live path emits a free-3-D position from each
    step's smoothed TDOAs (multi-start GN, no volumetric grid in the loop),
    ready for a dim=3 tracker."""
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    rng = np.random.default_rng(31)
    src = np.array([0.4, -0.3, 1.7])  # well off the default plane height
    # ADC-scale stream (the detector threshold is the firmware's int
    # formula): mid-scale DC + small noise + strong bursts
    streams = rng.integers(127, 130, size=(4, 30_000)).astype(np.float64)
    for at in (8_000, 20_000):
        fr = synth.synth_scene(src, MICS_T, noise_rms=0.0,
                               seed=int(at))[0]
        streams[:, at: at + 1024] += 110.0 * fr
    streams = np.clip(np.round(streams), 0, 255)

    sl = StreamingLocalizer.create(
        MICS_T, CFG_T,
        stream=StreamConfig(chunk_size=512, solve_xyz=True,
                            xyz_z_inits=(0.4, 1.2, 2.0)),
        with_solver=True)
    state = sl.init_state()
    got = None
    for i in range(0, 30_000 - 30_000 % 512, 512):
        state, out = sl(state, jnp.asarray(streams[:, i: i + 512]))
        if bool(out["event"]):
            got = np.asarray(out["xyz"])
    assert got is not None, "no events detected"
    assert np.linalg.norm(got - src) < 0.12, (got, src)
    assert abs(got[2] - 1.7) < 0.12, got


def test_xyz_multistart_recovers_overhead_source():
    """The motivating case for solve_tdoa_xyz_multistart: a nearly overhead
    source, where range enters only through wavefront curvature and a
    single plane-height GN init stalls.  Exact TDOAs -> <1 cm."""
    from audio_triangulation_tpu.ops import solver as solver_ops

    pairs = geometry.mic_pairs(MICS_T.shape[0])
    src = np.array([0.02, -0.01, 1.9])
    d = np.linalg.norm(np.asarray(MICS_T, np.float64) - src, axis=1)
    # ops.solver convention: tau_p = (d_j - d_i) / c (pair_selection)
    td = (d[pairs[:, 1]] - d[pairs[:, 0]]) / CFG_T.speed_of_sound_mps

    xyz, rms = solver_ops.solve_tdoa_xyz_multistart(
        jnp.asarray(td, jnp.float64)[None],
        jnp.asarray(MICS_T, jnp.float64), jnp.asarray(pairs),
        speed_of_sound=CFG_T.speed_of_sound_mps,
        init_xy=jnp.zeros((1, 2), jnp.float64))
    assert np.linalg.norm(np.asarray(xyz[0]) - src) < 0.01, np.asarray(xyz)
    assert float(rms[0]) < 1e-6
