"""Edge-case parity semantics locked in: ties, boundaries, degenerate inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import GridConfig, PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.ops import xcorr
from audio_triangulation_tpu.parallel import mesh as mesh_lib
from audio_triangulation_tpu.utils import golden


def test_argmax_tie_first_wins():
    """The reference's strict ``>`` scan keeps the FIRST maximum
    (correlations.c:20-23); jnp.argmax must match on exact ties."""
    corr = np.zeros(93, np.int64)
    corr[10] = 1000
    corr[50] = 1000  # exact tie, later position
    ours = int(xcorr.best_lag(jnp.asarray(corr)[None], 46)[0])
    assert ours == 10 - 46
    # golden agrees
    a = np.zeros(1024, np.int16)
    _, ref_best = golden.xcorr_init(a, a, taper=False)  # all-zero tie
    assert ref_best == -46  # first lag wins on the all-equal correlogram
    assert int(xcorr.best_lag(jnp.zeros((1, 93)), 46)[0]) == -46


def test_taper_at_boundary_peak():
    """Peak at the first/last lag: taper centers there, no wraparound."""
    corr = np.ones((1, 93), np.float32)
    corr[0, 0] = 5.0
    tapered = np.asarray(xcorr.peak_taper(jnp.asarray(corr), 46))
    assert tapered[0, 0] == 5.0
    assert tapered[0, 92] < 1e-6  # 92 lags away


def test_subsample_peak_boundary_no_interpolation():
    corr = np.zeros((1, 93), np.float32)
    corr[0, 92] = 3.0
    tdoa, peak = xcorr.subsample_peak(jnp.asarray(corr), 46)
    assert float(tdoa[0]) == 46.0  # no interpolation at the edge
    assert float(peak[0]) == 3.0


def test_ema_dt_zero_is_identity():
    """decay = 1 - exp(0) = 0: the estimate must not move (the reference's
    back-to-back events with identical timestamps)."""
    est = np.arange(-46, 47, dtype=np.int64) * 1000
    new = np.ones(93, np.int64) * 10**9
    ref, _ = golden.xcorr_average(est.copy(), new, 0.0)
    np.testing.assert_array_equal(ref, est)
    ours = np.asarray(xcorr.ema_update_int(
        jnp.asarray(est), jnp.asarray(new), 0.0))
    np.testing.assert_array_equal(ours, est)


def test_all_zero_frames_do_not_nan():
    from audio_triangulation_tpu import Localizer

    loc = Localizer.create(geometry.reference_array())
    frames = jnp.zeros((2, 3, 1024), jnp.float32)
    out = loc(frames)
    assert np.isfinite(np.asarray(out["xy"])).all()
    assert np.isfinite(np.asarray(out["tdoa_samples"])).all()


def test_mesh_shape_validation():
    import pytest

    with pytest.raises(ValueError):
        mesh_lib.make_mesh((3, 2))  # 6 != 8 devices


def test_asymmetric_grid_geometry():
    grid = GridConfig(half_cells_x=30, half_cells_y=10, cells_per_m=20.0)
    assert grid.width == 61 and grid.height == 21
    pts = geometry.grid_points(grid)
    assert pts.shape == (21, 61, 3)
    # corners map correctly (plane coords before projection)
    grid_p = GridConfig(half_cells_x=30, half_cells_y=10, cells_per_m=20.0,
                        projection="plane")
    pts = geometry.grid_points(grid_p)
    np.testing.assert_allclose(pts[0, 0, :2], [-1.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(pts[20, 60, :2], [1.5, -0.5], atol=1e-6)

    from audio_triangulation_tpu.viz import render

    img = render.heatmap_rgb(
        np.zeros(grid.num_cells, np.uint8), grid, cell_px=2, axes=True)
    assert img.shape == (42, 122, 3)


def test_profiling_annotate_smoke():
    from audio_triangulation_tpu.utils import profiling

    with profiling.annotate("unit-test-region"):
        jax.block_until_ready(jnp.ones((4, 4)) * 2)
