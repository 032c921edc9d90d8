"""SRP grid scoring: matmul == gather, heat quantization, peak extraction."""

import pytest
import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.core.config import GridConfig, PipelineConfig
from audio_triangulation_tpu.ops import srp

pytestmark = pytest.mark.smoke  # SRP scoring forms


CFG = PipelineConfig()
GRID = GridConfig()
MICS = geometry.reference_array()
PAIRS = geometry.mic_pairs(3)
LUT = geometry.lag_lut(GRID, MICS, PAIRS, CFG)
LUT_FLAT = jnp.asarray(LUT.reshape(3, -1))
ONEHOT = jnp.asarray(geometry.lag_onehot(LUT, CFG.num_lags))


def test_matmul_equals_gather(rng):
    corr = jnp.asarray(
        rng.normal(size=(4, 3, CFG.num_lags)).astype(np.float32))
    s_mm = np.asarray(srp.srp_scores_matmul(corr, ONEHOT))
    s_g = np.asarray(srp.srp_scores_gather(corr, LUT_FLAT))
    assert s_mm.shape == (4, GRID.num_cells)
    np.testing.assert_allclose(s_mm, s_g, rtol=1e-5, atol=1e-5)


def test_big_matmul_matches_blocked_and_gather(rng):
    """The precomputed large-array steering path (srp_scores_matmul_big,
    the r3 config-5b fast path) == blocked scan == gather."""
    corr = jnp.asarray(
        rng.normal(size=(4, 3, CFG.num_lags)).astype(np.float32))
    w = srp.big_onehot_device(LUT_FLAT, CFG.num_lags, "float32")
    l8 = srp.sublane_pad_lags(CFG.num_lags)
    assert w.shape == (3 * l8, GRID.num_cells)
    s_big = np.asarray(
        srp.srp_scores_matmul_big(corr, w, "float32"))
    s_g = np.asarray(srp.srp_scores_gather(corr, LUT_FLAT))
    s_b = np.asarray(srp.srp_scores_matmul_blocked(
        corr, LUT_FLAT, CFG.num_lags, pair_chunk=2))
    np.testing.assert_allclose(s_big, s_g, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s_big, s_b, rtol=1e-5, atol=1e-5)
    # bf16 steering: 0/1 entries exact, argmax cell preserved
    wb = srp.big_onehot_device(LUT_FLAT, CFG.num_lags, "bfloat16")
    s_bf = np.asarray(
        srp.srp_scores_matmul_big(corr, wb, "bfloat16"))
    np.testing.assert_array_equal(s_bf.argmax(-1), s_g.argmax(-1))


def test_localizer_uses_big_matmul_above_256_pairs():
    """Localizer.create precomputes onehot_big for >256-pair arrays within
    the HBM budget, and NOT for small or budget-zero configs."""
    from audio_triangulation_tpu.models.localizer import Localizer

    small = Localizer.create(MICS)
    assert small.params.onehot_big is None  # 3 pairs -> matmul form
    mics25 = geometry.grid_array(5, 5, 0.05)  # 300 pairs
    grid_s = GridConfig(half_cells_x=10, half_cells_y=10, cells_per_m=8.0)
    loc = Localizer.create(mics25, PipelineConfig(), grid_s,
                           srp_form="gather")
    assert loc.params.onehot_big is not None
    p = 300
    l8 = srp.sublane_pad_lags(loc.pipeline.num_lags)
    assert loc.params.onehot_big.shape == (p * l8, grid_s.num_cells)
    off = Localizer.create(
        mics25, PipelineConfig(srp_big_matmul_budget_bytes=0), grid_s,
        srp_form="gather")
    assert off.params.onehot_big is None


def test_quantize_heatmap_levels(rng):
    scores = jnp.asarray(rng.normal(size=(2, 101 * 101)).astype(np.float32))
    levels = np.asarray(srp.quantize_heatmap(scores))
    assert levels.dtype == np.uint8
    assert levels.max() == 4  # the max cell is always white
    assert (levels == 4).sum() >= 2


def test_grid_peak_xy_centers():
    # put all the score on a known cell
    scores = np.zeros((1, GRID.num_cells), np.float32)
    row, col = 30, 80
    scores[0, row * GRID.width + col] = 1.0
    xy = np.asarray(srp.grid_peak_xy(
        jnp.asarray(scores), (GRID.height, GRID.width),
        (GRID.half_cells_x, GRID.half_cells_y), GRID.cells_per_m,
        refine=False,
    ))[0]
    assert np.isclose(xy[0], (col - 50) / 24.0)
    assert np.isclose(xy[1], (50 - row) / 24.0)


def test_grid_peak_quadratic_refinement():
    # smooth bump centered between cells -> refinement pulls toward center
    h, w = GRID.height, GRID.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = 40.4, 60.7
    bump = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 50.0)
    xy = np.asarray(srp.grid_peak_xy(
        jnp.asarray(bump.reshape(1, -1)), (h, w),
        (GRID.half_cells_x, GRID.half_cells_y), GRID.cells_per_m,
    ))[0]
    exp_x = (cx - 50) / 24.0
    exp_y = (50 - cy) / 24.0
    assert abs(xy[0] - exp_x) < 0.3 / 24.0
    assert abs(xy[1] - exp_y) < 0.3 / 24.0


def test_auto_srp_form():
    assert srp.auto_srp_form(3, 93, 101 * 101) == "matmul"
    assert srp.auto_srp_form(2016, 129, 64 * 64) == "gather"


def test_gather_blocked_matches_full(rng):
    corr = jnp.asarray(
        rng.normal(size=(3, 7, CFG.num_lags)).astype(np.float32))
    lut7 = jnp.asarray(
        rng.integers(0, CFG.num_lags, size=(7, 50)).astype(np.int32))
    full = np.asarray(srp.srp_scores_gather(corr, lut7))
    blocked = np.asarray(srp.srp_scores_gather_blocked(corr, lut7, 3))
    np.testing.assert_allclose(blocked, full, rtol=1e-6, atol=1e-5)
