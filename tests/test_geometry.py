"""Geometry layer vs the golden (C-semantics) model."""

import pytest
import numpy as np

from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.core.config import GridConfig, PipelineConfig
from audio_triangulation_tpu.utils import golden

pytestmark = pytest.mark.smoke  # geometry/LUT parity



def test_triangle_matches_reference_float_math():
    ours = geometry.reference_array()
    ref = golden.mic_locations()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_triangle_distances_consistent():
    p = geometry.triangle_from_distances(0.132, 0.15, 0.20, mirror=True)
    d_ab = np.linalg.norm(p[1] - p[0])
    d_bc = np.linalg.norm(p[2] - p[1])
    d_ca = np.linalg.norm(p[0] - p[2])
    np.testing.assert_allclose([d_ab, d_bc, d_ca], [0.132, 0.15, 0.20],
                               rtol=1e-5)
    # centroid at origin
    np.testing.assert_allclose(p.mean(axis=0), 0.0, atol=1e-7)


def test_mirror_flips_y():
    pm = geometry.triangle_from_distances(0.132, 0.15, 0.20, mirror=True)
    pn = geometry.triangle_from_distances(0.132, 0.15, 0.20, mirror=False)
    np.testing.assert_allclose(pm[:, 0], pn[:, 0], atol=1e-7)
    # mirroring C's y before centering == reflecting the whole array across x
    np.testing.assert_allclose(pm[:, 1], -pn[:, 1], atol=1e-7)


def test_rotate_puts_mic_a_on_x_axis():
    p = geometry.triangle_from_distances(0.132, 0.15, 0.20, mirror=True,
                                         rotate=True)
    assert abs(p[0, 1]) < 1e-6
    assert p[0, 0] > 0


def test_mic_pairs_reference_order():
    pairs = geometry.mic_pairs(3)
    np.testing.assert_array_equal(pairs, [[0, 1], [0, 2], [1, 2]])
    assert geometry.mic_pairs(64).shape == (2016, 2)


def test_circular_and_square_arrays():
    c = geometry.circular_array(8, 0.1)
    np.testing.assert_allclose(np.linalg.norm(c, axis=-1), 0.1, rtol=1e-6)
    s = geometry.square_array(0.2)
    np.testing.assert_allclose(np.abs(s), 0.1, rtol=1e-6)
    g = geometry.grid_array(8, 8, 0.05)
    assert g.shape == (64, 2)
    np.testing.assert_allclose(g.mean(axis=0), 0.0, atol=1e-7)


def test_lag_lut_matches_golden_heatmap_lut():
    mics = golden.mic_locations()
    pipeline = PipelineConfig()
    grid = GridConfig()
    pairs = geometry.mic_pairs(3)
    lut = geometry.lag_lut(grid, mics, pairs, pipeline)  # [3, H, W]
    ref = golden.heatmap_luts(mics)  # [3, H, W] uint8
    np.testing.assert_array_equal(lut, ref.astype(np.int32))


def test_lag_onehot_consistency():
    mics = golden.mic_locations()
    pipeline = PipelineConfig()
    grid = GridConfig(half_cells_x=10, half_cells_y=10)
    pairs = geometry.mic_pairs(3)
    lut = geometry.lag_lut(grid, mics, pairs, pipeline)
    oh = geometry.lag_onehot(lut, pipeline.num_lags)
    assert oh.shape == (3 * pipeline.num_lags, grid.num_cells)
    # each column has exactly one 1 per pair
    np.testing.assert_array_equal(oh.sum(axis=0), 3.0)
    # gather == matmul on random correlograms
    rng = np.random.default_rng(0)
    corr = rng.normal(size=(3, pipeline.num_lags)).astype(np.float32)
    via_mm = corr.reshape(-1) @ oh
    flat = lut.reshape(3, -1)
    via_gather = sum(corr[p][flat[p]] for p in range(3))
    np.testing.assert_allclose(via_mm, via_gather, rtol=1e-5)


def test_max_lag_for_array():
    mics = geometry.reference_array()
    k = geometry.max_lag_for_array(mics, PipelineConfig())
    # aperture 0.20 m -> 0.20/343*50000 ~= 29.2 -> 30 + margin
    assert 25 < k < 46


def test_config_literal_validation():
    import pytest

    with pytest.raises(ValueError):
        PipelineConfig(xcorr_mode="fftt")
    with pytest.raises(ValueError):
        PipelineConfig(normalize_mode="shift9")
    with pytest.raises(ValueError):
        GridConfig(projection="cube")
