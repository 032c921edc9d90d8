"""Fused SRP+argmax kernel vs the materializing matmul path."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import GridConfig, PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.ops import srp
from audio_triangulation_tpu.ops.pallas import srp_kernel

CFG = PipelineConfig()
GRID = GridConfig()
MICS = geometry.reference_array()
PAIRS = geometry.mic_pairs(3)
LUT = geometry.lag_lut(GRID, MICS, PAIRS, CFG)
ONEHOT = jnp.asarray(geometry.lag_onehot(LUT, CFG.num_lags))


def test_srp_argmax_matches_materialized(rng):
    corr = jnp.asarray(
        rng.normal(size=(10, 3, CFG.num_lags)).astype(np.float32))
    val, idx = srp_kernel.srp_argmax(
        corr, ONEHOT, GRID.num_cells, tile_b=8, gt=512, interpret=True)
    scores = np.asarray(srp.srp_scores_matmul(corr, ONEHOT))
    np.testing.assert_array_equal(np.asarray(idx), scores.argmax(-1))
    np.testing.assert_allclose(np.asarray(val), scores.max(-1), rtol=1e-5)


def test_srp_argmax_tie_first_wins(rng):
    """Exact score ties must resolve to the earliest cell, like jnp.argmax."""
    corr = jnp.zeros((2, 3, CFG.num_lags), jnp.float32)
    # all-zero correlograms -> all-zero scores -> argmax == 0 everywhere
    val, idx = srp_kernel.srp_argmax(
        corr, ONEHOT, GRID.num_cells, tile_b=2, gt=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), [0, 0])
