"""Large-array configuration (BASELINE config 5 shape): 64 mics, 2016 pairs,
4096-sample frames, gather-form SRP, grid-parallel sharding.

The 2016-pair CPU program is the suite's most expensive compile, so the
tests share ONE module-scoped Localizer and ONE B=4 scene batch: the
single-device forward compiles once and its output serves both the
accuracy check and the grid-parallel parity reference (was: three distinct
compiles at B=1 / B=8 / sharded B=8, 66 s of the suite)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import (
    GridConfig, Localizer, PipelineConfig, geometry,
)
from audio_triangulation_tpu.parallel import mesh as mesh_lib
from audio_triangulation_tpu.parallel import sharded
from audio_triangulation_tpu.utils import synth

MICS64 = geometry.grid_array(8, 8, 0.05)
CFG = PipelineConfig(
    frame_size_bits=12,  # 4096-sample frames
    max_shift_samples=geometry.max_lag_for_array(
        MICS64, PipelineConfig()),
    phat=True,
)
GRID = GridConfig(half_cells_x=31, half_cells_y=31, cells_per_m=16.0)
H = 1.2
P = np.array([0.6, 0.4, H])
SOURCE = P * (H / np.linalg.norm(P))


@pytest.fixture(scope="module")
def loc64():
    return Localizer.create(MICS64, CFG, GRID)


@pytest.fixture(scope="module")
def frames64():
    one = synth.synth_scene(SOURCE, MICS64, n=4096, noise_rms=0.01, seed=31)
    return jnp.asarray(np.repeat(one, 4, axis=0), jnp.float32)  # B=4


@pytest.fixture(scope="module")
def ref64(loc64, frames64):
    return loc64(frames64)


def test_config5_shapes_and_srp_form(loc64):
    assert loc64.srp_form == "gather"  # one-hot would be ~2016*L*G floats
    assert loc64.params.pairs.shape == (2016, 2)
    assert CFG.frame_size == 4096


def test_config5_localizes(loc64, ref64):
    xy = np.asarray(ref64["xy"])[0]
    assert np.linalg.norm(xy - P[:2]) < 0.15, xy
    # 64-mic TDOA consistency: median sub-sample error < 0.5 samples
    from audio_triangulation_tpu.ops import solver as solver_ops

    mic3 = jnp.zeros((64, 3), jnp.float32).at[:, :2].set(jnp.asarray(MICS64))
    true_tau = np.asarray(solver_ops.predicted_tdoas(
        jnp.asarray(P[:2], jnp.float32), mic3, loc64.params.pairs,
        343.0, H, True)) * 50_000.0
    est = np.asarray(ref64["tdoa_samples"])[0]
    # PHAT-whitened per-pair peaks are individually noisier; the 2016-pair
    # least-squares solve is what delivers the mm-level position above
    assert np.median(np.abs(est - true_tau)) < 0.5


def test_config5_grid_parallel(loc64, frames64, ref64):
    mesh = mesh_lib.make_mesh((4, 2))
    fn, params = sharded.make_sharded_localize(
        loc64, mesh, grid_parallel=True)
    out = fn(params, frames64)
    np.testing.assert_allclose(
        np.asarray(out["xy"]), np.asarray(ref64["xy"]), atol=1e-4)
