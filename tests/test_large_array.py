"""Large-array configuration (BASELINE config 5 shape): 64 mics, 2016 pairs,
4096-sample frames, gather-form SRP, grid-parallel sharding."""

import numpy as np
import jax
import jax.numpy as jnp

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


def test_config5_shapes_and_srp_form():
    loc = Localizer.create(MICS64, CFG, GRID)
    assert loc.srp_form == "gather"  # one-hot would be ~2016*L*G floats
    assert loc.params.pairs.shape == (2016, 2)
    assert CFG.frame_size == 4096


def test_config5_localizes():
    h = 1.2
    p = np.array([0.6, 0.4, h])
    source = p * (h / np.linalg.norm(p))
    frames = synth.synth_scene(
        source, MICS64, n=4096, noise_rms=0.01, seed=31)
    loc = Localizer.create(MICS64, CFG, GRID)
    out = loc(jnp.asarray(frames, jnp.float32))
    xy = np.asarray(out["xy"])[0]
    assert np.linalg.norm(xy - p[:2]) < 0.15, xy
    # 64-mic TDOA consistency: median sub-sample error < 0.2 samples
    from audio_triangulation_tpu.ops import solver as solver_ops

    mic3 = jnp.zeros((64, 3), jnp.float32).at[:, :2].set(jnp.asarray(MICS64))
    true_tau = np.asarray(solver_ops.predicted_tdoas(
        jnp.asarray(p[:2], jnp.float32), mic3, loc.params.pairs,
        343.0, h, True)) * 50_000.0
    est = np.asarray(out["tdoa_samples"])[0]
    # PHAT-whitened per-pair peaks are individually noisier; the 2016-pair
    # least-squares solve is what delivers the mm-level position above
    assert np.median(np.abs(est - true_tau)) < 0.5


def test_config5_grid_parallel():
    loc = Localizer.create(MICS64, CFG, GRID, srp_form="gather")
    h = 1.2
    p = np.array([-0.4, 0.5, h])
    source = p * (h / np.linalg.norm(p))
    frames = np.repeat(
        synth.synth_scene(source, MICS64, n=4096, seed=32), 8, axis=0)
    frames = jnp.asarray(frames, jnp.float32)
    ref = loc(frames)

    mesh = mesh_lib.make_mesh((4, 2))
    fn, params = sharded.make_sharded_localize(loc, mesh, grid_parallel=True)
    out = fn(params, frames)
    np.testing.assert_allclose(
        np.asarray(out["xy"]), np.asarray(ref["xy"]), atol=1e-4)
