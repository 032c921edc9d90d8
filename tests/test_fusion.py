"""Multi-array fusion: world-grid scoring, joint solve, array weighting,
and the model-axis-sharded SPMD path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import Localizer
from audio_triangulation_tpu.core.config import (
    GridConfig, PipelineConfig, SolverConfig)
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.fusion import ArrayFusionLocalizer
from audio_triangulation_tpu.utils import synth

CFG = PipelineConfig(phat=True)
ARR_A = geometry.square_array(0.25) + np.array([-1.0, 0.0], np.float32)
ARR_B = geometry.square_array(0.25) + np.array([1.0, 0.0], np.float32)


def _world_frames(xy, arrays, noise=0.01, seed=3):
    """Synthesize [B, K, M, N] frames for world-frame arrays observing the
    same scene (one coherent synthesis over the concatenated mics)."""
    xy = np.atleast_2d(np.asarray(xy, np.float32))
    src = np.concatenate([xy, np.full((xy.shape[0], 1), 1.2)], axis=-1)
    cat = np.concatenate(arrays, axis=0)
    fr = synth.synth_scene(src, cat, noise_rms=noise, seed=seed)
    k, m = len(arrays), arrays[0].shape[0]
    return jnp.asarray(
        fr.reshape(xy.shape[0], k, m, -1).astype(np.float32))


def test_fusion_beats_single_array():
    fus = ArrayFusionLocalizer.create([ARR_A, ARR_B], CFG)
    xy_true = np.array(
        [[0.6, 0.9], [-0.8, -0.5], [1.3, 0.4], [0.1, -1.2]], np.float32)
    frames = _world_frames(xy_true, [ARR_A, ARR_B])
    out = fus(frames)
    err = np.linalg.norm(np.asarray(out["xy"]) - xy_true, axis=-1)
    assert np.all(err < 0.06), err

    loc_b = Localizer.create(
        ARR_B, CFG, GridConfig(projection="plane"),
        SolverConfig(constrain_to_sphere=False))
    err_b = np.linalg.norm(
        np.asarray(loc_b(frames[:, 1])["xy"]) - xy_true, axis=-1)
    assert np.mean(err) < np.mean(err_b), (err, err_b)

    assert out["scores"].shape == (4, fus.grid.num_cells)
    assert out["confidence"].shape == (4, 2)
    assert out["xy_cov"].shape == (4, 2, 2)


def test_long_baseline_fixes_range():
    """A distant source: one compact 0.25 m array has weak range
    observability; two arrays 2 m apart triangulate it."""
    xy_true = np.array([[0.3, 1.7]], np.float32)
    frames = _world_frames(xy_true, [ARR_A, ARR_B], noise=0.005, seed=9)

    fus = ArrayFusionLocalizer.create([ARR_A, ARR_B], CFG)
    err_f = float(np.linalg.norm(
        np.asarray(fus(frames)["xy"])[0] - xy_true[0]))

    loc_b = Localizer.create(
        ARR_B, CFG, GridConfig(projection="plane"),
        SolverConfig(constrain_to_sphere=False))
    err_b = float(np.linalg.norm(
        np.asarray(loc_b(frames[:, 1])["xy"])[0] - xy_true[0]))
    assert err_f < 0.08, err_f
    assert err_f < err_b, (err_f, err_b)


def test_zero_weight_masks_jammed_array():
    """Replacing one array's frames with noise corrupts the uniform-weight
    fusion; weighting that array to zero recovers the good array's answer."""
    xy_true = np.array([[0.5, 0.6]], np.float32)
    frames = np.asarray(_world_frames(xy_true, [ARR_A, ARR_B], seed=11))
    rng = np.random.default_rng(12)
    jammed = frames.copy()
    jammed[:, 0] = rng.normal(0, 0.3, jammed[:, 0].shape)
    jammed = jnp.asarray(jammed)

    fus = ArrayFusionLocalizer.create([ARR_A, ARR_B], CFG)
    err_uniform = float(np.linalg.norm(
        np.asarray(fus(jammed)["xy"])[0] - xy_true[0]))
    err_masked = float(np.linalg.norm(
        np.asarray(fus(jammed, weights=jnp.array([0.0, 1.0]))["xy"])[0]
        - xy_true[0]))
    assert err_masked < 0.1, err_masked
    assert err_masked <= err_uniform + 1e-6, (err_masked, err_uniform)


def test_create_validation():
    with pytest.raises(ValueError, match="plane"):
        ArrayFusionLocalizer.create(
            [ARR_A, ARR_B], CFG, GridConfig(projection="sphere"))
    with pytest.raises(ValueError, match="constrain_to_sphere"):
        ArrayFusionLocalizer.create(
            [ARR_A, ARR_B], CFG, solver=SolverConfig())
    with pytest.raises(ValueError, match="shape"):
        ArrayFusionLocalizer.create(
            [ARR_A, geometry.reference_array()], CFG)
    fus = ArrayFusionLocalizer.create([ARR_A, ARR_B], CFG)
    with pytest.raises(ValueError, match="arrays"):
        fus(jnp.zeros((2, 3, 4, CFG.frame_size)))


def test_fusion_spmd_matches_single_device():
    """Arrays sharded over the model axis (psum score fusion + all-gather
    joint solve) reproduce the single-device fusion."""
    from audio_triangulation_tpu.parallel import mesh as mesh_lib
    from audio_triangulation_tpu.parallel.spmd import make_fusion_spmd

    arrays = [
        geometry.square_array(0.25) + np.array(off, np.float32)
        for off in [(-1.0, -0.8), (1.0, -0.8), (-1.0, 0.8), (1.0, 0.8)]
    ]
    fus = ArrayFusionLocalizer.create(arrays, CFG)
    xy_true = np.array(
        [[0.4, 0.7], [-0.6, -0.2], [1.1, -0.9], [0.0, 0.3]], np.float32)
    frames = _world_frames(xy_true, arrays, seed=21)

    ref = fus(frames)
    mesh = mesh_lib.make_mesh((2, 4))
    fn = make_fusion_spmd(fus, mesh)
    out = fn(frames)

    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(ref["scores"]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["xy"]), np.asarray(ref["xy"]), atol=1e-4)
    err = np.linalg.norm(np.asarray(out["xy"]) - xy_true, axis=-1)
    assert np.all(err < 0.08), err

    weighted = fn(frames, weights=jnp.array([1.0, 1.0, 0.0, 1.0]))
    ref_w = fus(frames, weights=jnp.array([1.0, 1.0, 0.0, 1.0]))
    np.testing.assert_allclose(
        np.asarray(weighted["xy"]), np.asarray(ref_w["xy"]), atol=1e-4)
