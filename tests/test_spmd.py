"""shard_map SPMD grid localization with explicit collectives."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.parallel import mesh as mesh_lib
from audio_triangulation_tpu.parallel import spmd
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()


def test_spmd_grid_matches_reference():
    loc = Localizer.create(MICS, PipelineConfig(phat=True),
                           srp_form="matmul")
    sources = []
    for x, y in [(0.9, 0.4), (-0.6, -0.8), (0.2, 1.0), (0.5, -0.5)]:
        p = np.array([x, y, 1.2])
        sources.append(p * (1.2 / np.linalg.norm(p)))
    frames = synth.synth_scene(np.stack(sources), MICS, noise_rms=0.01,
                               seed=41)
    frames = jnp.asarray(np.repeat(frames, 2, axis=0), jnp.float32)  # B=8

    ref = loc(frames)

    mesh = mesh_lib.make_mesh((4, 2))
    fn = spmd.make_spmd_grid_localizer(loc, mesh)
    frames_sharded = jax.device_put(frames, mesh_lib.frames_sharding(mesh))
    out = fn(frames_sharded)

    # argmax cell identical to the single-device argmax
    ref_cell = np.argmax(np.asarray(ref["scores"]), axis=-1)
    np.testing.assert_array_equal(np.asarray(out["best_cell"]), ref_cell)
    np.testing.assert_allclose(
        np.asarray(out["best_score"]),
        np.asarray(ref["scores"]).max(axis=-1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["tdoa_samples"]), np.asarray(ref["tdoa_samples"]),
        atol=1e-4)
    # un-refined grid xy within one cell of the refined reference
    np.testing.assert_allclose(
        np.asarray(out["xy_grid"]), np.asarray(ref["xy_grid"]),
        atol=1.0 / 24.0 + 1e-6)
