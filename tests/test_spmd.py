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


def test_spmd_pair_sharded_large_array():
    """2-D sharding: pairs over model, frames over data.

    A 6x6 grid array (630 pairs) exercises the same production path as the
    64-mic config — the pair count is far past the 256-pair big-steering
    gate, so `fn.big_steering` shards the precomputed steering matrix over
    the model axis exactly as at 2,016 pairs — at ~3x less CPU-compile cost
    (this test was the suite's slowest at 126 s with 64 mics).  The 64-mic
    scale itself is covered on the single-device path by test_large_array.
    """
    from audio_triangulation_tpu import GridConfig

    mics36 = geometry.grid_array(6, 6, 0.05)
    cfg = PipelineConfig(
        frame_size_bits=10,
        max_shift_samples=geometry.max_lag_for_array(
            mics36, PipelineConfig()),
        phat=True, fft_pad_mode="circular")
    grid = GridConfig(half_cells_x=10, half_cells_y=10, cells_per_m=8.0)
    loc = Localizer.create(mics36, cfg, grid, srp_form="gather",
                           with_solver=False)

    p = np.array([0.5, 0.3, 1.2])
    src = p * (1.2 / np.linalg.norm(p))
    frames = np.repeat(
        synth.synth_scene(src, mics36, n=cfg.frame_size, seed=51), 4, axis=0)
    frames = jnp.asarray(frames, jnp.float32)

    ref = loc(frames)

    mesh = mesh_lib.make_mesh((2, 4))  # 4-way pair sharding
    fn = spmd.make_spmd_pair_localizer(loc, mesh)
    frames_sharded = jax.device_put(frames, mesh_lib.frames_sharding(mesh))
    out = fn(frames_sharded)

    assert fn.big_steering  # production path: precomputed steering shards
    s_ref = np.asarray(ref["scores"])
    s_got = np.asarray(out["scores"])
    scale = np.abs(s_ref).max()
    np.testing.assert_allclose(s_got / scale, s_ref / scale, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["xy_grid"]), np.asarray(ref["xy_grid"]), atol=1e-5)


def test_spmd_pair_blocked_fallback_matches_big():
    """big-steering vs blocked-scan pair sharding agree (small array, so
    the parity check doesn't pay a second 2016-pair compile — the 64-mic
    test above covers the big path at scale)."""
    import dataclasses

    from audio_triangulation_tpu import GridConfig

    mics = geometry.circular_array(24, 0.4)  # 276 pairs > the 256 gate
    cfg = PipelineConfig(frame_size_bits=9, max_shift_samples=16, phat=True)
    grid = GridConfig(half_cells_x=6, half_cells_y=6, cells_per_m=6.0)
    loc = Localizer.create(mics, cfg, grid, srp_form="gather",
                           with_solver=False)
    src = np.array([0.4, 0.2, 1.2]) * (1.2 / np.linalg.norm([0.4, 0.2, 1.2]))
    frames = jnp.asarray(np.repeat(
        synth.synth_scene(src, mics, n=cfg.frame_size, seed=7), 4, axis=0),
        jnp.float32)

    mesh = mesh_lib.make_mesh((2, 4))
    frames_sharded = jax.device_put(frames, mesh_lib.frames_sharding(mesh))
    fn = spmd.make_spmd_pair_localizer(loc, mesh)
    assert fn.big_steering
    out = fn(frames_sharded)

    loc0 = dataclasses.replace(
        loc, pipeline=dataclasses.replace(
            cfg, srp_big_matmul_budget_bytes=0))
    fn0 = spmd.make_spmd_pair_localizer(loc0, mesh)
    assert not fn0.big_steering
    out0 = fn0(frames_sharded)

    s = np.asarray(out["scores"])
    scale = np.abs(s).max()
    np.testing.assert_allclose(
        np.asarray(out0["scores"]) / scale, s / scale, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out0["xy_grid"]), np.asarray(out["xy_grid"]), atol=1e-5)
