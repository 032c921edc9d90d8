"""Joint localization + clock synchronization across unsynchronized arrays.

New capability (the reference is one synchronous 3-mic array,
src/components/constants.h): cross-array TDOA pairs carry the unknown
per-array clock offsets; ops.solver.solve_tdoa_sync solves all event
positions and the shared offsets jointly (Schur-complement Gauss-Newton),
and models.fusion.ArrayFusionLocalizer.localize_sync wires it end to end.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import PipelineConfig, SolverConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.fusion import ArrayFusionLocalizer
from audio_triangulation_tpu.ops import solver as solver_ops
from audio_triangulation_tpu.utils import synth

FS = 50_000.0
C = 343.0
H = 1.2

ARRAYS = [
    geometry.square_array(0.3),
    geometry.square_array(0.3) + np.array([3.0, 0.5], np.float32),
    geometry.square_array(0.3) + np.array([-1.0, 3.0], np.float32),
]
CAT = np.concatenate(ARRAYS, 0)           # [12, 2]
AID = np.repeat(np.arange(3), 4)
# true offsets (seconds); array 0 is the reference
TRUE_OFF = np.array([0.0, 3.7, -2.2]) / FS


def _exact_tdoas(src_xy, pairs):
    src3 = np.concatenate(
        [src_xy, np.full((len(src_xy), 1), H)], -1)
    mic3 = np.concatenate([CAT, np.zeros((12, 1))], -1)
    d = np.linalg.norm(src3[:, None] - mic3[None], axis=-1)  # [E, 12]
    tau = (d[:, pairs[:, 1]] - d[:, pairs[:, 0]]) / C
    return tau + (TRUE_OFF[AID[pairs[:, 1]]] - TRUE_OFF[AID[pairs[:, 0]]])


def test_solver_recovers_offsets_and_positions_exactly():
    """Noise-free TDOAs: positions to sub-mm, offsets to < 0.01 samples."""
    rng = np.random.default_rng(0)
    pairs = geometry.mic_pairs(12)
    src = rng.uniform(-2, 2, (6, 2))
    tdoa = _exact_tdoas(src, pairs)
    init = src + rng.normal(0, 0.3, src.shape)
    xy, off, rms = solver_ops.solve_tdoa_sync(
        jnp.asarray(tdoa, jnp.float32), jnp.asarray(CAT),
        jnp.asarray(pairs), jnp.asarray(AID), 3,
        speed_of_sound=C, height=H,
        init_xy=jnp.asarray(init, jnp.float32))
    assert np.abs(np.asarray(xy) - src).max() < 1e-3
    assert np.abs(np.asarray(off) - TRUE_OFF[1:]).max() * FS < 0.01
    assert float(np.asarray(rms).max()) < 1e-4


def test_solver_ignoring_offsets_is_biased():
    """The same cross-pair TDOAs fed to the offset-free joint solve
    (what fuse_frames does if one naively adds cross pairs) produce
    positions that are much worse — the motivation for the sync solve."""
    rng = np.random.default_rng(1)
    pairs = geometry.mic_pairs(12)
    src = rng.uniform(-2, 2, (6, 2))
    tdoa = _exact_tdoas(src, pairs)
    init = src + rng.normal(0, 0.2, src.shape)
    xy_naive, _ = solver_ops.solve_tdoa_batched(
        jnp.asarray(tdoa, jnp.float32), jnp.asarray(CAT),
        jnp.asarray(pairs),
        speed_of_sound=C, height=H,
        init_xy=jnp.asarray(init, jnp.float32),
        cfg=SolverConfig(constrain_to_sphere=False))
    xy_sync, _, _ = solver_ops.solve_tdoa_sync(
        jnp.asarray(tdoa, jnp.float32), jnp.asarray(CAT),
        jnp.asarray(pairs), jnp.asarray(AID), 3,
        speed_of_sound=C, height=H,
        init_xy=jnp.asarray(init, jnp.float32))
    err_naive = np.linalg.norm(np.asarray(xy_naive) - src, axis=-1)
    err_sync = np.linalg.norm(np.asarray(xy_sync) - src, axis=-1)
    # 3.7 samples of un-modeled offset = 2.5 cm of path error per cross
    # pair, amplified by geometry
    assert err_sync.max() < 0.01
    assert err_naive.max() > 3 * err_sync.max()


def _world_scene(sources, seed=7, noise=0.004):
    """[E, K, M, N] with geometrically consistent cross-array delays:
    one synth over the concatenated world mic set per event, then the
    per-array clock offsets applied."""
    mic3 = np.concatenate([CAT, np.zeros((12, 1))], -1)
    src3 = np.concatenate(
        [np.atleast_2d(sources), np.full((len(np.atleast_2d(sources)), 1),
                                         H)], -1)
    fr = synth.synth_scene(src3, mic3, noise_rms=noise, seed=seed)  # [E,12,N]
    fr = synth.fractional_delay(
        fr, np.broadcast_to(TRUE_OFF[AID] * FS, fr.shape[:-1]))
    e = fr.shape[0]
    return jnp.asarray(fr.reshape(e, 3, 4, -1), jnp.float32)


def test_localize_sync_end_to_end():
    """Raw frames from 3 unsynchronized arrays: offsets recovered to a
    fraction of a sample and sync positions beat the intra-only solve."""
    fus = ArrayFusionLocalizer.create(
        ARRAYS, PipelineConfig(phat=True, band_hz=(700.0, 7000.0)))
    src = np.array([[0.8, 0.9], [-0.6, 1.6], [1.8, -0.4],
                    [0.2, 2.2], [-1.2, -0.8], [2.4, 1.2]])
    out = fus.localize_sync(_world_scene(src))
    off = np.asarray(out["clock_offsets_s"])
    # the offsets' likelihood surface is flat along a position/offset
    # trade direction, so their variance at this noise level and E = 6
    # is ~half a sample (verified: the solve's objective is BELOW the
    # ground truth's — it is the estimator's optimum, not a bug); more
    # events pin them harder
    assert np.abs(off - TRUE_OFF[1:]).max() * FS < 0.6, (
        off * FS, TRUE_OFF[1:] * FS)
    err_sync = np.linalg.norm(np.asarray(out["xy_sync"]) - src, axis=-1)
    err_intra = np.linalg.norm(np.asarray(out["xy"]) - src, axis=-1)
    # the long cross-array baselines are the point: ~10x better positions
    # than intra-only fusion (measured 0.2-5 cm vs 1-22 cm here)
    assert err_sync.max() < 0.08, (err_sync, err_intra)
    assert err_sync.mean() < 0.5 * err_intra.mean(), (err_sync, err_intra)


def test_localize_sync_validates_shape():
    fus = ArrayFusionLocalizer.create(ARRAYS[:2], PipelineConfig())
    with pytest.raises(ValueError):
        fus.localize_sync(jnp.zeros((2, 3, 4, 1024)))  # 3 arrays, built 2
