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


# ---------------------------------------------------------------------
# Clock drift (skew): offset + rho*t model over timestamped events
# ---------------------------------------------------------------------

TRUE_DRIFT = np.array([0.0, 25e-6, -40e-6])  # s/s: 25 / -40 ppm skews


def test_solver_recovers_drift_exactly():
    """Noise-free TDOAs over a 40 s session: offsets AND ppm-scale drift
    rates recovered (a 40 ppm skew is ~2 samples/second — ignoring it
    would corrupt the whole session)."""
    rng = np.random.default_rng(3)
    pairs = geometry.mic_pairs(12)
    src = rng.uniform(-2, 2, (8, 2))
    times = np.linspace(0.0, 40.0, 8)
    tdoa = _exact_tdoas(src, pairs)
    off_t = (TRUE_OFF[None, :] + TRUE_DRIFT[None, :] * times[:, None])
    dsign = off_t[:, AID[pairs[:, 1]]] - off_t[:, AID[pairs[:, 0]]]
    tdoa = tdoa - (TRUE_OFF[AID[pairs[:, 1]]]
                   - TRUE_OFF[AID[pairs[:, 0]]]) + dsign
    init = src + rng.normal(0, 0.2, src.shape)
    xy, off, drift, rms = solver_ops.solve_tdoa_sync(
        jnp.asarray(tdoa, jnp.float32), jnp.asarray(CAT),
        jnp.asarray(pairs), jnp.asarray(AID), 3,
        speed_of_sound=C, height=H,
        init_xy=jnp.asarray(init, jnp.float32),
        event_times_s=jnp.asarray(times, jnp.float32))
    # offsets are referenced to t_mean; compare the model at each event
    tt = times - times.mean()
    est_t = (np.concatenate([[0.0], np.asarray(off)])[None]
             + np.concatenate([[0.0], np.asarray(drift)])[None]
             * tt[:, None])
    true_t = TRUE_OFF[None] + TRUE_DRIFT[None] * times[:, None]
    true_t = true_t - true_t[:, :1]  # array 0 is the reference
    est_t = est_t - est_t[:, :1]
    # the absolute epoch is unobservable; compare offset DIFFERENCES
    assert np.abs(est_t - true_t).max() * FS < 0.02, (est_t, true_t)
    assert np.abs(np.asarray(xy) - src).max() < 2e-3
    assert np.abs(np.asarray(drift) - TRUE_DRIFT[1:]).max() < 1e-7


def test_localize_sync_with_drift_end_to_end():
    """Raw frames over a 30 s session with drifting clocks: drift
    recovered to ~1 ppm and positions stay cm-level, while the
    offset-only model visibly degrades on the late events."""
    fus = ArrayFusionLocalizer.create(
        ARRAYS, PipelineConfig(phat=True, band_hz=(700.0, 7000.0)))
    src = np.array([[0.8, 0.9], [-0.6, 1.6], [1.8, -0.4],
                    [0.2, 2.2], [-1.2, -0.8], [2.4, 1.2],
                    [0.5, 0.2], [-1.8, 1.0]])
    times = np.linspace(0.0, 30.0, len(src))
    mic3 = np.concatenate([CAT, np.zeros((12, 1))], -1)
    src3 = np.concatenate([src, np.full((len(src), 1), H)], -1)
    fr = synth.synth_scene(src3, mic3, noise_rms=0.004, seed=11)
    off_t = (TRUE_OFF[None, :] + TRUE_DRIFT[None, :] * times[:, None])
    fr = synth.fractional_delay(
        fr, off_t[:, AID] * FS)  # [E, 12] per-event per-mic delays
    frames = jnp.asarray(fr.reshape(len(src), 3, 4, -1), jnp.float32)

    out = fus.localize_sync(frames, event_times_s=times)
    drift = np.asarray(out["clock_drift"])
    assert np.abs(drift - TRUE_DRIFT[1:]).max() < 3e-6, (
        drift * 1e6, TRUE_DRIFT[1:] * 1e6)
    err = np.linalg.norm(np.asarray(out["xy_sync"]) - src, axis=-1)
    assert err.max() < 0.08, err

    # offset-only model on the same drifting data: late events' cross
    # TDOAs are samples off -> positions measurably worse
    out0 = fus.localize_sync(frames)
    err0 = np.linalg.norm(np.asarray(out0["xy_sync"]) - src, axis=-1)
    assert err.mean() < err0.mean(), (err, err0)


def test_cross_array_tdoas_with_pinned_transform_cfg():
    """Regression: cross-array correlograms must grow their OWN transform
    length.  An inherited ``fft_pad_mode='circular'`` (the production/bench
    pad mode, fft_length == frame_size) or a pinned ``fft_size`` would
    alias the hundreds-of-samples cross-array delays (lag +s wraps to
    -(N-s)) and silently bias tdoa_cross; cross_array_tdoas now forces
    linear padding sized from sync_max_shift."""
    from audio_triangulation_tpu.models import fusion as fusion_mod

    src = np.array([[0.8, 0.9], [-0.6, 1.6]])
    frames = _world_scene(src, seed=11)
    pairs = geometry.mic_pairs(12)
    exact = _exact_tdoas(src, pairs)  # seconds, incl. clock offsets

    for cfg in (PipelineConfig(phat=True, band_hz=(700.0, 7000.0),
                               fft_pad_mode="circular"),
                PipelineConfig(phat=True, band_hz=(700.0, 7000.0),
                               fft_size=1024)):
        fus = ArrayFusionLocalizer.create(ARRAYS, cfg)
        got = np.asarray(fusion_mod.cross_array_tdoas(
            fus.params, frames, cfg, fus.sync_max_shift)) / FS
        cross = np.asarray(fus.params.cross_pairs)
        # match rows of `exact` to the cross-pair list
        lut = {(int(i), int(j)): k for k, (i, j) in enumerate(pairs)}
        want = np.stack([[exact[e, lut[(int(i), int(j))]]
                          for i, j in cross] for e in range(len(src))])
        # several cross baselines exceed 4 m -> |tdoa| > 580 samples;
        # they must come back unaliased to a fraction of a sample
        assert np.abs(want).max() * FS > 300
        err = np.abs(got - want) * FS
        assert err.max() < 0.6, err.max()
