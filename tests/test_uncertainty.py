"""Per-event position uncertainty: solver covariance calibration and
covariance-aware tracking."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.models.tracking import Tracker, TrackerConfig
from audio_triangulation_tpu.utils import synth

MICS = geometry.square_array(0.3)


def _noisy_scenes(xy, n, noise, seed):
    src = np.array([xy[0], xy[1], 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    return synth.synth_scene(
        np.broadcast_to(src, (n, 3)), MICS, noise_rms=noise, seed=seed), src


def test_xy_cov_output_shape_and_spd():
    loc = Localizer.create(MICS, PipelineConfig(phat=True))
    frames, _ = _noisy_scenes((0.4, 0.3), 8, 0.02, seed=0)
    out = loc(jnp.asarray(frames, jnp.float32))
    cov = np.asarray(out["xy_cov"])
    assert cov.shape == (8, 2, 2)
    assert np.allclose(cov[:, 0, 1], cov[:, 1, 0])
    # symmetric positive definite
    ev = np.linalg.eigvalsh(cov)
    assert np.all(ev > 0)


def test_xy_cov_calibrated_against_monte_carlo():
    """Predicted sigma^2 (J^T J)^-1 tracks the actual estimator scatter
    within a small factor (the standard NLS covariance sanity check)."""
    loc = Localizer.create(MICS, PipelineConfig(phat=False))
    frames, src = _noisy_scenes((0.5, 0.4), 256, 0.05, seed=1)
    out = loc(jnp.asarray(frames, jnp.float32))
    xy = np.asarray(out["xy"])
    cov = np.asarray(out["xy_cov"])

    emp = np.cov((xy - xy.mean(0)).T)           # empirical scatter [2, 2]
    pred = cov.mean(0)                           # mean predicted cov
    # compare the overall scale (trace) within a factor of 4 both ways
    ratio = np.trace(pred) / max(np.trace(emp), 1e-12)
    assert 0.25 < ratio < 4.0, (pred, emp, ratio)


def test_xy_cov_grows_with_noise():
    loc = Localizer.create(MICS, PipelineConfig(phat=False))
    sizes = []
    for noise in (0.01, 0.1):
        frames, _ = _noisy_scenes((0.4, 0.3), 16, noise, seed=3)
        out = loc(jnp.asarray(frames, jnp.float32))
        sizes.append(float(np.trace(np.asarray(out["xy_cov"]).mean(0))))
    assert sizes[1] > 2.0 * sizes[0], sizes


def test_tracker_z_cov_weights_measurements():
    """A high-covariance measurement pulls the track less than a
    low-covariance one (covariance-aware gain)."""
    trk = Tracker(TrackerConfig(measurement_noise=0.03))
    t0 = 0.0

    def run(z_cov):
        state = trk.init()
        state, _ = trk.step(state, np.array([0.0, 0.0]), t0, True)
        state, _ = trk.step(state, np.array([0.0, 0.0]), t0 + 0.1, True)
        # a small offset that stays inside the association gate for both
        # covariances (a far-off tight measurement would rightly spawn a
        # new track instead — tested below via 'assigned')
        state, out = trk.step(state, np.array([0.05, 0.0]), t0 + 0.2, True,
                              z_cov=z_cov)
        k = int(out["assigned"])
        assert k == 0, out["assigned"]  # same track updated, not a spawn
        return float(out["track_xy"][k, 0])

    x_tight = run(np.diag([1e-4, 1e-4]))   # trusts the new measurement
    x_loose = run(np.diag([1.0, 1.0]))     # barely moves
    assert x_tight > 0.02, x_tight
    assert x_loose < 0.005, x_loose

    # and the complementary property: a TIGHT measurement far outside the
    # gate is evidence of a NEW source -> spawns instead of dragging
    state = trk.init()
    state, _ = trk.step(state, np.array([0.0, 0.0]), t0, True)
    state, _ = trk.step(state, np.array([0.0, 0.0]), t0 + 0.1, True)
    state, out = trk.step(state, np.array([0.5, 0.0]), t0 + 0.2, True,
                          z_cov=np.diag([1e-4, 1e-4]))
    assert int(out["assigned"]) == -1
    assert bool(out["track_active"][1])  # spawned in the next slot


def test_tracker_z_cov_default_matches_scalar():
    """z_cov = measurement_noise^2 I reproduces the default path exactly."""
    cfg = TrackerConfig()
    trk = Tracker(cfg)
    r2 = cfg.measurement_noise ** 2
    zs = [np.array([0.1, 0.2]), np.array([0.15, 0.22]),
          np.array([0.2, 0.24])]

    sa = trk.init()
    sb = trk.init()
    for i, z in enumerate(zs):
        sa, oa = trk.step(sa, z, 0.1 * i, True)
        sb, ob = trk.step(sb, z, 0.1 * i, True, z_cov=np.diag([r2, r2]))
    np.testing.assert_allclose(
        np.asarray(oa["track_xy"]), np.asarray(ob["track_xy"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sa.p), np.asarray(sb.p),
                               atol=1e-6)


def test_localizer_cov_feeds_tracker_end_to_end():
    """Full loop: localize noisy events, feed xy + xy_cov into the tracker
    via step_many; tracks confirm and stay near truth."""
    loc = Localizer.create(MICS, PipelineConfig(phat=True))
    trk = Tracker(TrackerConfig())
    frames, src = _noisy_scenes((0.3, -0.2), 6, 0.02, seed=7)
    out = loc(jnp.asarray(frames, jnp.float32))
    xy = np.asarray(out["xy"])
    cov = np.asarray(out["xy_cov"])

    state = trk.init()
    for i in range(6):
        state, tout = trk.step(state, xy[i], 0.2 * i, True, z_cov=cov[i])
    k = int(tout["assigned"])
    assert bool(tout["track_confirmed"][k])
    err = np.linalg.norm(np.asarray(tout["track_xy"])[k] - src[:2])
    assert err < 0.08, err


def test_streaming_emits_xy_cov():
    """The live path carries the same per-event covariance as batch."""
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer
    from audio_triangulation_tpu.utils import synth as synth_mod

    sl = StreamingLocalizer.create(MICS, PipelineConfig(phat=True))
    src = np.array([0.4, 0.3, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    # 8-bit-scale stream (DC 128 + x110 burst), the detector's input model
    rng = np.random.default_rng(0)
    frame = synth_mod.synth_scene(src, MICS, noise_rms=0.0, seed=0)[0]
    stream = rng.integers(127, 130, size=(4, 12_000)).astype(np.float64)
    stream[:, 4_000: 5_024] += 110.0 * frame
    stream = np.clip(np.round(stream), 0, 255)
    state, outs = sl.run(stream)
    covs = [np.asarray(o["xy_cov"]) for o in outs if o["event"]]
    assert all("xy_cov" in o for o in outs)
    assert covs, "no event detected"
    ev = np.linalg.eigvalsh(covs[0])
    assert covs[0].shape == (2, 2) and np.all(ev > 0)


def test_step_multi_z_covs_matches_scalar_default():
    """Identical isotropic z_covs reproduce the homogeneous JPDA path
    exactly."""
    cfg = TrackerConfig(max_tracks=4)
    trk = Tracker(cfg)
    r2 = cfg.measurement_noise ** 2
    rng = np.random.default_rng(3)
    zs_seq = [rng.normal([[0.2, 0.1], [-0.4, -0.3]], 0.02) for _ in range(4)]
    covs = np.broadcast_to(np.diag([r2, r2]), (2, 2, 2)).copy()

    sa = trk.init()
    sb = trk.init()
    valids = np.array([True, True])
    for i, zs in enumerate(zs_seq):
        sa, oa = trk.step_multi(sa, zs, 0.1 * (i + 1), valids)
        sb, ob = trk.step_multi(sb, zs, 0.1 * (i + 1), valids,
                                z_covs=covs)
    np.testing.assert_allclose(np.asarray(sa.x), np.asarray(sb.x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sa.p), np.asarray(sb.p),
                               atol=1e-5)


def test_step_multi_heterogeneous_covs_weight_measurements():
    """Two simultaneous measurements of ONE track: the tight one dominates
    the update."""
    trk = Tracker(TrackerConfig(max_tracks=2, clutter_density=0.05))
    state = trk.init()
    valids = np.array([True, False])
    # establish one track at the origin
    for i in range(3):
        state, _ = trk.step_multi(
            state, np.array([[0.0, 0.0], [9.9, 9.9]]), 0.1 * (i + 1),
            valids)
    valids = np.array([True, True])
    # two conflicting measurements: +0.05 (tight) and -0.05 (very loose)
    zs = np.array([[0.05, 0.0], [-0.05, 0.0]])
    covs = np.stack([np.diag([1e-4, 1e-4]), np.diag([0.5, 0.5])])
    state, out = trk.step_multi(state, zs, 0.4, valids, z_covs=covs)
    k = int(np.argmax(np.asarray(out["track_active"])))
    x = float(np.asarray(out["track_xy"])[k, 0])
    # pulled clearly toward the tight measurement, not the average
    assert x > 0.02, x
