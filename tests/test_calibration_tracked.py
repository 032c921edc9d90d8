"""Self-calibration from tracked motion: a single moving source, localized
and Kalman-tracked, becomes the calibration reference (docs/ROADMAP)."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models import calibration
from audio_triangulation_tpu.utils import synth

HEIGHT = 1.2


def _lift(xy):
    """The localizer's sphere model (ops.solver.lift_to_model) in numpy."""
    p = np.concatenate([xy, np.full(xy.shape[:-1] + (1,), HEIGHT)], -1)
    return p * (HEIGHT / np.linalg.norm(p, axis=-1, keepdims=True))


def test_fit_tracked_improves_geometry_8mic():
    mics8 = geometry.circular_array(8, 0.2)
    rng = np.random.default_rng(55)
    calib = calibration.Calibrator.create(8)

    # constant-velocity source crossing the scene, 36 timestamped events
    p0, v = np.array([-0.8, -0.3]), np.array([0.55, 0.3])
    times = np.sort(rng.uniform(0.0, 2.2, 36)).astype(np.float32)
    traj_xy = p0[None, :] + times[:, None] * v[None, :]  # [B, 2]
    frames = jnp.asarray(
        synth.synth_scene(_lift(traj_xy), mics8, noise_rms=0.003, seed=56),
        jnp.float32)

    guess = (mics8 + rng.normal(0, 0.012, mics8.shape)).astype(np.float32)
    mic_est, coeffs, losses = calib.fit_tracked(
        guess, frames, times, traj_order=1, steps=250)

    err0 = np.abs(guess - mics8).mean()
    err1 = np.abs(mic_est - mics8).mean()
    assert err1 < err0 * 0.85, (err0, err1)
    assert losses[-1] < losses[0]
    # the refined trajectory velocity matches the true motion
    np.testing.assert_allclose(coeffs[1], v, atol=0.15)


def test_estimate_speed_of_sound_recovers_true_c():
    """Scenes synthesized at a hot-day c = 350 m/s; the closed-form
    estimator recovers it to sub-m/s from the standard-condition config."""
    from audio_triangulation_tpu.models import calibration
    from audio_triangulation_tpu.core.config import PipelineConfig
    from audio_triangulation_tpu.utils import synth

    c_true = 350.0
    mics = geometry.square_array(0.3)
    rng = np.random.default_rng(31)
    planes, sources = [], []
    for x, y in rng.uniform(-0.8, 0.8, (48, 2)):
        p = np.array([x, y, 1.2], np.float64)
        sources.append(p * (1.2 / np.linalg.norm(p)))
        # pre-projection plane coords: lift_to_model's convention
        planes.append([x, y])
    frames = synth.synth_scene(
        np.stack(sources), mics, speed_of_sound=c_true, noise_rms=0.005,
        seed=32)

    c_est, diag = calibration.estimate_speed_of_sound(
        frames, np.stack(planes), mics, PipelineConfig())
    assert abs(c_est - c_true) < 1.0, (c_est, diag)
    assert diag["n_used"] > 50
    assert diag["rms_samples"] < 0.5


def test_estimate_speed_of_sound_rejects_degenerate():
    """All near-zero TDOAs (source at the array center) -> clear error."""
    import pytest

    from audio_triangulation_tpu.models import calibration
    from audio_triangulation_tpu.core.config import PipelineConfig
    from audio_triangulation_tpu.utils import synth

    mics = geometry.square_array(0.3)
    src = np.array([[0.0, 0.0, 1.2]])
    frames = synth.synth_scene(src, mics, noise_rms=0.005, seed=1)
    with pytest.raises(ValueError):
        calibration.estimate_speed_of_sound(
            frames, np.zeros((1, 2)), mics, PipelineConfig())
