"""Multi-device sharding on the 8-device virtual CPU mesh (SURVEY.md §4 d)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, geometry
from audio_triangulation_tpu.parallel import mesh as mesh_lib
from audio_triangulation_tpu.parallel import sharded
from audio_triangulation_tpu.utils import synth

pytestmark = pytest.mark.smoke  # multi-device sharding


MICS = geometry.reference_array()


def _place(x, y, h=1.2):
    p = np.array([x, y, h], np.float64)
    return np.array([x, y]), p * (h / np.linalg.norm(p))


def test_mesh_construction():
    m = mesh_lib.make_mesh()
    assert m.devices.shape == (8, 1)
    m2 = mesh_lib.make_mesh((4, 2))
    assert m2.shape == {"data": 4, "model": 2}


def test_data_parallel_matches_single_device():
    loc = Localizer.create(MICS)
    planes, sources = zip(*[_place(0.1 * i - 0.3, 0.12 * i - 0.4)
                            for i in range(8)])
    frames = jnp.asarray(
        synth.synth_scene(np.stack(sources), MICS, noise_rms=0.01, seed=11),
        jnp.float32)

    ref = loc(frames)

    m = mesh_lib.make_mesh()
    fn, params = sharded.make_sharded_localize(loc, m)
    out = fn(params, frames)

    np.testing.assert_allclose(
        np.asarray(out["xy"]), np.asarray(ref["xy"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["tdoa_samples"]), np.asarray(ref["tdoa_samples"]),
        atol=1e-4)
    # outputs actually sharded over the data axis
    assert len(out["xy"].sharding.device_set) == 8


def test_grid_parallel_matches():
    loc = Localizer.create(MICS, srp_form="matmul")
    _, source = _place(0.5, -0.2)
    frames = jnp.asarray(
        np.repeat(synth.synth_scene(source, MICS, seed=12), 8, axis=0),
        jnp.float32)
    ref = loc(frames)

    m = mesh_lib.make_mesh((4, 2))
    fn, params = sharded.make_sharded_localize(loc, m, grid_parallel=True)
    out = fn(params, frames)
    np.testing.assert_allclose(
        np.asarray(out["xy"]), np.asarray(ref["xy"]), atol=1e-4)


def test_calibration_train_step_runs_and_improves():
    from audio_triangulation_tpu.models import calibration

    rng = np.random.default_rng(21)
    calib = Calib = calibration.Calibrator.create(3)
    planes, sources = zip(*[
        _place(float(x), float(y))
        for x, y in rng.uniform(-1.0, 1.0, (32, 2))])
    frames = synth.synth_scene(np.stack(sources), MICS, noise_rms=0.005,
                               seed=13)
    batch = calibration.CalibBatch(
        frames=jnp.asarray(frames, jnp.float32),
        source_xy=jnp.asarray(np.stack(planes), jnp.float32),
    )
    # perturbed geometry guess
    guess = MICS + rng.normal(0, 0.01, MICS.shape).astype(np.float32)
    params, opt_state = calib.init(guess)
    losses = []
    for _ in range(30):
        params, opt_state, loss = calib.train_step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # recovered geometry closer to truth than the perturbed guess
    err0 = np.abs(guess - MICS).mean()
    err1 = np.abs(np.asarray(params.mic_xy) - MICS).mean()
    assert err1 < err0, (err0, err1)


def test_calibration_sharded_train_step():
    """Train step with the batch sharded over the data axis: XLA inserts the
    gradient psum from sharding annotations alone."""
    from audio_triangulation_tpu.models import calibration

    rng = np.random.default_rng(22)
    calib = calibration.Calibrator.create(3)
    planes, sources = zip(*[
        _place(float(x), float(y))
        for x, y in rng.uniform(-1.0, 1.0, (16, 2))])
    frames = synth.synth_scene(np.stack(sources), MICS, seed=14)

    m = mesh_lib.make_mesh()
    batch = calibration.CalibBatch(
        frames=jax.device_put(
            jnp.asarray(frames, jnp.float32), mesh_lib.frames_sharding(m)),
        source_xy=jax.device_put(
            jnp.asarray(np.stack(planes), jnp.float32),
            mesh_lib.batch_sharding(m, 2)),
    )
    params, opt_state = calib.init(MICS)
    params, opt_state, loss = calib.train_step(params, opt_state, batch)
    assert np.isfinite(float(loss))


def test_unsupervised_em_calibration_8mic():
    """No labels: EM self-calibration (E: localize events with the current
    geometry; M: supervised refine) improves an 8-mic array's geometry.
    3-mic arrays are nearly gauge-degenerate for this (documented)."""
    from audio_triangulation_tpu.models import calibration

    mics8 = geometry.circular_array(8, 0.2)
    rng = np.random.default_rng(33)
    calib = calibration.Calibrator.create(8)

    def place(x, y, h=1.2):
        p = np.array([x, y, h])
        return p * (h / np.linalg.norm(p))

    sources = np.stack([
        place(x, y) for x, y in rng.uniform(-1.0, 1.0, (32, 2))])
    frames = jnp.asarray(
        synth.synth_scene(sources, mics8, noise_rms=0.003, seed=34),
        jnp.float32)
    guess = (mics8 + rng.normal(0, 0.012, mics8.shape)).astype(np.float32)

    # 3 rounds x 50 steps on 32 scenes converges to ratio ~0.61 (measured)
    # against the 0.85 assert — half the wall cost of the original 4x60x48
    mic_est, losses = calib.fit_em(guess, frames, em_rounds=3,
                                   inner_steps=50)
    err0 = np.abs(guess - mics8).mean()
    err1 = np.abs(mic_est - mics8).mean()
    assert err1 < err0 * 0.85, (err0, err1)


def test_hybrid_mesh_single_host():
    from audio_triangulation_tpu.parallel import distributed

    # no coordinator env -> no-op
    distributed.initialize()
    m = distributed.make_hybrid_mesh(model_parallel=2)
    assert m.shape == {"data": 4, "model": 2}
    import pytest

    with pytest.raises(ValueError):
        distributed.make_hybrid_mesh(model_parallel=3)
