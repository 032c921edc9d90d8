"""Learned localizer: training convergence, accuracy, checkpointing, and
data-parallel sharded training."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models import neural
from audio_triangulation_tpu.utils import synth

MICS = geometry.square_array(0.3)
CFG = PipelineConfig(frame_size_bits=9, phat=True)  # 512-pt: fast CPU tests


def _dataset(n_scenes, seed=0, noise=0.02):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-0.9, 0.9, (n_scenes, 2)).astype(np.float32)
    src = np.concatenate([xy, np.full((n_scenes, 1), 1.2)], axis=-1)
    frames = synth.synth_scene(
        src, MICS, n=CFG.frame_size, noise_rms=noise, seed=seed)
    return frames.astype(np.float32), xy


def test_training_converges_to_decimeter_accuracy():
    """Fresh synthetic batches every step (the intended regime — data is
    free here, so memorizing noise realizations is impossible); held-out
    scenes localize to ~dm RMS after 500 steps (~15 s CPU)."""
    net = neural.NeuralLocalizer.create(MICS, CFG, hidden=(128, 64),
                                        learning_rate=2e-3)
    val_frames, val_xy = _dataset(128, seed=2)

    data = neural.synthetic_batches(
        MICS, n_batches=500, batch_size=128, pipeline=CFG, extent_m=0.9,
        seed=10)
    (params, _), losses = net.fit(data, seed=0)

    assert losses[-1] < 0.05 * losses[0], (losses[0], losses[-1])
    pred = np.asarray(net.predict(params, jnp.asarray(val_frames)))
    rms = np.sqrt(np.mean(np.sum((pred - val_xy) ** 2, axis=-1)))
    assert rms < 0.12, rms


def test_room_trained_net_beats_physics_in_reverb():
    """The flagship learned-localizer use case: in a reverberant room the
    anechoic physics chain (PHAT + GN) carries a systematic multipath
    bias; an MLP trained on scenes simulated in the SAME room absorbs it.
    Uses the finite-scene-bank regime (bank=640 image-source scenes
    simulated once, fresh noise each step) so the whole train+eval fits
    CI (~20 s CPU)."""
    from audio_triangulation_tpu import Localizer
    from audio_triangulation_tpu.core.config import GridConfig
    from audio_triangulation_tpu.utils import room as room_mod

    r = room_mod.ShoeboxRoom(size=(6.0, 5.0, 3.0), absorption=0.25,
                             max_order=4)
    shift = np.array([3.0, 2.5, 0.0])
    mic3 = np.concatenate([MICS, np.zeros((MICS.shape[0], 1))], axis=-1)

    rng = np.random.default_rng(50)
    xy_val = rng.uniform(-0.8, 0.8, (64, 2)).astype(np.float32)
    src_val = np.concatenate([xy_val, np.full((64, 1), 1.2)], axis=-1)
    fr_val = np.asarray(room_mod.simulate_batch(
        src_val + shift, mic3 + shift, r, n=CFG.frame_size, fs=50_000.0))
    fr_val = (fr_val + rng.normal(0, 0.01, fr_val.shape)).astype(np.float32)

    loc = Localizer.create(MICS, CFG, GridConfig())
    xy_p = np.asarray(loc(jnp.asarray(fr_val))["xy"])
    rms_p = np.sqrt(np.mean(np.sum((xy_p - xy_val) ** 2, axis=-1)))
    assert rms_p > 0.35, rms_p    # the reverberant bias is real here

    net = neural.NeuralLocalizer.create(MICS, CFG, hidden=(128, 64),
                                        learning_rate=3e-3)
    data = neural.synthetic_batches(
        MICS, n_batches=400, batch_size=64, pipeline=CFG, extent_m=0.9,
        room=r, bank=640, seed=70)
    (params, _), _ = net.fit(data, seed=1)
    pred = np.asarray(net.predict(params, jnp.asarray(fr_val)))
    rms_n = np.sqrt(np.mean(np.sum((pred - xy_val) ** 2, axis=-1)))
    assert rms_n < 0.35, rms_n
    assert rms_n < 0.75 * rms_p, (rms_n, rms_p)


def test_fit_runs_on_generator():
    net = neural.NeuralLocalizer.create(MICS, CFG, hidden=(32,))
    data = neural.synthetic_batches(
        MICS, n_batches=3, batch_size=16, pipeline=CFG, seed=3)
    (params, _), losses = net.fit(data, seed=1)
    assert len(losses) == 3 and np.isfinite(losses).all()
    out = net.predict(params, jnp.asarray(_dataset(4)[0]))
    assert out.shape == (4, 2)


def test_synthetic_batches_room_mode():
    from audio_triangulation_tpu.utils import room as room_mod

    r = room_mod.ShoeboxRoom(size=(6.0, 6.0, 3.0), absorption=0.4,
                             max_order=2)
    data = neural.synthetic_batches(
        MICS, n_batches=1, batch_size=4, pipeline=CFG, room=r, seed=4)
    frames, xy = next(iter(data))
    assert frames.shape == (4, MICS.shape[0], CFG.frame_size)
    assert xy.shape == (4, 2)
    assert np.isfinite(frames).all()


def test_checkpoint_roundtrip(tmp_path):
    from audio_triangulation_tpu.utils import checkpoint

    net = neural.NeuralLocalizer.create(MICS, CFG, hidden=(32,))
    params, _ = net.init(seed=5)
    frames, _ = _dataset(4, seed=6)
    before = np.asarray(net.predict(params, jnp.asarray(frames)))

    path = tmp_path / "net"
    checkpoint.save(str(path), params)
    restored = checkpoint.restore(str(path), like=params)
    after = np.asarray(net.predict(restored, jnp.asarray(frames)))
    assert np.allclose(before, after)


def test_data_parallel_training_matches_single_device():
    """Sharding the batch axis over an 8-device mesh is numerically the
    same training step (XLA inserts the gradient psum)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    net = neural.NeuralLocalizer.create(MICS, CFG, hidden=(32,))
    frames, xy = _dataset(64, seed=7)

    params_a, opt_a = net.init(seed=2)
    params_b, opt_b = net.init(seed=2)

    # single device
    for _ in range(3):
        params_a, opt_a, loss_a = net.train_step(
            params_a, opt_a, jnp.asarray(frames), jnp.asarray(xy))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("dp",))
    fr_sh = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P("dp", None, None)))
    xy_sh = jax.device_put(
        jnp.asarray(xy), NamedSharding(mesh, P("dp", None)))
    for _ in range(3):
        params_b, opt_b, loss_b = net.train_step(
            params_b, opt_b, fr_sh, xy_sh)

    assert np.isclose(float(loss_a), float(loss_b), rtol=1e-4)
    la = jax.tree_util.tree_leaves(params_a)
    lb = jax.tree_util.tree_leaves(params_b)
    for a, b_ in zip(la, lb):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
