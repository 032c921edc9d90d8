"""Shoebox image-source simulator: geometry, physics, and end-to-end
localization in reverberant rooms."""

import numpy as np
import pytest
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer
from audio_triangulation_tpu.core.config import GridConfig, PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.utils import room as room_mod
from audio_triangulation_tpu.utils import synth

FS = 50_000.0
C = 343.0


def test_image_count_order_zero_and_one():
    r0 = room_mod.ShoeboxRoom(size=(4.0, 3.0, 2.5), max_order=0)
    pos, gain = room_mod.image_sources([1.0, 1.0, 1.0], r0)
    assert pos.shape == (1, 3) and np.allclose(pos[0], [1, 1, 1])
    assert gain[0] == 1.0

    r1 = room_mod.ShoeboxRoom(size=(4.0, 3.0, 2.5), max_order=1)
    pos, gain = room_mod.image_sources([1.0, 1.0, 1.0], r1)
    # direct + one first-order image per wall
    assert pos.shape == (7, 3)
    assert np.isclose(gain[0], 1.0)


def test_first_order_image_positions():
    """Hand-checked mirror positions for each of the six walls."""
    size = (4.0, 3.0, 2.5)
    src = np.array([1.0, 1.2, 0.8])
    r = room_mod.ShoeboxRoom(size=size, absorption=0.36, max_order=1)
    pos, gain = room_mod.image_sources(src, r)
    beta = np.sqrt(1 - 0.36)
    expected = [
        np.array([-1.0, 1.2, 0.8]),          # x = 0 wall
        np.array([7.0, 1.2, 0.8]),           # x = Lx wall: 2*4 - 1
        np.array([1.0, -1.2, 0.8]),          # y = 0
        np.array([1.0, 4.8, 0.8]),           # y = Ly: 2*3 - 1.2
        np.array([1.0, 1.2, -0.8]),          # z = 0
        np.array([1.0, 1.2, 4.2]),           # z = Lz: 2*2.5 - 0.8
    ]
    for e in expected:
        d = np.linalg.norm(pos - e[None], axis=-1)
        k = int(np.argmin(d))
        assert d[k] < 1e-9, (e, pos)
        assert np.isclose(gain[k], beta), (e, gain[k])


def test_gain_is_reflection_product():
    """A second-order corner image carries the product of both walls'
    coefficients."""
    size = (4.0, 3.0, 2.5)
    src = np.array([1.0, 1.2, 0.8])
    absorption = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7)
    r = room_mod.ShoeboxRoom(size=size, absorption=absorption, max_order=2)
    pos, gain = room_mod.image_sources(src, r)
    beta = np.sqrt(1 - np.asarray(absorption))
    # image reflected off x=0 then y=0: position (-x, -y, z)
    e = np.array([-1.0, -1.2, 0.8])
    d = np.linalg.norm(pos - e[None], axis=-1)
    k = int(np.argmin(d))
    assert d[k] < 1e-9
    assert np.isclose(gain[k], beta[0] * beta[2]), (gain[k], beta[0] * beta[2])


def test_direct_path_matches_anechoic_generator():
    """max_order=0 reproduces synth_scene (same delay/gain conventions)."""
    mics = geometry.square_array(0.3)
    src = np.array([0.5, 0.4, 1.2])
    # place array at room center so the source is inside the room
    r = room_mod.ShoeboxRoom(size=(6.0, 6.0, 3.0), max_order=0)
    shift = np.array([3.0, 3.0, 0.0])
    mics3 = np.concatenate([mics, np.zeros((mics.shape[0], 1))], axis=-1)
    out = room_mod.simulate(src + shift, mics3 + shift, r, noise_rms=0.0)
    ref = synth.synth_scene(src, mics, noise_rms=0.0, attenuation=True)
    assert out.shape == ref.shape == (1, mics.shape[0], 1024)
    assert np.max(np.abs(out - ref)) < 1e-6


def test_echo_arrives_at_predicted_delay():
    """Impulse response shows a peak at each image's geometric delay."""
    size = (4.0, 3.0, 2.5)
    src = np.array([1.0, 1.5, 1.2])
    mic = np.array([[2.5, 1.5, 1.2]])
    r = room_mod.ShoeboxRoom(size=size, absorption=0.5, max_order=1)
    impulse = np.zeros(64)
    impulse[0] = 1.0
    n = 2048
    out = room_mod.simulate(src, mic, r, n=n, signal=impulse,
                            amplitude=1.0)[0, 0]
    pos, gain = room_mod.image_sources(src, r)
    d = np.linalg.norm(pos - mic[0][None], axis=-1)
    d_ref = np.linalg.norm(src - mic[0])
    delays = (d - d_ref) / C * FS
    for k in range(pos.shape[0]):
        idx = int(round(delays[k]))
        # fractional-delay sinc spreads energy over neighbours; check a
        # 3-sample window captures the expected amplitude
        window = out[max(idx - 1, 0): idx + 2]
        expect = gain[k] * d_ref / d[k]
        assert np.max(np.abs(window)) > 0.5 * expect, (k, idx, expect)


def test_rt60_decay_matches_sabine():
    """Schroeder backward integral of a simulated IR decays at roughly the
    Sabine rate (ISM vs Sabine agree within a factor ~2 for live rooms)."""
    size = (5.0, 4.0, 3.0)
    rt60_target = 0.15
    alpha = room_mod.absorption_for_rt60(size, rt60_target)
    r = room_mod.ShoeboxRoom(size=size, absorption=alpha, max_order=14)
    src = np.array([1.2, 1.1, 1.3])
    mic = np.array([[3.6, 2.9, 1.6]])
    impulse = np.zeros(16)
    impulse[0] = 1.0
    fs = 16_000.0  # IR length is what matters, not audio bandwidth
    n = 1 << 12  # 0.26 s at 16 kHz
    ir = room_mod.simulate(src, mic, r, n=n, fs=fs, signal=impulse,
                           amplitude=1.0)[0, 0]
    # Schroeder: E(t) = integral_t^inf ir^2; fit slope between -5 and -25 dB
    e = np.cumsum(ir[::-1] ** 2)[::-1]
    edb = 10 * np.log10(np.maximum(e / e[0], 1e-30))
    t = np.arange(n) / fs
    sel = (edb < -5) & (edb > -25)
    assert sel.sum() > 100
    slope = np.polyfit(t[sel], edb[sel], 1)[0]  # dB/s
    rt60_measured = -60.0 / slope
    assert 0.5 * rt60_target < rt60_measured < 2.0 * rt60_target, (
        rt60_measured, rt60_target)


def test_localization_in_reverberant_room():
    """Full PHAT pipeline localizes a source in a live room (the claim the
    random-echo synth test makes, now under a physical room model)."""
    mics = geometry.square_array(0.3)
    plane = np.array([0.5, 0.4])
    src = np.array([0.5, 0.4, 1.2])
    shift = np.array([3.0, 2.5, 0.3])
    mics3 = np.concatenate([mics, np.zeros((mics.shape[0], 1))], axis=-1)
    r = room_mod.ShoeboxRoom(size=(6.0, 5.0, 3.0), absorption=0.35,
                             max_order=6)
    frames = room_mod.simulate(src + shift, mics3 + shift, r,
                               signal=synth.colored_burst(1024, FS, seed=3),
                               noise_rms=0.005, seed=4)
    loc = Localizer.create(np.asarray(mics, np.float32),
                           PipelineConfig(phat=True), GridConfig())
    out = loc(jnp.asarray(frames, jnp.float32))
    xy = np.asarray(out["xy"])[0]
    assert np.linalg.norm(xy - plane) < 0.12, (xy, plane)


def test_phat_beats_plain_gcc_in_reverb():
    """Median localization error under strong reverb: whitened < plain."""
    mics = geometry.square_array(0.3)
    mics3 = np.concatenate([mics, np.zeros((mics.shape[0], 1))], axis=-1)
    shift = np.array([3.0, 2.5, 0.3])
    r = room_mod.ShoeboxRoom(size=(6.0, 5.0, 3.0), absorption=0.12,
                             max_order=8)
    rng = np.random.default_rng(11)
    frames, planes = [], []
    for i in range(8):
        x, y = rng.uniform(-0.8, 0.8, 2)
        planes.append([x, y])
        src = np.array([x, y, 1.2])
        frames.append(room_mod.simulate(
            src + shift, mics3 + shift, r,
            signal=synth.colored_burst(1024, FS, seed=20 + i),
            noise_rms=0.004, seed=30 + i)[0])
    fr = jnp.asarray(np.stack(frames), jnp.float32)
    planes = np.asarray(planes)

    err = {}
    for phat in (True, False):
        loc = Localizer.create(np.asarray(mics, np.float32),
                               PipelineConfig(phat=phat), GridConfig())
        xy = np.asarray(loc(fr)["xy"])
        err[phat] = np.median(np.linalg.norm(xy - planes, axis=-1))
    assert err[True] < err[False], err
    assert err[True] < 0.15, err


def test_simulate_batch_matches_numpy():
    """The jitted batched generator agrees with the float64 reference."""
    mics = geometry.square_array(0.3)
    mics3 = np.concatenate([mics, np.zeros((mics.shape[0], 1))], axis=-1)
    shift = np.array([2.0, 2.0, 1.0])
    r = room_mod.ShoeboxRoom(size=(4.0, 4.0, 2.5), absorption=0.4,
                             max_order=3)
    sources = np.array([[0.3, 0.2, 1.2], [-0.4, 0.5, 1.0]]) + shift
    ref = np.concatenate([
        room_mod.simulate(s, mics3 + shift, r, noise_rms=0.0)
        for s in sources])
    got = np.asarray(room_mod.simulate_batch(sources, mics3 + shift, r))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 2e-4, np.max(np.abs(got - ref))


def test_validation_errors():
    with pytest.raises(ValueError):
        room_mod.ShoeboxRoom(absorption=0.0).wall_reflections()
    with pytest.raises(ValueError):
        room_mod.ShoeboxRoom(absorption=(0.5, 0.5)).wall_reflections()
    with pytest.raises(ValueError):
        room_mod.image_sources([10.0, 1.0, 1.0], room_mod.ShoeboxRoom())
    with pytest.raises(ValueError):
        room_mod.absorption_for_rt60((2.0, 2.0, 2.0), 0.05)
