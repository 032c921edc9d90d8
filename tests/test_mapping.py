"""Acoustic reflector mapping (ops/echo + models/mapping): per-mic echo
delays -> image-source range multilateration -> wall estimates.

New capability — the reference firmware suppresses echoes (peak taper,
correlations.c:26-33); here they are inverted into room geometry."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.core.config import GridConfig, SolverConfig
from audio_triangulation_tpu.models import mapping
from audio_triangulation_tpu.ops import echo as echo_ops
from audio_triangulation_tpu.utils import room as room_mod, synth

M = 6
MICS = geometry.circular_array(M, 0.25)
FS = 50_000.0


def _broadband_burst(n=1024, start=50, length=400, f0=800.0, f1=7000.0):
    """Full-sweep chirp inside a short window: genuinely broadband, so its
    compressed autocorrelation is a narrow spike (a narrow-envelope
    chirp_burst is quasi-tonal — periodic autocorrelation peaks would
    masquerade as echoes)."""
    sig = np.zeros(n)
    sweep = f0 + (f1 - f0) * np.arange(length) / length
    phase = 2 * np.pi * np.cumsum(sweep) / FS
    sig[start:start + length] = np.hanning(length) * np.sin(phase)
    return sig


# ---------------------------------------------------------------- units
def test_top_delays_two_echoes():
    rng = np.random.default_rng(0)
    n = 1024
    s = _broadband_burst(n)
    x = s.copy()
    x += 0.4 * np.roll(s, 180)
    x += 0.25 * np.roll(s, 420)
    x += rng.normal(0, 0.003, n)
    prof = echo_ops.echo_profile(
        jnp.asarray(x[None, :], jnp.float32), PipelineConfig(),
        band_hz=(700.0, 7000.0))
    d, a = echo_ops.top_delays(prof, q_min=40, q_max=600, n_echoes=2)
    d = np.sort(np.asarray(d)[0])
    assert abs(d[0] - 180) < 1.0, d
    assert abs(d[1] - 420) < 1.0, d


def test_solve_image_from_ranges_exact():
    p_true = np.array([2.6, -1.1])
    d = np.linalg.norm(p_true - MICS, axis=-1)
    p, rms = mapping.solve_image_from_ranges(
        jnp.asarray(MICS, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.ones(M, jnp.float32), 0.0)
    assert np.linalg.norm(np.asarray(p) - p_true) < 1e-3, p
    assert float(rms) < 1e-4


def test_solve_image_with_height_offset_and_mask():
    p_true = np.array([-1.8, 2.2])
    dz = 1.2
    d = np.sqrt(np.sum((p_true - MICS) ** 2, axis=-1) + dz * dz)
    w = np.ones(M)
    w[2] = 0.0  # missing mic
    d[2] = 99.0  # garbage range, masked out
    p, rms = mapping.solve_image_from_ranges(
        jnp.asarray(MICS, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(w, jnp.float32), dz)
    assert np.linalg.norm(np.asarray(p) - p_true) < 1e-2, p


def test_wall_from_image():
    n, d = mapping.wall_from_image([0.5, 0.0], [3.5, 0.0])
    assert np.allclose(n, [1.0, 0.0], atol=1e-9)
    assert abs(d - 2.0) < 1e-9


# ------------------------------------------------------------------ e2e
def _room_scene(center_xy, absorption, sources, seed=0, max_order=1):
    """Simulate events in a shoebox room; returns frames [E, M, N] and the
    Localizer configured for the in-plane (height 0) scene."""
    center = np.array([center_xy[0], center_xy[1], 1.2])
    mics_room = np.zeros((M, 3))
    mics_room[:, :2] = MICS + center[:2]
    mics_room[:, 2] = center[2]
    rm = room_mod.ShoeboxRoom(size=(6.0, 5.0, 3.0), absorption=absorption,
                              max_order=max_order)
    sig = _broadband_burst()
    frames = np.concatenate([
        room_mod.simulate(
            np.array([sx + center[0], sy + center[1], center[2]]),
            mics_room, rm, noise_rms=0.003, seed=seed + i, signal=sig)
        for i, (sx, sy) in enumerate(sources)], axis=0)
    grid = GridConfig(projection="plane", height_m=0.0, cells_per_m=24.0,
                      half_cells_x=40, half_cells_y=40)
    pcfg = PipelineConfig(
        phat=True, band_hz=(700.0, 7000.0), window_enabled=False,
        max_shift_samples=geometry.max_lag_for_array(MICS, PipelineConfig()))
    loc = Localizer.create(MICS, pcfg, grid,
                           SolverConfig(constrain_to_sphere=False))
    return jnp.asarray(frames, jnp.float32), loc


def test_map_single_wall():
    """One reflective wall 1.2 m away (+x): mapped normal/distance."""
    frames, loc = _room_scene(
        (4.8, 2.5), (0.99, 0.02, 0.99, 0.99, 0.99, 0.99),
        [(0.3, 0.2), (0.1, -0.5), (0.5, 0.45)])
    mapper = mapping.ReflectorMapper(loc, n_echoes=1, q_max=900)
    result = mapper.map(frames)
    walls = result["walls"]
    assert walls, "no walls mapped"
    w = walls[0]
    assert w.support >= 2, [(x.normal, x.distance, x.support) for x in walls]
    assert w.normal @ np.array([1.0, 0.0]) > 0.98, w.normal
    assert abs(w.distance - 1.2) < 0.15, w.distance


def test_map_two_walls():
    """Two reflective walls (+x at 1.2 m, -y at 1.5 m) resolved from the
    same events via per-mic multi-echo extraction."""
    frames, loc = _room_scene(
        (4.8, 1.5), (0.99, 0.02, 0.02, 0.99, 0.99, 0.99),
        [(0.3, 0.2), (0.1, -0.4), (-0.4, 0.35)])
    mapper = mapping.ReflectorMapper(loc, n_echoes=2, q_max=900)
    result = mapper.map(frames)
    walls = result["walls"]
    assert len(walls) >= 2, [(x.normal, x.distance, x.support) for x in walls]
    got_x = [w for w in walls if w.normal @ np.array([1.0, 0.0]) > 0.95]
    got_y = [w for w in walls if w.normal @ np.array([0.0, -1.0]) > 0.95]
    assert got_x and abs(got_x[0].distance - 1.2) < 0.2, \
        [(x.normal, x.distance) for x in walls]
    assert got_y and abs(got_y[0].distance - 1.5) < 0.2, \
        [(x.normal, x.distance) for x in walls]
