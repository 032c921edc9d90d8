"""Gauss-Newton TDOA solver and far-field bearing."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.core.config import SolverConfig
from audio_triangulation_tpu.ops import solver

pytestmark = pytest.mark.smoke  # GN solver


MICS = geometry.reference_array()
PAIRS = jnp.asarray(geometry.mic_pairs(3))
C = 343.0
H = 1.2


def _true_tdoas(xy, constrain_sphere=True):
    mic3 = jnp.zeros((3, 3), jnp.float32).at[:, :2].set(jnp.asarray(MICS))
    return solver.predicted_tdoas(
        jnp.asarray(xy, jnp.float32), mic3, PAIRS, C, H, constrain_sphere)


def test_solver_recovers_position_from_exact_tdoas():
    for true_xy in ([0.8, -0.5], [-1.2, 0.9], [0.1, 0.2]):
        tau = _true_tdoas(true_xy)
        xy, rms = solver.solve_tdoa(
            tau, jnp.asarray(MICS), PAIRS,
            speed_of_sound=C, height=H,
            init_xy=jnp.asarray([0.0, 0.01], jnp.float32),
            cfg=SolverConfig(iterations=25),
        )
        # sphere model: position is identified up to the radial projection;
        # compare projected model points
        p_true = solver.lift_to_model(jnp.asarray(true_xy, jnp.float32), H, True)
        p_est = solver.lift_to_model(xy, H, True)
        assert float(jnp.linalg.norm(p_true - p_est)) < 0.02
        assert float(rms) < 1e-3


def test_solver_plane_model():
    cfg = SolverConfig(iterations=25, constrain_to_sphere=False)
    true_xy = [0.6, -0.4]
    tau = _true_tdoas(true_xy, constrain_sphere=False)
    xy, rms = solver.solve_tdoa(
        tau, jnp.asarray(MICS), PAIRS,
        speed_of_sound=C, height=H,
        init_xy=jnp.asarray([0.5, -0.3], jnp.float32), cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(xy), true_xy, atol=5e-3)
    assert float(rms) < 1e-4


def test_solver_vmaps():
    xys = jnp.asarray([[0.5, 0.5], [-0.7, 0.2], [0.0, -0.9]], jnp.float32)
    taus = jax.vmap(_true_tdoas)(xys)
    solve = jax.vmap(
        lambda t, i: solver.solve_tdoa(
            t, jnp.asarray(MICS), PAIRS, speed_of_sound=C, height=H,
            init_xy=i, cfg=SolverConfig(iterations=20))
    )
    xy, rms = solve(taus, xys * 0.9)
    assert xy.shape == (3, 2)
    assert np.all(np.asarray(rms) < 1e-3)


def test_farfield_bearing_points_at_source():
    mics = geometry.circular_array(8, 0.1)
    pairs = jnp.asarray(geometry.mic_pairs(8))
    ang = np.deg2rad(37.0)
    u_true = np.array([np.cos(ang), np.sin(ang)])
    src = 100.0 * u_true  # far field
    mic3 = np.zeros((8, 3)); mic3[:, :2] = mics
    d = np.linalg.norm(src[None, :2] - mics, axis=-1)
    tau = (d[np.asarray(pairs)[:, 1]] - d[np.asarray(pairs)[:, 0]]) / C
    u = np.asarray(solver.farfield_bearing(
        jnp.asarray(tau, jnp.float32), jnp.asarray(mics), pairs, C))
    assert np.dot(u, u_true) > 0.999
