"""Batched analytic-Jacobian Gauss-Newton vs the autodiff reference solver."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.core.config import SolverConfig
from audio_triangulation_tpu.ops import solver

MICS = geometry.reference_array()
PAIRS = jnp.asarray(geometry.mic_pairs(3))
C, H = 343.0, 1.2


def _true_tdoas(xy, sphere=True):
    mic3 = jnp.zeros((3, 3), jnp.float32).at[:, :2].set(jnp.asarray(MICS))
    return solver.predicted_tdoas(
        jnp.asarray(xy, jnp.float32), mic3, PAIRS, C, H, sphere)


def test_batched_matches_reference_solver():
    for sphere in (True, False):
        cfg = SolverConfig(iterations=12, constrain_to_sphere=sphere)
        xys = jnp.asarray(
            [[0.8, -0.5], [-1.2, 0.9], [0.1, 0.2], [0.5, 0.5]], jnp.float32)
        taus = jax.vmap(lambda q: _true_tdoas(q, sphere))(xys)
        init = xys * 0.85 + 0.02

        ref_xy, ref_rms = jax.vmap(
            lambda t, i: solver.solve_tdoa(
                t, jnp.asarray(MICS), PAIRS, speed_of_sound=C, height=H,
                init_xy=i, cfg=cfg)
        )(taus, init)
        bat_xy, bat_rms = solver.solve_tdoa_batched(
            taus, jnp.asarray(MICS), PAIRS, speed_of_sound=C, height=H,
            init_xy=init, cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(bat_xy), np.asarray(ref_xy), atol=2e-4)
        assert np.all(np.asarray(bat_rms) < 1e-3)


def test_batched_converges_from_grid_like_init():
    cfg = SolverConfig(iterations=10)
    true = jnp.asarray([[0.9, 0.4], [-0.6, -0.8]], jnp.float32)
    taus = jax.vmap(_true_tdoas)(true)
    # init off by one grid cell (1/24 m)
    init = true + jnp.asarray([[1 / 24.0, -1 / 24.0], [0.0, 1 / 24.0]])
    xy, rms = solver.solve_tdoa_batched(
        taus, jnp.asarray(MICS), PAIRS, speed_of_sound=C, height=H,
        init_xy=init, cfg=cfg)
    p_true = solver.lift_to_model(true, H, True)
    p_est = solver.lift_to_model(xy, H, True)
    assert float(jnp.linalg.norm(p_true - p_est, axis=-1).max()) < 0.01
