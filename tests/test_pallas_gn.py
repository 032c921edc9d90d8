"""Pallas Gauss-Newton kernel vs the XLA batched solver."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.core.config import SolverConfig
from audio_triangulation_tpu.ops import solver
from audio_triangulation_tpu.ops.pallas import gn_kernel

MICS = geometry.reference_array()
PAIRS = geometry.mic_pairs(3)
C, H = 343.0, 1.2


def _true_tdoas(xys, sphere=True):
    mic3 = jnp.zeros((3, 3), jnp.float32).at[:, :2].set(jnp.asarray(MICS))
    return jax.vmap(lambda q: solver.predicted_tdoas(
        q, mic3, jnp.asarray(PAIRS), C, H, sphere))(xys)


def test_gn_kernel_matches_xla_solver(rng):
    for sphere in (True, False):
        cfg = SolverConfig(iterations=8, constrain_to_sphere=sphere)
        xys = jnp.asarray(
            rng.uniform(-1.2, 1.2, (37, 2)).astype(np.float32))
        taus = _true_tdoas(xys, sphere)
        init = xys * 0.9 + 0.02

        ref_xy, ref_rms = solver.solve_tdoa_batched(
            taus, jnp.asarray(MICS), jnp.asarray(PAIRS),
            speed_of_sound=C, height=H, init_xy=init, cfg=cfg)
        got_xy, got_rms = gn_kernel.solve_tdoa_pallas(
            taus, MICS, PAIRS, speed_of_sound=C, height=H,
            init_xy=init, cfg=cfg, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got_xy), np.asarray(ref_xy), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(got_rms), np.asarray(ref_rms), atol=1e-4)


def test_gn_kernel_4mic(rng):
    mics = geometry.square_array(0.3)
    pairs = geometry.mic_pairs(4)
    cfg = SolverConfig(iterations=6)
    mic3 = jnp.zeros((4, 3), jnp.float32).at[:, :2].set(jnp.asarray(mics))
    xys = jnp.asarray(rng.uniform(-1.0, 1.0, (16, 2)).astype(np.float32))
    taus = jax.vmap(lambda q: solver.predicted_tdoas(
        q, mic3, jnp.asarray(pairs), C, H, True))(xys)
    got_xy, got_rms = gn_kernel.solve_tdoa_pallas(
        taus, mics, pairs, speed_of_sound=C, height=H,
        init_xy=xys * 0.85, cfg=cfg, interpret=True)
    ref_xy, _ = solver.solve_tdoa_batched(
        taus, jnp.asarray(mics), jnp.asarray(pairs),
        speed_of_sound=C, height=H, init_xy=xys * 0.85, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got_xy), np.asarray(ref_xy),
                               atol=2e-4)
