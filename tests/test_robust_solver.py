"""Robust (IRLS Huber/Cauchy) TDOA solving: multipath-outlier resistance.

New capability — the reference has no solver at all (its localization is
the SRP grid argmax, src/components/vga/vga_heatmap.h:95-159); this layers
M-estimation on the batched Gauss-Newton solve.
"""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.core.config import SolverConfig
from audio_triangulation_tpu.ops import solver
from audio_triangulation_tpu.utils import synth

MICS = geometry.circular_array(8, 0.25)
PAIRS = geometry.mic_pairs(8)
C = 343.0
H = 1.2


def _true_tdoas(plane_xy):
    xy = jnp.asarray(plane_xy, jnp.float32)[None]
    mic3 = jnp.zeros((8, 3), jnp.float32).at[:, :2].set(
        jnp.asarray(MICS, jnp.float32))
    return solver.predicted_tdoas(
        xy, mic3, jnp.asarray(PAIRS), C, H, True)  # [1, P] seconds


def _solve(tdoas, init, cfg):
    return solver.solve_tdoa_batched(
        tdoas, jnp.asarray(MICS, jnp.float32), jnp.asarray(PAIRS),
        speed_of_sound=C, height=H,
        init_xy=jnp.asarray(init, jnp.float32)[None], cfg=cfg)


def test_huber_rejects_outlier_pairs():
    true_xy = np.array([0.6, 0.4], np.float32)
    tdoas = np.asarray(_true_tdoas(true_xy))
    # corrupt 4 of 28 pairs with large multipath-style errors (+2 ms ~ 69 cm)
    bad = tdoas.copy()
    for p, err in ((0, 2.0e-3), (7, -1.5e-3), (13, 2.5e-3), (20, 1.8e-3)):
        bad[0, p] += err
    init = np.array([0.3, 0.2], np.float32)  # coarse grid-like init

    xy_plain, _ = _solve(jnp.asarray(bad), init, SolverConfig())
    xy_rob, rms_rob = _solve(
        jnp.asarray(bad), init, SolverConfig(robust="huber"))
    err_plain = np.linalg.norm(np.asarray(xy_plain)[0] - true_xy)
    err_rob = np.linalg.norm(np.asarray(xy_rob)[0] - true_xy)
    assert err_plain > 0.05, err_plain  # outliers really do hurt plain LS
    assert err_rob < 0.02, (err_rob, err_plain)


def test_cauchy_rejects_outlier_pairs():
    true_xy = np.array([-0.4, 0.7], np.float32)
    tdoas = np.asarray(_true_tdoas(true_xy))
    bad = tdoas.copy()
    bad[0, 3] += 2.2e-3
    bad[0, 17] -= 1.7e-3
    bad[0, 24] += 2.8e-3
    init = np.array([-0.2, 0.4], np.float32)
    xy_rob, _ = _solve(
        jnp.asarray(bad), init, SolverConfig(robust="cauchy"))
    err = np.linalg.norm(np.asarray(xy_rob)[0] - true_xy)
    assert err < 0.02, err


def test_robust_matches_plain_when_clean():
    true_xy = np.array([0.5, -0.3], np.float32)
    tdoas = _true_tdoas(true_xy)
    init = np.array([0.4, -0.2], np.float32)
    xy_p, _ = _solve(tdoas, init, SolverConfig())
    xy_h, _ = _solve(tdoas, init, SolverConfig(robust="huber"))
    np.testing.assert_allclose(
        np.asarray(xy_h), np.asarray(xy_p), atol=2e-3)


def test_fixed_scale_and_batched():
    """Fixed robust scale works, and a batch of scenes solves in one call."""
    xs = np.array([[0.6, 0.4], [-0.4, 0.7], [0.1, -0.8]], np.float32)
    tdoas = np.concatenate([np.asarray(_true_tdoas(x)) for x in xs])  # [3, P]
    tdoas[0, 5] += 2.0e-3  # outlier only in scene 0
    cfg = SolverConfig(robust="huber", robust_scale_m=0.05)
    xy, rms = solver.solve_tdoa_batched(
        jnp.asarray(tdoas), jnp.asarray(MICS, jnp.float32),
        jnp.asarray(PAIRS), speed_of_sound=C, height=H,
        init_xy=jnp.asarray(xs * 0.7), cfg=cfg)
    errs = np.linalg.norm(np.asarray(xy) - xs, axis=-1)
    assert (errs < 0.02).all(), errs


def test_localizer_e2e_with_robust_solver():
    """Robust solving threads through Localizer.create via SolverConfig."""
    mics = geometry.reference_array()
    plane = np.array([0.8, 0.5])
    src = np.array([0.8, 0.5, 1.2])
    src = src * (1.2 / np.linalg.norm(src))
    frames = jnp.asarray(
        synth.synth_scene(src, mics, noise_rms=0.01, seed=2), jnp.float32)
    loc = Localizer.create(
        mics, PipelineConfig(), solver=SolverConfig(robust="huber"))
    out = loc(frames)
    xy = np.asarray(out["xy"])[0]
    assert np.linalg.norm(xy - plane) < 0.05, xy
