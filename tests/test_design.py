"""Array design: CRLB evaluation and gradient-based mic placement."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core import design, geometry
from audio_triangulation_tpu.core.config import PipelineConfig

PTS = np.stack(
    np.meshgrid(np.linspace(-1.5, 1.5, 9), np.linspace(-1.5, 1.5, 9)),
    -1).reshape(-1, 2).astype(np.float32)


def test_crlb_matches_finite_difference_fisher():
    """The closed-form CRLB agrees with a NumPy finite-difference Fisher
    information at a probe point."""
    mics = geometry.square_array(0.3)
    pairs = geometry.mic_pairs(4)
    cfg = PipelineConfig()
    pt = np.array([0.6, 0.4], np.float32)
    sigma = 2e-6

    def tau_np(p):
        src = np.array([[p[0], p[1], 1.2]], np.float64)
        return geometry.expected_tdoas(
            src, mics.astype(np.float64), pairs,
            cfg.speed_of_sound_mps)[0]

    eps = 1e-5
    g = np.stack([
        (tau_np(pt + np.array([eps, 0])) - tau_np(pt - np.array([eps, 0])))
        / (2 * eps),
        (tau_np(pt + np.array([0, eps])) - tau_np(pt - np.array([0, eps])))
        / (2 * eps)], axis=-1)  # [P, 2]
    ref = sigma ** 2 * np.linalg.inv(g.T @ g)

    got = np.asarray(design.crlb(
        jnp.asarray(mics), jnp.asarray(pt)[None], sigma_tau_s=sigma,
        pipeline=cfg, height=1.2))[0]
    np.testing.assert_allclose(got, ref, rtol=1e-3)


def test_crlb_shrinks_with_aperture():
    big = design.crlb_rms_m(
        jnp.asarray(geometry.square_array(0.3)), jnp.asarray(PTS),
        sigma_tau_s=2e-6)
    small = design.crlb_rms_m(
        jnp.asarray(geometry.square_array(0.1)), jnp.asarray(PTS),
        sigma_tau_s=2e-6)
    assert float(jnp.mean(big)) < float(jnp.mean(small))


def test_optimize_array_improves_and_respects_constraints():
    rng = np.random.default_rng(0)
    init = rng.uniform(-0.05, 0.05, (4, 2)).astype(np.float32)
    opt, hist = design.optimize_array(
        init, PTS, aperture_m=0.15, min_separation_m=0.05, steps=300)

    assert hist[-1] < 0.35 * hist[0], (hist[0], hist[-1])
    radii = np.linalg.norm(opt, axis=-1)
    assert np.all(radii <= 0.15 + 1e-3), radii
    i, j = np.triu_indices(4, k=1)
    sep = np.linalg.norm(opt[i] - opt[j], axis=-1)
    assert np.all(sep >= 0.05 - 1e-3), sep
    # within striking distance of the equal-aperture square reference
    sq = float(jnp.mean(design.crlb_rms_m(
        jnp.asarray(geometry.square_array(0.15 * np.sqrt(2))),
        jnp.asarray(PTS), sigma_tau_s=2e-6)))
    assert hist[-1] < 1.5 * sq, (hist[-1], sq)
