"""Array design: CRLB evaluation and gradient-based mic placement.

New capability with no reference equivalent (the firmware's geometry is
fixed by three measured inter-mic distances, ``src/components/constants.h:
17-19`` / ``microphones.c:9-61``): given a coverage region, evaluate how
well an array CAN localize there — the Cramer-Rao lower bound of the TDOA
model — and optimize mic positions against it.

The bound reuses the pipeline's own measurement model
(``ops/solver.predicted_tdoas``): for a source at x, the pairwise-TDOA
Jacobian G = dtau/dx [P, 2] gives the Fisher information
I = G^T G / sigma_tau^2 under independent per-pair timing noise — the same
approximation the runtime covariance (``ops/solver.solution_covariance``)
reports, so designed-for and achieved uncertainty speak the same units.

Everything is jax-differentiable through the geometry, so placement is a
few hundred optax steps on the mic coordinates with soft constraints
(aperture radius, minimum separation) — the same pattern as array
self-calibration (``models/calibration.py``), pointed at design instead of
estimation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import PipelineConfig
from . import geometry
from ..ops import solver as solver_ops


def tdoa_jacobian(
    xy: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    *,
    speed_of_sound: float,
    height: float,
    constrain_sphere: bool = False,
) -> jnp.ndarray:
    """d tau / d xy [..., P, 2] (seconds per meter) at source points
    [..., 2], differentiable in both the points and the mic positions."""

    def tau(pt):
        return solver_ops.predicted_tdoas(
            pt, _mic3(mic_positions, pt.dtype), pairs,
            speed_of_sound, height, constrain_sphere)

    flat = xy.reshape(-1, 2)
    jac = jax.vmap(jax.jacfwd(tau))(flat)  # [B, P, 2]
    return jac.reshape(*xy.shape[:-1], jac.shape[-2], 2)


def crlb(
    mic_positions: jnp.ndarray,
    points_xy: jnp.ndarray,
    *,
    sigma_tau_s: float,
    pipeline: PipelineConfig = PipelineConfig(),
    height: float = 1.2,
    constrain_sphere: bool = False,
    ridge: float = 1e-12,
) -> jnp.ndarray:
    """Position-error lower bound [..., 2, 2] (meters^2) at each coverage
    point, for per-pair TDOA noise ``sigma_tau_s`` (seconds RMS).

    CRLB = sigma_tau^2 (G^T G)^{-1}; closed-form 2x2 inverse so the whole
    map is one vectorized expression (no linalg.inv batching limits)."""
    pairs = jnp.asarray(
        geometry.mic_pairs(int(mic_positions.shape[0])))
    g = tdoa_jacobian(
        points_xy, mic_positions, pairs,
        speed_of_sound=pipeline.speed_of_sound_mps, height=height,
        constrain_sphere=constrain_sphere)  # [..., P, 2]
    a = jnp.einsum("...pi,...pj->...ij", g, g)  # [..., 2, 2]
    a00 = a[..., 0, 0] + ridge
    a11 = a[..., 1, 1] + ridge
    a01 = a[..., 0, 1]
    det = jnp.maximum(a00 * a11 - a01 * a01, 1e-30)
    inv = jnp.stack([
        jnp.stack([a11, -a01], axis=-1),
        jnp.stack([-a01, a00], axis=-1)], axis=-2) / det[..., None, None]
    return (sigma_tau_s ** 2) * inv


def crlb_rms_m(mic_positions, points_xy, **kwargs) -> jnp.ndarray:
    """sqrt(trace CRLB) [...] — the best achievable position RMS (meters)
    at each point.  The design objective and the map to plot."""
    c = crlb(mic_positions, points_xy, **kwargs)
    return jnp.sqrt(c[..., 0, 0] + c[..., 1, 1])


def optimize_array(
    init_positions: np.ndarray,
    coverage_xy: np.ndarray,
    *,
    sigma_tau_s: float = 2e-6,
    pipeline: PipelineConfig = PipelineConfig(),
    height: float = 1.2,
    aperture_m: float = 0.25,
    min_separation_m: float = 0.05,
    steps: int = 300,
    learning_rate: float = 3e-3,
    penalty: float = 100.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Gradient-descend mic positions to minimize the mean best-achievable
    RMS over the coverage points.

    Soft constraints: every mic inside ``aperture_m`` of the array center,
    pairwise separation at least ``min_separation_m`` (quadratic hinge
    penalties).  Returns (optimized [M, 2] positions re-centered on their
    centroid, per-step objective history [steps]).
    """
    pts = jnp.asarray(coverage_xy, jnp.float32)
    mics0 = jnp.asarray(init_positions, jnp.float32)
    m = int(mics0.shape[0])
    pair_i, pair_j = np.triu_indices(m, k=1)

    def objective(mics):
        return jnp.mean(crlb_rms_m(
            mics, pts, sigma_tau_s=sigma_tau_s, pipeline=pipeline,
            height=height))

    def loss(mics):
        centered = mics - jnp.mean(mics, axis=0)
        obj = objective(centered)
        r = jnp.linalg.norm(centered, axis=-1)
        pen_ap = jnp.sum(jax.nn.relu(r - aperture_m) ** 2)
        sep = jnp.linalg.norm(
            centered[pair_i] - centered[pair_j], axis=-1)
        pen_sep = jnp.sum(jax.nn.relu(min_separation_m - sep) ** 2)
        return obj + penalty * (pen_ap + pen_sep), obj

    opt = optax.adam(learning_rate)

    @jax.jit
    def step(mics, opt_state):
        (_, obj), grads = jax.value_and_grad(loss, has_aux=True)(mics)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(mics, updates), opt_state, obj

    mics = mics0
    opt_state = opt.init(mics)
    history = []
    for _ in range(steps):
        mics, opt_state, obj = step(mics, opt_state)
        history.append(float(obj))
    mics = np.asarray(mics - jnp.mean(mics, axis=0))
    return mics, np.asarray(history, np.float32)


def _mic3(mic_positions: jnp.ndarray, dtype) -> jnp.ndarray:
    m = mic_positions.shape[0]
    out = jnp.zeros((m, 3), dtype)
    return out.at[:, : mic_positions.shape[1]].set(
        mic_positions.astype(dtype))
