"""Closed-form / iterative TDOA source solvers.

New capability: the reference's only "solver" is the SRP grid argmax
(``src/components/vga/vga_heatmap.h``).  Here the grid peak seeds a damped
Gauss-Newton refinement of the hyperbolic TDOA equations

    r_p(x) = (||x - m_j|| - ||x - m_i||) - c * tau_p

over a source constrained either to the z = h plane or to the radius-h sphere
around the array center (the reference's geometric model,
vga_heatmap.h:57-60).  Fixed iteration count, forward-mode Jacobian, written
unbatched — callers ``jax.vmap`` over frames (see models.localizer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SolverConfig


def lift_to_model(xy: jnp.ndarray, height: float,
                  constrain_sphere: bool) -> jnp.ndarray:
    """Lift planar coords [..., 2] to the 3-D source model.

    'sphere' scales (x, y, h) onto the radius-``height`` sphere — exactly the
    reference's equidistant projection (vga_heatmap.h:57-60)."""
    x, y = xy[..., 0], xy[..., 1]
    raw = jnp.stack([x, y, jnp.full_like(x, height)], axis=-1)
    if constrain_sphere:
        r = jnp.linalg.norm(raw, axis=-1, keepdims=True)
        return raw * (height / jnp.maximum(r, 1e-12))
    return raw


def predicted_tdoas(
    xy: jnp.ndarray,
    mic_pos3: jnp.ndarray,
    pairs: jnp.ndarray,
    speed_of_sound: float,
    height: float,
    constrain_sphere: bool = True,
) -> jnp.ndarray:
    """Model TDOAs [..., P] (seconds) for planar source coords [..., 2]."""
    p3 = lift_to_model(xy, height, constrain_sphere)  # [..., 3]
    diff = p3[..., None, :] - mic_pos3  # [..., M, 3]
    d = jnp.linalg.norm(diff, axis=-1)  # [..., M]
    dt = (jnp.take(d, pairs[:, 1], axis=-1)
          - jnp.take(d, pairs[:, 0], axis=-1))
    return dt / speed_of_sound


def solve_tdoa(
    tdoas: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    *,
    speed_of_sound: float,
    height: float,
    init_xy: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    cfg: SolverConfig = SolverConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Damped Gauss-Newton TDOA solve (unbatched; vmap over frames).

    tdoas: [P] measured TDOAs in seconds; init_xy: [2] (typically the SRP
    grid peak).  Returns (xy [2], rms residual scalar in meters)."""
    mic_pos3 = jnp.zeros((mic_positions.shape[0], 3), dtype=init_xy.dtype)
    mic_pos3 = mic_pos3.at[:, : mic_positions.shape[1]].set(mic_positions)
    c = speed_of_sound

    def residual(xy):
        pred = predicted_tdoas(
            xy, mic_pos3, pairs, c, height, cfg.constrain_to_sphere
        )
        r = (pred - tdoas) * c  # meters
        if weights is not None:
            r = r * weights
        return r

    def gn_step(_, xy):
        r = residual(xy)  # [P]
        jac = jax.jacfwd(residual)(xy)  # [P, 2]
        jtj = jac.T @ jac
        jtr = jac.T @ r
        damp = cfg.damping * jnp.eye(2, dtype=xy.dtype)
        delta = jnp.linalg.solve(jtj + damp, jtr)
        return (xy - delta).astype(xy.dtype)

    xy = jax.lax.fori_loop(0, cfg.iterations, gn_step, init_xy)
    r = residual(xy)
    rms = jnp.sqrt(jnp.mean(r * r))
    return xy, rms


def farfield_bearing(
    tdoas: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    speed_of_sound: float,
) -> jnp.ndarray:
    """Linear far-field direction estimate (new capability, for DoA configs).

    Least-squares unit vector u from (m_j - m_i) . u ~= -c * tau_p.
    Works batched: tdoas [..., P] -> bearings [..., 2] (unit)."""
    d = (jnp.take(mic_positions, pairs[:, 1], axis=0)
         - jnp.take(mic_positions, pairs[:, 0], axis=0))  # [P, 2]
    rhs = -speed_of_sound * tdoas  # [..., P]
    ata = d.T @ d  # [2, 2]
    atb = jnp.einsum("pi,...p->...i", d, rhs)
    u = jnp.linalg.solve(
        ata + 1e-9 * jnp.eye(2, dtype=d.dtype), atb[..., None]
    )[..., 0]
    norm = jnp.linalg.norm(u, axis=-1, keepdims=True)
    return u / jnp.maximum(norm, 1e-12)
