"""Beamformed source-audio extraction: after localization says WHERE, these
ops recover WHAT — an enhanced single-channel waveform of the source at a
given position, from the same multi-mic frames.

New capability with no reference equivalent (the firmware only localizes).
TPU-shaped: steering is a phase ramp (elementwise complex multiply) on
rFFT spectra, summation is a mean over the mic axis, and the MVDR variant's
per-bin M x M solves batch over (frame, frequency) with one einsum each —
no data-dependent control flow anywhere.

- :func:`source_delays` — per-mic relative propagation delays for a source
  position under the same geometry as ``ops.solver`` / ``utils.synth``.
- :func:`extract_das` — delay-and-sum: exact fractional-delay alignment via
  linear-phase rFFT (zero-padded 2x so the shift is linear, not circular),
  mean over mics.  White-noise SNR gain up to 10 log10(M) dB.
- :func:`extract_mvdr` — MVDR (Capon) filter-and-sum: frames are aligned
  first (so the target manifold is the all-ones vector at every
  frequency), then the spatial covariance is estimated from sub-block
  snapshots of the aligned frame (same estimator as
  ``ops.srp_freq.mvdr_spectrum``) and the distortionless weight
  w = R^-1 1 / (1^H R^-1 1) is applied per band.  Suppresses directional
  interferers that plain delay-and-sum only attenuates.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.config import PipelineConfig


def source_delays(
    pos: jnp.ndarray,            # [..., 2 or 3] source position (meters)
    mic_positions: np.ndarray,   # [M, 2 or 3]
    cfg: PipelineConfig,
    *,
    height: float | None = None,
    constrain_sphere: bool = True,
) -> jnp.ndarray:
    """Per-mic propagation delays [..., M] (seconds), centered so the mean
    delay is zero (only relative alignment matters).  2-D positions are
    lifted with the SAME geometric model as the solver (the radius-height
    sphere by default, ops.solver.lift_to_model), so positions from
    ``Localizer`` outputs are consistent."""
    from . import solver as solver_ops

    pos = jnp.asarray(pos, jnp.float32)
    if pos.shape[-1] == 2:
        h = 1.2 if height is None else float(height)
        pos = solver_ops.lift_to_model(pos, h, constrain_sphere)
    mics = np.asarray(mic_positions, np.float32)
    mic3 = np.zeros((mics.shape[0], 3), np.float32)
    mic3[:, : mics.shape[1]] = mics
    d = jnp.linalg.norm(pos[..., None, :] - mic3, axis=-1)  # [..., M]
    d = d - jnp.mean(d, axis=-1, keepdims=True)
    return d / cfg.speed_of_sound_mps


def _aligned_spectra(frames, delays, cfg):
    """rFFT at 2N (linear shift) with per-mic advance e^{+j 2 pi f tau}."""
    n = frames.shape[-1]
    l2 = 2 * n
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=l2, axis=-1)
    f_hz = jnp.arange(spec.shape[-1], dtype=jnp.float32) * (
        cfg.sample_rate_hz / l2)
    # x_m(t) = s(t - tau_m)  =>  align with e^{+j 2 pi f tau_m}
    phase = jnp.exp(1j * (2.0 * jnp.pi) * f_hz * delays[..., None])
    return spec * phase.astype(spec.dtype), l2


def extract_das(
    frames: jnp.ndarray,   # [..., M, N]
    delays: jnp.ndarray,   # [..., M] seconds (from source_delays)
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Delay-and-sum extraction -> [..., N] enhanced waveform."""
    n = frames.shape[-1]
    aligned, l2 = _aligned_spectra(frames, delays, cfg)
    y = jnp.mean(aligned, axis=-2)
    return jnp.fft.irfft(y, n=l2, axis=-1)[..., :n]


def extract_mvdr(
    frames: jnp.ndarray,   # [..., M, N]
    delays: jnp.ndarray,   # [..., M] seconds
    cfg: PipelineConfig,
    *,
    smooth_bins: int = 15,
    diagonal_loading: float = 1e-2,
) -> jnp.ndarray:
    """MVDR filter-and-sum extraction -> [..., N].

    Frames are delay-aligned first (exact per-bin phase shift), so the
    target manifold is the all-ones vector at EVERY frequency and the
    distortionless constraint w^H 1 = 1 passes the target bit-perfectly.
    The spatial covariance is built by FREQUENCY SMOOTHING — a moving
    average of the aligned per-bin outer products over ``2 smooth_bins + 1``
    neighboring bins (the standard single-snapshot decorrelation trick:
    alignment keeps the target direction constant across bins while the
    interferer's relative phase rotates, so smoothing builds rank for the
    interference subspace without touching the target).  Weights
    w_k = R_k^-1 1 / (1^H R_k^-1 1) are then per full-resolution bin, so
    the null tracks the interferer exactly in frequency."""
    m, n = frames.shape[-2], frames.shape[-1]
    x = frames.astype(jnp.float32)
    aligned, l2 = _aligned_spectra(x, delays, cfg)   # [..., M, F2]
    xk = jnp.moveaxis(aligned, -2, -1)               # [..., F2, M]

    # moving-average covariance over bins: direct windowed summation (a
    # cumsum-difference would catastrophically cancel in f32 at quiet bins)
    outer = xk[..., :, None] * jnp.conj(xk)[..., None, :]  # [..., F2, M, M]
    f2 = xk.shape[-2]
    w_half = int(smooth_bins)
    pad = [(0, 0)] * (outer.ndim - 3) + [(w_half, w_half), (0, 0), (0, 0)]
    padded = jnp.pad(outer, pad)
    r = padded[..., 0:f2, :, :]
    for o in range(1, 2 * w_half + 1):  # static unroll, ~2 smooth_bins adds
        r = r + padded[..., o:o + f2, :, :]
    k = np.arange(f2)
    counts = (np.minimum(k + w_half, f2 - 1)
              - np.maximum(k - w_half, 0) + 1).astype(np.float32)
    r = r / counts[..., None, None]                  # [..., F2, M, M]

    tr = jnp.einsum("...fmm->...f", jnp.real(r)) / m
    eye = jnp.eye(m, dtype=r.dtype)
    r = r + (diagonal_loading * tr + 1e-20)[..., None, None] * eye

    from . import linalg as cxlinalg

    ones = jnp.ones((m,), r.dtype)
    rinv1 = cxlinalg.complex_solve(r, jnp.broadcast_to(
        ones, r.shape[:-1])[..., None])[..., 0]      # [..., F2, M]
    den = jnp.real(jnp.sum(rinv1, axis=-1))          # 1^T R^-1 1
    den = jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)[..., None]
    w = rinv1 / den                                  # [..., F2, M]

    y = jnp.sum(jnp.conj(w) * xk, axis=-1)           # [..., F2]
    return jnp.fft.irfft(y, n=l2, axis=-1)[..., :n]
