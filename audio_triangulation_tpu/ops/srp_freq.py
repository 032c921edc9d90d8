"""Frequency-domain SRP steering: sub-sample-exact grid scoring.

The lag-domain SRP (ops/srp.py, the reference's scheme) rounds each cell's
expected TDOA to an integer lag (vga_heatmap.h:72-87) — cells along a source
ray alias to the same lag signature, which quantizes range/height.  Steering
in the frequency domain scores each cell with the EXACT fractional delay:

    score(g) = sum_p sum_f Re( R_p[f] * e^{+j 2 pi f tau_p(g) fs / L} )

As matmuls: score = Re(R) @ C + Im(R) @ S with steering matrices
C/S[f, g] = w_f cos/sin(2 pi f tau fs / L) stacked over pairs — two MXU
contractions of [B, P*Fk] x [P*Fk, G].  A frequency-bin stride trades
compute for aliasing margin (every k-th bin; fine for smooth correlograms).

~15x the FLOPs of the lag-domain matmul at full bin resolution, so this is
the accuracy-mode scorer; the lag-domain form remains the throughput mode.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import GridConfig, PipelineConfig
from ..core import geometry


def freq_steering_matrices(
    grid: GridConfig,
    mic_positions: np.ndarray,
    pairs: np.ndarray,
    pipeline: PipelineConfig,
    *,
    bin_stride: int = 4,
    dtype=np.float32,
):
    """Steering matrices (C, S) of shape [P * Fk, G] and the kept bin
    indices [Fk], where Fk = ceil(F / bin_stride)."""
    pts = geometry.grid_points(grid)  # [H, W, 3]
    tau = geometry.expected_tdoas(
        pts, mic_positions, pairs, pipeline.speed_of_sound_mps)  # [H, W, P]
    g = grid.num_cells
    p = pairs.shape[0]
    tau = tau.reshape(g, p).T  # [P, G] seconds

    l = pipeline.fft_length
    f_full = l // 2 + 1
    bins = np.arange(0, f_full, bin_stride)
    # Hermitian weights folded in (1 at DC/Nyquist, else 2), times the
    # stride so the truncated sum stays an unbiased estimate of the full one
    w = np.full(f_full, 2.0)
    w[0] = 1.0
    if l % 2 == 0:
        w[-1] = 1.0
    w = (w * bin_stride / l)[bins]  # [Fk]

    # phase = +2 pi f * tau * fs / L  (tau in seconds; bin f is f*fs/L Hz)
    ang = (2.0 * np.pi * bins[None, :, None] * pipeline.sample_rate_hz / l
           * tau[:, None, :])  # [P, Fk, G]
    c = (w[None, :, None] * np.cos(ang)).astype(dtype)
    s = (-w[None, :, None] * np.sin(ang)).astype(dtype)
    fk = bins.shape[0]
    return c.reshape(p * fk, g), s.reshape(p * fk, g), bins


def srp_scores_freq(
    rr: jnp.ndarray,
    jj: jnp.ndarray,
    steer_c: jnp.ndarray,
    steer_s: jnp.ndarray,
    bins: np.ndarray,
) -> jnp.ndarray:
    """Scores [..., G] from cross-power (re, im) [..., P, F].

    score = Re(R) @ C + Im(R) @ S with R subsampled at ``bins``."""
    rr_k = rr[..., bins]
    jj_k = jj[..., bins]
    *lead, p, fk = rr_k.shape
    flat_r = rr_k.reshape(*lead, p * fk)
    flat_j = jj_k.reshape(*lead, p * fk)
    return (jnp.matmul(flat_r, steer_c, preferred_element_type=jnp.float32)
            + jnp.matmul(flat_j, steer_s,
                         preferred_element_type=jnp.float32))


def mic_steering_vectors(
    grid: GridConfig,
    mic_positions: np.ndarray,
    pipeline: PipelineConfig,
    *,
    bin_stride: int = 8,
):
    """Per-mic complex steering vectors a[Fk, M, G] for every grid cell:
    a_m(f, g) = exp(-j 2 pi f fs/L * tau_m(g)), tau_m the absolute
    propagation delay from cell g to mic m (relative to the array center so
    phases stay small).  Returns (a, bins, weights[Fk])."""
    pts = geometry.grid_points(grid)  # [H, W, 3]
    mic3 = np.zeros((mic_positions.shape[0], 3), np.float64)
    mic3[:, : mic_positions.shape[1]] = mic_positions
    d = np.linalg.norm(
        pts.reshape(-1, 1, 3) - mic3[None], axis=-1)  # [G, M]
    d = d - d.mean(axis=1, keepdims=True)  # center: relative delays only
    tau = (d / pipeline.speed_of_sound_mps).T  # [M, G] seconds

    l = pipeline.fft_length
    f_full = l // 2 + 1
    bins = np.arange(1, f_full - 1, bin_stride)  # skip DC and Nyquist
    w = np.full(bins.shape[0], 1.0 / bins.shape[0])
    ang = (-2.0 * np.pi * pipeline.sample_rate_hz / l
           * bins[:, None, None] * tau[None])  # [Fk, M, G]
    a = np.exp(1j * ang).astype(np.complex64)
    return a, bins, w.astype(np.float32)


def mvdr_spectrum(
    re: jnp.ndarray,
    im: jnp.ndarray,
    steering: jnp.ndarray,   # [Fk, M, G] complex64
    bins: np.ndarray,
    weights: np.ndarray,     # [Fk]
    *,
    diagonal_loading: float = 1e-2,
) -> jnp.ndarray:
    """MVDR (Capon) pseudo-spectrum over the grid (new capability; the
    reference has no adaptive beamforming).

        P(g) = sum_f w_f / (a_g^H R_f^-1 a_g)

    with R_f the spatial covariance estimated from the snapshot axis of the
    spectra (re, im) [S, M, F] and diagonally loaded for robustness.  All
    per-frequency M x M solves run batched (M is small); the quadratic form
    is one einsum.  Super-resolves sources the delay-and-sum SRP merges."""
    x = (re + 1j * im)[..., bins]          # [S, M, Fk]
    x = jnp.moveaxis(x, -1, 0)             # [Fk, S, M]
    s_count = x.shape[1]
    r = jnp.einsum("fsm,fsn->fmn", x, jnp.conj(x)) / s_count  # [Fk, M, M]
    # scale-invariant diagonal loading
    tr = jnp.einsum("fmm->f", jnp.real(r)) / r.shape[-1]
    eye = jnp.eye(r.shape[-1], dtype=r.dtype)
    r = r + (diagonal_loading * tr)[:, None, None] * eye
    from . import linalg as cxlinalg

    # complex solve via the real block embedding (the TPU backend has no
    # complex LU: "UNIMPLEMENTED" on complex jnp.linalg.solve)
    ra = cxlinalg.complex_solve(r, steering)  # [Fk, M, G]
    den = jnp.real(jnp.einsum("fmg,fmg->fg", jnp.conj(steering), ra))
    den = jnp.maximum(den, 1e-12)
    return jnp.sum(jnp.asarray(weights)[:, None] / den, axis=0)  # [G]


def localize_mvdr(
    frames: jnp.ndarray,
    mic_positions: np.ndarray,
    grid: GridConfig,
    cfg: PipelineConfig,
    *,
    bin_stride: int = 8,
    diagonal_loading: float = 1e-2,
) -> dict:
    """Snapshot frames [S, M, N] -> MVDR grid spectrum + peak.

    S snapshots (e.g. consecutive captures) estimate the spatial covariance;
    more snapshots -> better interference rejection."""
    from . import mxu_fft, srp as srp_lag
    from . import window as window_ops
    from ..models import localizer as localizer_mod

    mic_positions = np.asarray(mic_positions, np.float32)
    steer, bins, w = mic_steering_vectors(
        grid, mic_positions, cfg, bin_stride=bin_stride)
    win = jnp.asarray(window_ops.window_for(cfg))

    @jax.jit
    def run(fr):
        x = localizer_mod.condition_frames(fr, win, cfg)
        re, im = mxu_fft.forward_spectra(x, cfg.fft_length, cfg.matmul_dtype)
        scores = mvdr_spectrum(
            re, im, jnp.asarray(steer), bins, w,
            diagonal_loading=diagonal_loading)
        xy = srp_lag.grid_peak_xy(
            scores[None], (grid.height, grid.width),
            (grid.half_cells_x, grid.half_cells_y), grid.cells_per_m,
            refine=True)[0]
        return {"scores": scores, "xy_grid": xy}

    return run(frames)


def localize_freq(
    frames: jnp.ndarray,
    mic_positions: np.ndarray,
    grid: GridConfig,
    cfg: PipelineConfig,
    *,
    bin_stride: int = 4,
) -> dict:
    """Convenience: frames [..., M, N] -> frequency-steered SRP scores and
    grid peak (sub-sample-exact steering; use for accuracy-critical runs)."""
    from . import mxu_fft, srp as srp_lag
    from ..models import localizer as localizer_mod

    mic_positions = np.asarray(mic_positions, np.float32)
    pairs = geometry.mic_pairs(mic_positions.shape[0])
    steer_c, steer_s, bins = freq_steering_matrices(
        grid, mic_positions, pairs, cfg, bin_stride=bin_stride)

    from . import window as window_ops

    win = jnp.asarray(window_ops.window_for(cfg))
    params = localizer_mod.LocalizerParams(
        mic_positions=jnp.asarray(mic_positions),
        pairs=jnp.asarray(pairs),
        window=win, lut_flat=jnp.zeros((pairs.shape[0], 1), jnp.int32),
        onehot=None, score_bias=None)

    @jax.jit
    def run(fr):
        x = localizer_mod.condition_frames(fr, win, cfg)
        re, im = mxu_fft.forward_spectra(x, cfg.fft_length, cfg.matmul_dtype)
        rr, jj = mxu_fft.cross_power_reim(
            re, im, params.pairs, phat=cfg.phat, phat_eps=cfg.phat_eps)
        scores = srp_scores_freq(
            rr, jj, jnp.asarray(steer_c), jnp.asarray(steer_s), bins)
        xy = srp_lag.grid_peak_xy(
            scores, (grid.height, grid.width),
            (grid.half_cells_x, grid.half_cells_y), grid.cells_per_m,
            refine=True)
        return {"scores": scores, "xy_grid": xy}

    return run(frames)
