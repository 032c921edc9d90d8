"""Pairwise cross-correlation / GCC(-PHAT) TDOA engine.

The reference brute-forces a time-domain int cross-correlation over +-46 lags
(``src/components/correlations.c:4-24``: ~93k MACs per pair), tapers the
correlogram around its peak with a Gaussian (``correlations.c:26-33``) and
EMA-smooths correlograms over time (``correlations.c:38-63``).

The TPU-native hot path computes the same quantity as a batched GCC:
rFFT -> cross-power spectrum (optionally PHAT-whitened) -> irFFT -> lag
extraction.  With zero-padding to >= N + max_shift the FFT path is exactly the
reference's overlap-only linear correlation (up to float rounding); a
bit-exact int64 time-domain path is kept for validation.

All ops are shaped [..., M, N] frames -> [..., P, L] correlograms and are
free of data-dependent Python control flow, so they jit/vmap/shard cleanly.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import PipelineConfig


# ----------------------------------------------------------------------
# Cross-power / GCC path (hot)
# ----------------------------------------------------------------------

def rfft_frames(frames: jnp.ndarray, fft_length: int) -> jnp.ndarray:
    """rFFT of frames [..., N] zero-padded to fft_length."""
    return jnp.fft.rfft(frames, n=fft_length, axis=-1)


def whiten_spectra(spectra: jnp.ndarray, eps: float = 1e-12,
                   beta: float = 1.0) -> jnp.ndarray:
    """Per-mic PHAT whitening: U = X * (|X|^2 + eps^2)^(-beta/2).

    |conj(X_i) X_j| = |X_i| |X_j|, so the pair PHAT weight factorizes into
    per-mic spectral normalization: cross-powers of whitened spectra ARE the
    PHAT-whitened cross-powers (identical limits at |X| >> eps and |X| -> 0).
    This needs O(M F) rsqrts instead of O(P F) — 31x fewer for a 64-mic
    array's 2016 pairs — and removes the rsqrt from the per-pair stage that
    serializes the fused Pallas kernel between its matmuls.

    ``beta`` < 1 is partial (PHAT-beta) whitening: |X|^-beta keeps some
    magnitude weighting, which is more robust for band-limited sources."""
    mag2 = jnp.real(spectra) ** 2 + jnp.imag(spectra) ** 2
    if beta == 1.0:
        return spectra * jax.lax.rsqrt(mag2 + eps * eps)
    return spectra * (mag2 + eps * eps) ** (-0.5 * beta)


def phat_per_mic(n_mics: int) -> bool:
    """Whiten per mic iff it touches less data than per pair: P = M(M-1)/2
    >= M only from M = 3 (a 2-mic array's single pair is cheaper per-pair).
    All correlation paths share this rule so they stay numerically
    consistent for a given geometry."""
    return n_mics >= 3


def cross_power(
    spectra: jnp.ndarray,
    pairs: jnp.ndarray,
    *,
    phat: bool = False,
    phat_eps: float = 1e-12,
    phat_beta: float = 1.0,
) -> jnp.ndarray:
    """Cross-power spectra per mic pair.

    spectra: [..., M, F] complex; pairs: [P, 2] int.
    Returns [..., P, F] complex: conj(X_i) * X_j (optionally PHAT-whitened
    via per-mic factorization, see :func:`whiten_spectra`; ``phat_beta`` < 1
    is partial whitening).

    The conj convention makes irfft(.)[s] == sum_n a[n] * b[n+s], the
    reference's correlation sign convention (correlations.c:9-18): a positive
    best shift means mic j's signal lags mic i's.
    """
    per_mic = phat and phat_per_mic(spectra.shape[-2])
    if per_mic:
        spectra = whiten_spectra(spectra, phat_eps, phat_beta)
    xi = jnp.take(spectra, pairs[:, 0], axis=-2)
    xj = jnp.take(spectra, pairs[:, 1], axis=-2)
    r = jnp.conj(xi) * xj
    if phat and not per_mic:
        # 2-mic arrays: whiten the single pair directly (rsqrt form of
        # R/(|R| + eps): equal limits at |R| >> eps and |R| -> 0).
        # |conj(Xi) Xj|^-beta == (|Xi| |Xj|)^-beta, so per-pair beta
        # whitening equals the per-mic factorized form.
        mag2 = jnp.real(r) ** 2 + jnp.imag(r) ** 2
        if phat_beta == 1.0:
            r = r * jax.lax.rsqrt(mag2 + phat_eps * phat_eps)
        else:
            r = r * (mag2 + phat_eps * phat_eps) ** (-0.5 * phat_beta)
    return r


def band_mask(cfg: PipelineConfig) -> np.ndarray | None:
    """0/1 float32 mask [F] selecting rfft bins inside ``cfg.band_hz``
    (None when no band limit is configured).  Multiplying the cross-power
    (or, equivalently, the lag-synthesis matrix rows) by this mask
    band-limits the correlation — the fix for PHAT's classic failure on
    band-limited sources, where whitening equalizes out-of-band noise bins
    up to the signal's level (new capability; the reference has no
    spectral processing at all).

    ``band_hz='auto'`` also returns None: its mask is data-dependent
    (:func:`auto_band_weight`), not a compile-time constant."""
    if cfg.band_hz is None or cfg.band_auto:
        return None
    f = cfg.fft_length // 2 + 1
    freqs = np.arange(f) * (cfg.sample_rate_hz / cfg.fft_length)
    lo, hi = cfg.band_hz
    return ((freqs >= lo) & (freqs <= hi)).astype(np.float32)


def correlogram_from_cross_power(
    r: jnp.ndarray, fft_length: int, max_shift: int
) -> jnp.ndarray:
    """irFFT the cross-power and extract lags [-K..K] -> [..., 2K+1]."""
    c = jnp.fft.irfft(r, n=fft_length, axis=-1)
    neg = c[..., fft_length - max_shift:]
    pos = c[..., : max_shift + 1]
    return jnp.concatenate([neg, pos], axis=-1)


def freq_smooth(x: jnp.ndarray, half_width: int) -> jnp.ndarray:
    """Moving average over ``2*half_width + 1`` bins along the last
    (frequency) axis, edge bins normalized by their actual support —
    the spectral-density estimator behind the smoothed GCC weightings
    (same role as Welch averaging, but within one frame)."""
    if half_width <= 0:
        return x
    # direct windowed summation (static unroll, 2*half_width adds), NOT
    # cumsum-difference: power spectra span ~1e18 after shift8
    # conditioning, and subtracting two ~1e20 running sums in f32 leaves
    # pure rounding noise at quiet bins — which then poisons coherence,
    # the ml weighting, and auto-band selection exactly where the band
    # decision matters (ops/beamform.extract_mvdr sidesteps the same trap)
    f = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(half_width, half_width)]
    padded = jnp.pad(x, pad)
    total = padded[..., 0:f]
    for o in range(1, 2 * half_width + 1):
        total = total + padded[..., o:o + f]
    counts = np.minimum(np.arange(f) + half_width + 1, f) - np.maximum(
        np.arange(f) - half_width, 0)
    return total / jnp.asarray(counts, x.dtype)


def smoothed_cross_stats(
    spectra: jnp.ndarray,
    pairs: jnp.ndarray,
    half_width: int,
    *,
    r: jnp.ndarray | None = None,
    eps: float = 1e-12,
):
    """Shared smoothed-spectral-estimate block: per-pair (Gaa, Gbb,
    |Gab_s|^2, gamma^2) from per-mic spectra [..., M, F], each [..., P, F].
    ``r`` passes a precomputed raw cross-power conj(Xi)*Xj to avoid
    recomputing it.  gamma^2 is the magnitude-squared coherence in [0, 1].
    The single home of this estimator — gcc_weight's ml branch and
    tdoa_phase_slope both consume it."""
    auto = jnp.real(spectra) ** 2 + jnp.imag(spectra) ** 2  # [..., M, F]
    auto_s = freq_smooth(auto, half_width)
    gaa = jnp.take(auto_s, pairs[:, 0], axis=-2)  # [..., P, F]
    gbb = jnp.take(auto_s, pairs[:, 1], axis=-2)
    if r is None:
        xi = jnp.take(spectra, pairs[:, 0], axis=-2)
        xj = jnp.take(spectra, pairs[:, 1], axis=-2)
        r = jnp.conj(xi) * xj
    gab_s_re = freq_smooth(jnp.real(r), half_width)
    gab_s_im = freq_smooth(jnp.imag(r), half_width)
    gab_mag2 = gab_s_re ** 2 + gab_s_im ** 2
    g2 = jnp.clip(gab_mag2 / (gaa * gbb + eps * eps), 0.0, 1.0)
    return gaa, gbb, gab_mag2, g2


def auto_band_weight(
    spectra: jnp.ndarray,
    pairs: jnp.ndarray,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Per-event data-driven band mask [..., F] for ``band_hz='auto'``.

    The usable band is read off the data itself: the pair-averaged smoothed
    magnitude-squared coherence (:func:`smoothed_cross_stats` — high where
    the mics receive the same signal, low in noise-only bins).  A bin is
    in-band when its mean coherence clears
    ``max(auto_band_rel * peak, auto_band_floor)``; DC and Nyquist are
    always excluded (no phase information).  Events where fewer than
    ``auto_band_min_bins`` bins qualify fall back to the full interior band
    — a flat coherence profile carries no band information, and a hard
    empty mask would zero the correlogram.

    This generalizes the hand-tuned static band (the correlator the
    reference ships is unweighted, ``src/components/correlations.c:4-24``):
    multiply the cross-power by this weight before lag synthesis and the
    PHAT-whitened correlogram ignores out-of-band noise without anyone
    telling it where the source lives.

    ``spectra``: RAW per-mic rfft [..., M, F] (pre-whitening: coherence is
    a ratio, but the smoothing makes whitened estimates noisier).
    """
    _, _, _, g2 = smoothed_cross_stats(
        spectra, pairs, cfg.coherence_bins, eps=cfg.phat_eps)
    return _auto_band_from_g2(jnp.mean(g2, axis=-2), cfg)


def _auto_band_from_g2(g2m: jnp.ndarray, cfg: PipelineConfig) -> jnp.ndarray:
    """Shared threshold tail of the auto band: pair-mean coherence
    [..., F] -> 0/1 weight [..., F] (see :func:`auto_band_weight`)."""
    f = g2m.shape[-1]
    interior = (jnp.arange(f) > 0) & (jnp.arange(f) < f - 1)
    g2i = jnp.where(interior, g2m, 0.0)
    thr = jnp.maximum(
        cfg.auto_band_rel * jnp.max(g2i, axis=-1, keepdims=True),
        cfg.auto_band_floor)
    sel = g2i >= thr
    enough = jnp.sum(sel, axis=-1, keepdims=True) >= cfg.auto_band_min_bins
    return jnp.where(enough, sel, interior).astype(jnp.float32)


def band_pair_subset(pairs: np.ndarray, limit: int = 64) -> np.ndarray:
    """Evenly-strided subsample of the pair list for large-array auto-band
    estimation.  The band decision averages coherence over pairs — a
    statistic, not a per-pair quantity — so 2016-pair arrays need not pay
    O(P F) smoothing to make it: ``limit`` strided pairs (spanning the
    whole enumeration order, hence a spread of baselines) estimate the
    same pair-mean.  Identity for small arrays."""
    pairs = np.asarray(pairs)
    p = pairs.shape[0]
    if p <= limit:
        return pairs
    idx = np.linspace(0, p - 1, limit).round().astype(np.int64)
    return pairs[np.unique(idx)]


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _smooth_matrix(f: int, half_width: int) -> np.ndarray:
    """Banded [F, F] moving-average matrix equal to :func:`freq_smooth`
    (edge bins normalized by actual support): x @ S == freq_smooth(x).
    As a matmul the smoothing rides the MXU instead of 2*hw+1 HBM-bound
    shifted adds — at 64-mic scale (F = 2049, 192 smoothed rows/frame)
    the adds were 5x the entire correlation kernel (r5 5c measurement)."""
    ks = np.arange(f)[:, None]
    fs_ = np.arange(f)[None, :]
    counts = (np.minimum(fs_ + half_width, f - 1)
              - np.maximum(fs_ - half_width, 0) + 1).astype(np.float64)
    return np.where(np.abs(ks - fs_) <= half_width,
                    1.0 / counts, 0.0).astype(np.float32)


def freq_smooth_matmul(x: jnp.ndarray, half_width: int) -> jnp.ndarray:
    """:func:`freq_smooth` as one MXU matmul (HIGHEST precision: the
    smoothed estimates feed the auto-band threshold, where bf16-class
    passes would wiggle coherence near the decision boundary)."""
    if half_width <= 0:
        return x
    s = jnp.asarray(_smooth_matrix(x.shape[-1], half_width))
    return jnp.matmul(x, s, precision=jax.lax.Precision.HIGHEST)


def auto_band_weight_reim(
    re: jnp.ndarray,
    im: jnp.ndarray,
    pairs: np.ndarray,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """:func:`auto_band_weight` on split re/im RAW spectra [..., M, F]
    (the large-array MXU path carries spectra split, ops.mxu_fft) —
    same coherence and threshold math, with the smoothing as MXU matmuls
    (:func:`freq_smooth_matmul`).  Returns [..., F].

    For long frames (F > 1024) the coherence is estimated on a 4x
    frequency-decimated grid and the 0/1 weight nearest-upsampled: the
    statistic is already smoothed over 2*coherence_bins+1 bins, so its
    information bandwidth is far below bin resolution, and full-rate
    estimation at 64-mic/4096-pt scale cost ~2x the entire correlation
    kernel (r5 config-5c measurement).  Short frames are estimated
    exactly (bit-matching :func:`auto_band_weight` up to summation
    order)."""
    pairs = jnp.asarray(pairs)
    f = re.shape[-1]
    d = 4 if f > 1024 else 1
    if d > 1:
        # decimated estimate: same Hz smoothing span (hw/d coarse bins)
        re_d, im_d = re[..., ::d], im[..., ::d]
        hw = max(1, cfg.coherence_bins // d)
    else:
        re_d, im_d = re, im
        hw = cfg.coherence_bins
    auto = re_d * re_d + im_d * im_d
    auto_s = freq_smooth_matmul(auto, hw)
    gaa = jnp.take(auto_s, pairs[:, 0], axis=-2)
    gbb = jnp.take(auto_s, pairs[:, 1], axis=-2)
    ri = jnp.take(re_d, pairs[:, 0], axis=-2)
    ii = jnp.take(im_d, pairs[:, 0], axis=-2)
    rj = jnp.take(re_d, pairs[:, 1], axis=-2)
    ij = jnp.take(im_d, pairs[:, 1], axis=-2)
    rr_s = freq_smooth_matmul(ri * rj + ii * ij, hw)
    jj_s = freq_smooth_matmul(ri * ij - ii * rj, hw)
    eps = cfg.phat_eps
    g2 = jnp.clip((rr_s * rr_s + jj_s * jj_s)
                  / (gaa * gbb + eps * eps), 0.0, 1.0)
    if d == 1:
        return _auto_band_from_g2(jnp.mean(g2, axis=-2), cfg)
    # coarse threshold decision, nearest-upsampled; min-bins counted in
    # coarse bins; DC and Nyquist re-excluded on the fine grid
    cfg_d = dataclasses.replace(
        cfg, auto_band_min_bins=max(1, cfg.auto_band_min_bins // d))
    w_d = _auto_band_from_g2(jnp.mean(g2, axis=-2), cfg_d)
    w = jnp.repeat(w_d, d, axis=-1)[..., :f]
    fine = jnp.arange(f)
    return jnp.where((fine > 0) & (fine < f - 1), w, 0.0)


def gcc_weight(
    spectra: jnp.ndarray,
    pairs: jnp.ndarray,
    weighting: str,
    *,
    half_width: int = 16,
    eps: float = 1e-12,
    r: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Classic GCC frequency weights psi [..., P, F] (Knapp & Carter 1976)
    from per-mic spectra [..., M, F], using frequency-smoothed spectral
    estimates (see :func:`freq_smooth`):

    - 'roth': psi = 1/Gaa — deconvolves mic a's spectrum (the GCC that
      estimates the a->b impulse response).
    - 'scot': psi = 1/sqrt(Gaa Gbb) — symmetric pre-whitening; equals PHAT
      when the spectra are raw per-frame periodograms (|Gab| = sqrt(Gaa
      Gbb) there), distinct once smoothed.
    - 'ml': psi = g2/(|Gab| (1 - g2)), g2 = |Gab|^2/(Gaa Gbb) the magnitude-
      squared coherence — the Hannan-Thomson approximate-ML weighting that
      up-weights bins where the mics actually cohere (reverb/noise
      robustness).

    ``r`` optionally passes the precomputed raw cross-power so the 'ml'
    branch doesn't redo conj(Xi)*Xj.
    """
    if weighting in ("roth", "scot"):
        auto = jnp.real(spectra) ** 2 + jnp.imag(spectra) ** 2
        auto_s = freq_smooth(auto, half_width)
        gaa = jnp.take(auto_s, pairs[:, 0], axis=-2)  # [..., P, F]
        if weighting == "roth":
            return 1.0 / (gaa + eps)
        gbb = jnp.take(auto_s, pairs[:, 1], axis=-2)
        return jax.lax.rsqrt(gaa * gbb + eps * eps)
    if weighting == "ml":
        _, _, gab_mag2, g2 = smoothed_cross_stats(
            spectra, pairs, half_width, r=r, eps=eps)
        g2 = jnp.minimum(g2, 1.0 - 1e-4)
        gab_mag = jnp.sqrt(gab_mag2)
        return g2 / ((gab_mag + eps) * (1.0 - g2))
    raise ValueError(f"unknown GCC weighting {weighting!r}")


def restrict_bins_to_band(bins: np.ndarray,
                          cfg: PipelineConfig) -> np.ndarray:
    """Filter rfft bin indices to ``cfg.band_hz`` (identity when no band is
    configured).  Raises when the band excludes every given bin — silently
    falling back to the full spectrum would un-band the estimator."""
    if cfg.band_hz is None:
        return bins
    if cfg.band_auto:
        raise ValueError(
            "band_hz='auto' selects bins per event at runtime; the "
            "subspace/frequency-domain estimators need a static bin set — "
            "pass an explicit (lo_hz, hi_hz) band")
    freqs = bins * (cfg.sample_rate_hz / cfg.fft_length)
    lo, hi = cfg.band_hz
    keep = (freqs >= lo) & (freqs <= hi)
    if not keep.any():
        raise ValueError(
            f"band_hz={cfg.band_hz} covers none of the {bins.size} "
            f"candidate bins (stride too coarse or band too narrow)")
    return bins[keep]


def xcorr_fft(
    frames: jnp.ndarray,
    pairs: jnp.ndarray,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """GCC correlograms [..., P, 2K+1] from frames [..., M, N]."""
    spectra = rfft_frames(frames, cfg.fft_length)
    weighting = cfg.effective_weighting
    if weighting in ("roth", "scot", "ml"):
        r = cross_power(spectra, pairs, phat=False)
        psi = gcc_weight(spectra, pairs, weighting,
                         half_width=cfg.coherence_bins, eps=cfg.phat_eps,
                         r=r)
        r = r * psi
    else:
        r = cross_power(spectra, pairs, phat=weighting == "phat",
                        phat_eps=cfg.phat_eps, phat_beta=cfg.phat_beta)
    mask = band_mask(cfg)
    if mask is not None:
        r = r * mask
    elif cfg.band_auto:
        r = r * auto_band_weight(spectra, pairs, cfg)[..., None, :]
    return correlogram_from_cross_power(r, cfg.fft_length, cfg.max_shift)


# ----------------------------------------------------------------------
# Time-domain paths (validation / parity)
# ----------------------------------------------------------------------

def _lag_window_indices(n: int, max_shift: int) -> np.ndarray:
    """Static gather index matrix [2K+1, N]: row l reads b_padded[l + arange(N)],
    where b is padded with K zeros on each side."""
    l = np.arange(2 * max_shift + 1)[:, None]
    return (l + np.arange(n)[None, :]).astype(np.int32)


def xcorr_time(
    frames: jnp.ndarray,
    pairs: jnp.ndarray,
    max_shift: int,
) -> jnp.ndarray:
    """Float time-domain correlation over the overlap, [..., P, 2K+1].

    Same math as correlations.c:9-18, vectorized: out-of-overlap b samples
    contribute zero via padding, so corr[l] = sum_n a[n] * b_pad[n + l].
    """
    a = jnp.take(frames, pairs[:, 0], axis=-2)
    b = jnp.take(frames, pairs[:, 1], axis=-2)
    n = frames.shape[-1]
    bp = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(max_shift, max_shift)])
    idx = jnp.asarray(_lag_window_indices(n, max_shift))
    windows = bp[..., idx]  # [..., P, 2K+1, N]
    return jnp.einsum("...n,...ln->...l", a, windows)


def xcorr_time_int(
    frames: jnp.ndarray,
    pairs: jnp.ndarray,
    max_shift: int,
) -> jnp.ndarray:
    """Bit-exact int64 correlogram (the reference's exact accumulation:
    int16 x int16 products summed in int64, correlations.c:16)."""
    a = jnp.take(frames, pairs[:, 0], axis=-2).astype(jnp.int64)
    b = jnp.take(frames, pairs[:, 1], axis=-2).astype(jnp.int64)
    n = frames.shape[-1]
    bp = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(max_shift, max_shift)])
    idx = jnp.asarray(_lag_window_indices(n, max_shift))
    windows = bp[..., idx]
    return jnp.sum(a[..., None, :] * windows, axis=-1)


# ----------------------------------------------------------------------
# Peak handling
# ----------------------------------------------------------------------

def best_lag(correlograms: jnp.ndarray, max_shift: int) -> jnp.ndarray:
    """Integer best shift in [-K, K] per correlogram [..., 2K+1].

    jnp.argmax returns the first maximum, matching the reference's strict
    ``>`` scan (correlations.c:20-23)."""
    return jnp.argmax(correlograms, axis=-1).astype(jnp.int32) - max_shift


def peak_taper(
    correlograms: jnp.ndarray,
    max_shift: int,
    denom: float = 36.0,
    shifts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Gaussian taper around the (arg)max: c[s] *= exp(-(s - s_best)^2/denom),
    the float analogue of correlations.c:26-33."""
    if shifts is None:
        shifts = best_lag(correlograms, max_shift)
    lags = jnp.arange(-max_shift, max_shift + 1, dtype=correlograms.dtype)
    d = lags - shifts[..., None].astype(correlograms.dtype)
    return correlograms * jnp.exp(-(d * d) / denom)


def peak_taper_int(
    correlograms: jnp.ndarray,
    max_shift: int,
    denom: float = 36.0,
) -> jnp.ndarray:
    """Bit-exact integer taper (correlations.c:26-33): the C computes
    ``float scale = exp(-diff/36.f)`` — float32 argument, double exp,
    narrowed to float32 — then multiplies the int64 bin in float32 and
    truncates on assignment.  The scale table over all possible ``s - s0``
    diffs is precomputed on host with that exact conversion chain; the
    kernel just gathers and multiplies."""
    shifts = best_lag(correlograms, max_shift)
    # diff = s - s_best ranges over [-2K, 2K]
    diffs = np.arange(-2 * max_shift, 2 * max_shift + 1, dtype=np.int64)
    args = np.float32(-(diffs * diffs)) / np.float32(denom)
    table = jnp.asarray(np.exp(args.astype(np.float64)).astype(np.float32))
    lags = jnp.arange(-max_shift, max_shift + 1, dtype=jnp.int32)
    d = lags - shifts[..., None]  # [..., L] in [-2K, 2K]
    scale = table[d + 2 * max_shift]
    v = correlograms.astype(jnp.float32) * scale
    return jnp.trunc(v).astype(jnp.int64)


def subsample_peak(
    correlograms: jnp.ndarray, max_shift: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Parabolic sub-sample peak interpolation (new capability; the reference
    stops at integer shifts).

    Returns (tdoa_samples [...], peak_value [...]): fractional lag of the
    correlogram maximum, in samples."""
    n_lags = correlograms.shape[-1]
    c = correlograms
    p = jnp.argmax(c, axis=-1)
    peak = jnp.max(c, axis=-1)
    pc = jnp.clip(p, 1, n_lags - 2)
    # neighbor values via masked reductions, NOT take_along_axis: a TPU
    # gather of one value per [B, P] index costs ~50x a masked pass over
    # the lag axis (measured 22 ms vs 0.5 ms at [256, 2016, 149])
    lane = jnp.arange(n_lags)
    cm = jnp.sum(jnp.where(lane == (pc - 1)[..., None], c, 0), axis=-1)
    c0 = jnp.sum(jnp.where(lane == pc[..., None], c, 0), axis=-1)
    cp = jnp.sum(jnp.where(lane == (pc + 1)[..., None], c, 0), axis=-1)
    den = cm - 2.0 * c0 + cp
    delta = jnp.where(
        jnp.abs(den) > 1e-20, 0.5 * (cm - cp) / den, 0.0
    )
    # only interpolate interior peaks
    delta = jnp.where((p >= 1) & (p <= n_lags - 2), delta, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    return (p - max_shift) + delta, peak


def tdoa_phase_slope(
    spectra: jnp.ndarray,
    pairs: jnp.ndarray,
    coarse_lag: jnp.ndarray,
    *,
    fft_length: int,
    half_width: int = 16,
    eps: float = 1e-12,
    weight_mask: np.ndarray | jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sub-sample TDOA by coherence-weighted phase-slope regression
    (new capability; the reference stops at integer shifts,
    correlations.c:20-23).

    A pure delay d puts phase -2*pi*k*d/N on cross-power bin k (the
    convention of :func:`cross_power`: positive lag = mic j lags mic i).
    Starting from the integer ``coarse_lag`` d0 of the correlogram argmax,
    each iteration derotates the cross-power by the current estimate so the
    residual phase is slope -2*pi*k*delta/N with |delta| < 1 — inside
    (-pi, pi) for every bin, no unwrapping needed — and takes the
    weighted-least-squares slope.  Bins are weighted by |R|^2 * gamma^2
    (raw cross-power magnitude-squared times the smoothed magnitude-squared
    coherence): SNR^2-proportional weighting with incoherent bins gated
    off, which measured best across delay/seed/noise sweeps (pure-coherence
    ML weights lose because per-frame coherence estimates saturate).

    Honest accounting: on wideband bursts this beats 3-point parabolic
    interpolation by ~30% at high SNR (true linear delays) and loses
    slightly at low SNR, where both are noise-limited rather than
    interpolation-limited — hence parabolic remains the default
    (``PipelineConfig(subsample_method='parabolic')``).

    spectra: [..., M, F]; pairs [P, 2]; coarse_lag [..., P] (samples).
    Returns fractional TDOA [..., P] in samples.
    """
    xi = jnp.take(spectra, pairs[:, 0], axis=-2)  # [..., P, F]
    xj = jnp.take(spectra, pairs[:, 1], axis=-2)
    r = jnp.conj(xi) * xj
    f = spectra.shape[-1]
    k = jnp.arange(f, dtype=jnp.float32)

    _, _, _, g2 = smoothed_cross_stats(
        spectra, pairs, half_width, r=r, eps=eps)
    mag2 = jnp.real(r) ** 2 + jnp.imag(r) ** 2
    w = mag2 * g2
    # Nyquist's phase is sign-only (real bin) — exclude it from the fit
    w = w * (k < (f - 1))
    if weight_mask is not None:  # e.g. band_mask(cfg)
        w = w * jnp.asarray(weight_mask)
    den = jnp.sum(w * k * k, axis=-1)

    d = coarse_lag.astype(jnp.float32)
    for _ in range(2):  # Gauss-Newton on the wrapped-phase model
        ang = (2.0 * jnp.pi / fft_length) * k * d[..., None]
        rr = r * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        phi = jnp.arctan2(jnp.imag(rr), jnp.real(rr))  # [..., P, F]
        num = jnp.sum(w * k * phi, axis=-1)
        delta = -(fft_length / (2.0 * jnp.pi)) * num / jnp.maximum(den, eps)
        d = d + jnp.clip(delta, -1.0, 1.0)
    return d


def peak_confidence(
    correlograms: jnp.ndarray, max_shift: int, guard: int = 3
) -> jnp.ndarray:
    """Peak-to-sidelobe ratio [..., ] per correlogram: peak / max outside a
    +-guard window around it (new capability; the reference's only quality
    gate is the shift-sum heuristic, sample_compute.h:124-134).

    ~1 means no dominant peak (noise).  Unwhitened correlograms of real
    events score >2; PHAT-whitened ones have elevated sidelobes, so their
    scale is compressed (~1.3+ indicates a detection)."""
    n_lags = correlograms.shape[-1]
    p = jnp.argmax(correlograms, axis=-1)
    peak = jnp.max(correlograms, axis=-1)  # = c[p], gather-free
    lags = jnp.arange(n_lags)
    outside = jnp.abs(lags - p[..., None]) > guard
    side = jnp.max(
        jnp.where(outside, correlograms, -jnp.inf), axis=-1)
    eps = 1e-20
    return jnp.abs(peak) / jnp.maximum(jnp.abs(side), eps)


# ----------------------------------------------------------------------
# Temporal smoothing
# ----------------------------------------------------------------------

def ema_decay(dt_s: jnp.ndarray, tau_s: float) -> jnp.ndarray:
    """decay = 1 - exp(-dt / tau) (correlations.c:42-43)."""
    return 1.0 - jnp.exp(-dt_s / tau_s)


def ema_update(
    state: jnp.ndarray, new: jnp.ndarray, decay: jnp.ndarray
) -> jnp.ndarray:
    """state + (new - state) * decay — donate ``state`` under jit for an
    in-place HBM update (the XLA analogue of the reference's mutate-in-place
    correlations_average)."""
    return state + (new - state) * decay


def ema_update_int(
    state: jnp.ndarray, new: jnp.ndarray, dt_s: float, tau_s: float = 0.5
) -> jnp.ndarray:
    """Bit-exact integer EMA: float32 delta and sum truncated to int64
    (correlations.c:45-49).  ``dt_s`` is a host scalar; the decay factor is
    computed in float64 then narrowed to float32, matching the C
    double-exp-to-float chain."""
    arg = np.float64(-np.float32(dt_s) / np.float32(tau_s))
    decay = jnp.float32(np.float64(1.0) - np.exp(arg))
    delta = (new - state).astype(jnp.float32) * decay
    v = state.astype(jnp.float32) + delta
    return jnp.trunc(v).astype(jnp.int64)
