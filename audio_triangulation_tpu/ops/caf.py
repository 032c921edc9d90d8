"""Delay-Doppler estimation: the wideband cross-ambiguity function (CAF).

New capability beyond the reference (whose correlator assumes a static
source, ``src/components/correlations.c:9-18``): a moving source time-SCALES
each mic's signal by (1 - rdot_i / c) in addition to delaying it, so over a
20 ms frame at 10 m/s the cross-correlation peak smears by up to ~30 samples
and plain GCC both biases the TDOA and underestimates the peak.  The CAF
scans a small set of pair time-scale hypotheses alpha = 1 + dv / c:

    A_p(tau, alpha) = sum_t x_i(t) * x_j((t - t0) * alpha + t0)

The TPU-idiomatic form: each scale hypothesis is a precomputed windowed-sinc
resampling MATRIX (one [N, N] matmul per hypothesis — MXU work, no gathers),
after which the standard matmul-DFT GCC machinery produces a correlogram per
(hypothesis, pair); the joint (lag, scale) peak is refined parabolically on
both axes.  Per-pair scales are then a linear system in the source VELOCITY:

    c * (alpha_p - 1) = rdot_j - rdot_i = (u_j - u_i) . v

with u_i the unit vector from the source position toward mic i — so one frame
yields both position (existing solvers) and an instantaneous velocity
estimate (:func:`solve_velocity`), independent of the tracker's
finite-difference velocity.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import PipelineConfig
from . import mxu_fft, xcorr

_HI = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=8)
def _resample_matrices_cached(n: int, scales: tuple, half_width: int):
    """Windowed-sinc time-scale resampling matrices [S, N, N] (float32).

    Row t of matrix s interpolates the input at position
    (t - t0) * scales[s] + t0 with t0 the frame center — centering keeps a
    pure scale change from introducing a spurious mid-frame delay.  The
    kernel is a Hann-windowed sinc of half-width ``half_width`` (exact for
    band-limited signals to ~0.999 Nyquist at half_width=16)."""
    t0 = (n - 1) / 2.0
    t = np.arange(n, dtype=np.float64)
    out = np.zeros((len(scales), n, n), np.float64)
    for s, a in enumerate(scales):
        p = (t - t0) * float(a) + t0  # source positions per output sample
        base = np.floor(p).astype(np.int64)
        frac = p - base
        for k in range(-half_width + 1, half_width + 1):
            idx = base + k
            x = frac - k  # signed distance source-sample -> tap
            w = np.sinc(x) * (0.5 + 0.5 * np.cos(np.pi * x / half_width))
            valid = (idx >= 0) & (idx < n) & (np.abs(x) < half_width)
            rows = t[valid].astype(np.int64)
            out[s, rows, idx[valid]] += w[valid]
    return out.astype(np.float32)


def resample_matrices(n: int, scales, half_width: int = 16) -> np.ndarray:
    """Public wrapper: scales iterable of alpha -> [S, N, N] float32."""
    return _resample_matrices_cached(
        n, tuple(float(a) for a in scales), half_width)


def speed_grid(v_max: float = 8.0, n: int = 9) -> np.ndarray:
    """Symmetric pair relative-speed hypotheses [S] (m/s); the caller maps
    speeds to CAF scales as ``1 + grid / c`` (that is where the speed of
    sound enters — the grid itself is c-independent).  n should be odd so
    alpha=1 (the static case) is always a hypothesis."""
    return np.linspace(-v_max, v_max, n)


def precompute_resample(n: int, v_max: float, n_scales: int,
                        speed_of_sound: float, cfg=None):
    """Device-resident resampling operator for the standard scale set.

    Pass the result as ``resample=`` to the estimators when they run
    inside an enclosing jit: at n_scales=33 and N=1024 the time-domain
    matrices are 138 MB — as a traced ARGUMENT they live in HBM, but
    captured in a closure they embed as an HLO constant (oversize-program
    failures on remote compile; see docs/PERFORMANCE.md on the
    jit-closure footgun).

    With a band-cropping ``cfg`` this returns the SPECTRAL fold instead —
    (cos_rs, msin_rs) [S, N, Fb], the resampling matrices pre-multiplied
    into the band DFT: the scaled spectra become ONE matmul per frame
    (S*N*Fb MACs vs S*N^2 + S*N*Fb, ~3.8x less at Fb ~ 180, and ~3x less
    HBM), numerically identical up to f32 summation order."""
    speeds = speed_grid(v_max, n_scales)
    scales = tuple(1.0 + speeds / speed_of_sound)
    crop = None if cfg is None else mxu_fft.crop_bins(cfg)
    r = resample_matrices(n, scales)
    if crop is None:
        return jnp.asarray(r)
    cos, msin = mxu_fft.dft_matrices_band(n, cfg.fft_length, *crop)
    # cos_rs[s, u, f] = sum_t R[s, t, u] cos[t, f]  (BLAS per scale)
    cos_rs = np.einsum("stu,tf->suf", r.astype(np.float32),
                       cos.astype(np.float32), optimize=True)
    msin_rs = np.einsum("stu,tf->suf", r.astype(np.float32),
                        msin.astype(np.float32), optimize=True)
    return (jnp.asarray(cos_rs), jnp.asarray(msin_rs))


def caf_correlograms(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    pairs: np.ndarray,
    cfg: PipelineConfig,
    scales: np.ndarray,
    resample: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Raw frames [..., M, N] -> CAF correlograms [..., P, S, L].

    For each scale hypothesis the j-channel of every pair is time-scaled by
    the resampling matmul, then cross-correlated against the unscaled
    i-channel through the standard conditioned matmul-DFT GCC path (PHAT /
    band weighting per ``cfg``).  The i/j mix rides the existing machinery:
    original and scaled spectra are concatenated on the mic axis and the
    pair list is offset into the scaled half.

    ``resample`` accepts either the [S, N, N] time-domain matrices or the
    spectral fold (cos_rs, msin_rs) from :func:`precompute_resample` with
    a band-cropping cfg — the latter computes the scaled spectra directly
    (one matmul, no intermediate resampled frames)."""
    from ..models import localizer as localizer_mod

    m, n = frames.shape[-2:]
    x = localizer_mod.condition_frames(frames, window, cfg)
    prec = mxu_fft.dft_prec(cfg)
    crop = mxu_fft.crop_bins(cfg)
    spectral = isinstance(resample, tuple)
    if spectral and crop is None:
        raise ValueError("spectral resample operator requires a "
                         "band-cropping cfg (band_hz + band_crop)")

    if crop is not None:
        re0, im0 = mxu_fft.forward_spectra_band(
            x, cfg.fft_length, *crop, cfg.matmul_dtype, prec)
        syn_c, syn_s = mxu_fft.lag_synthesis_matrices_band(
            cfg.fft_length, cfg.max_shift, *crop, cfg.matmul_dtype)
    else:
        re0, im0 = mxu_fft.forward_spectra(
            x, cfg.fft_length, cfg.matmul_dtype, prec)
        syn_c, syn_s = mxu_fft.masked_synthesis(cfg, cfg.matmul_dtype)

    if spectral:
        cos_rs, msin_rs = resample
        res = jnp.einsum("suf,...mu->s...mf", cos_rs, x, precision=prec,
                         preferred_element_type=jnp.float32)
        ims = jnp.einsum("suf,...mu->s...mf", msin_rs, x, precision=prec,
                         preferred_element_type=jnp.float32)
    else:
        # [S, N, N]; prefer a passed-in (traced) array under an enclosing
        # jit — see precompute_resample
        r = (jnp.asarray(resample_matrices(n, scales))
             if resample is None else resample)
        # scaled channels: xs[s,...,m,t] = sum_u R[s,t,u] x[...,m,u]
        xs = jnp.einsum("stu,...mu->s...mt", r, x, precision=_HI)
        if crop is not None:
            res, ims = mxu_fft.forward_spectra_band(
                xs, cfg.fft_length, *crop, cfg.matmul_dtype, prec)
        else:
            res, ims = mxu_fft.forward_spectra(
                xs, cfg.fft_length, cfg.matmul_dtype, prec)
    s_n = len(scales)
    re_cat = jnp.concatenate(
        [jnp.broadcast_to(re0, (s_n, *re0.shape)), res], axis=-2)
    im_cat = jnp.concatenate(
        [jnp.broadcast_to(im0, (s_n, *im0.shape)), ims], axis=-2)
    pairs2 = np.asarray(pairs).copy()
    pairs2[:, 1] += m  # j-channel from the scaled half
    rr, jj = mxu_fft.cross_power_reim(
        re_cat, im_cat, jnp.asarray(pairs2), phat=cfg.phat,
        phat_eps=cfg.phat_eps, phat_beta=cfg.phat_beta)
    if cfg.band_auto:
        # band_hz='auto': the same per-event coherence-driven band weight
        # the localization path applies (ops/xcorr.auto_band_weight),
        # read off the UNSCALED spectra and broadcast across the scale
        # axis — without it the whitened CAF would run full-band and
        # out-of-band noise would degrade the velocity peak.  'auto'
        # forbids band_crop, so re0/im0 above are already the full-band
        # spectra — no second forward transform needed.
        w = xcorr.auto_band_weight(
            re0 + 1j * im0, jnp.asarray(pairs), cfg)[..., None, :]
        rr = rr * w
        jj = jj * w
    corr = mxu_fft.lag_correlogram(
        rr, jj, jnp.asarray(syn_c), jnp.asarray(syn_s), prec)  # [S,...,P,L]
    return jnp.moveaxis(corr, 0, -2)  # [..., P, S, L]


def _parabolic(sm, s0, sp):
    den = sm - 2.0 * s0 + sp
    d = jnp.where(jnp.abs(den) > 1e-20, 0.5 * (sm - sp) / den, 0.0)
    return jnp.clip(d, -0.5, 0.5)


def delay_doppler_peak(
    caf: jnp.ndarray, max_shift: int, scales: np.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Joint peak of the CAF [..., P, S, L] -> (tdoa_samples [..., P],
    alpha [..., P], peak_value [..., P]), both axes refined parabolically
    (scale refinement assumes a uniform ``scales`` grid)."""
    s_n, l_n = caf.shape[-2:]
    flat = caf.reshape(*caf.shape[:-2], s_n * l_n)
    idx = jnp.argmax(flat, axis=-1)
    si, li = idx // l_n, idx % l_n

    def at(ds, dl):
        s = jnp.clip(si + ds, 0, s_n - 1)
        l = jnp.clip(li + dl, 0, l_n - 1)
        return jnp.take_along_axis(
            flat, (s * l_n + l)[..., None], axis=-1)[..., 0]

    s0 = at(0, 0)
    dl = _parabolic(at(0, -1), s0, at(0, 1))
    ds = _parabolic(at(-1, 0), s0, at(1, 0))
    tdoa = li.astype(jnp.float32) + dl - max_shift
    sc = np.asarray(scales, np.float64)
    step = float(sc[1] - sc[0]) if len(sc) > 1 else 0.0
    alpha = jnp.asarray(sc[0], jnp.float32) + (
        si.astype(jnp.float32) + ds) * jnp.asarray(step, jnp.float32)
    return tdoa, alpha, s0


def estimate_delay_doppler(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    pairs: np.ndarray,
    cfg: PipelineConfig,
    *,
    v_max: float = 8.0,
    n_scales: int = 9,
    resample: jnp.ndarray | None = None,
) -> dict:
    """frames [..., M, N] -> joint TDOA + Doppler per pair.

    Returns 'tdoa_samples' [..., P] (de-smeared: estimated at the best
    scale hypothesis), 'alpha' [..., P] (pair time-scale
    alpha = (1 - rdot_i/c) / (1 - rdot_j/c)), 'pair_rel_speed' [..., P]
    = c * (alpha - 1) ~= rdot_j - rdot_i (m/s), 'caf' [..., P, S, L],
    'peak' [..., P].

    Grid sizing: the waveform's intrinsic Doppler resolution is
    ~c / (f_max * T) (e.g. ~2 m/s for an 18 ms burst reaching 9 kHz), but
    the parabolic sub-grid refinement needs the ridge sampled a few times
    per resolution cell — for velocity solving use n_scales ~ 4 * v_max
    (0.5 m/s steps; measured on-chip: 17 scales -> 1.7 m/s velocity error,
    33 scales -> 0.12 m/s on the same scene).  Doppler-tolerant waveforms
    (linear chirps) put a delay-Doppler RIDGE in the CAF; their alpha is
    ill-determined by construction, not by this estimator."""
    speeds = speed_grid(v_max, n_scales)
    scales = 1.0 + speeds / cfg.speed_of_sound_mps
    caf = caf_correlograms(frames, window, pairs, cfg, scales,
                           resample=resample)
    tdoa, alpha, peak = delay_doppler_peak(caf, cfg.max_shift, scales)
    return {
        "tdoa_samples": tdoa,
        "alpha": alpha,
        "pair_rel_speed": (alpha - 1.0) * cfg.speed_of_sound_mps,
        "caf": caf,
        "peak": peak,
    }


def solve_velocity(
    position: jnp.ndarray,
    pair_rel_speed: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    *,
    damping: float = 1e-6,
    in_plane: bool = False,
) -> jnp.ndarray:
    """Source velocity from per-pair Doppler (batched linear LS).

    Model: pair_rel_speed_p = rdot_j - rdot_i = (u_j - u_i) . v with
    rdot_i = d|x - m_i|/dt and u_i = (x - m_i) / |x - m_i| at the solved
    source position x (position [..., D], D = mic dimension;
    pair_rel_speed [..., P]).
    Returns v [..., D].  Rank needs >= D independent (u_i - u_j) rows —
    any non-degenerate array with >= 3 mics around the source; for
    far-field sources all u_i coincide and the system collapses (the
    damping returns ~0 there, honestly: far-field Doppler carries only
    the radial rate, which a TDOA array cannot localize anyway).

    ``in_plane=True`` solves only the first two velocity components
    (returns [..., 2]) — the right model when the source position comes
    from the planar-grid pipeline (z pinned at the grid height) and the
    mic array is coplanar, where v_z is near-unobservable."""
    dt = position.dtype
    mics = mic_positions.astype(dt)
    diff = position[..., None, :] - mics  # [..., M, D]
    u = diff / jnp.maximum(
        jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-12)
    rows = (jnp.take(u, pairs[:, 1], axis=-2)
            - jnp.take(u, pairs[:, 0], axis=-2))  # [..., P, D]
    if in_plane:
        rows = rows[..., :2]
    ata = jnp.einsum("...pi,...pj->...ij", rows, rows, precision=_HI)
    atb = jnp.einsum("...pi,...p->...i", rows,
                     pair_rel_speed.astype(dt), precision=_HI)
    d = rows.shape[-1]
    return jnp.linalg.solve(
        ata + damping * jnp.eye(d, dtype=dt), atb[..., None])[..., 0]
