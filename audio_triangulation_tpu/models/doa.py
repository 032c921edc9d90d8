"""Far-field direction-of-arrival (DoA) model family.

New capability beyond the reference (whose near-field sphere-cap grid IS its
only spatial model, ``src/components/vga/vga_heatmap.h``): for arrays
observing distant sources, steer over an azimuth circle instead of a planar
grid.  Each azimuth a has expected pair TDOA ``tau_p(a) = (m_j - m_i) . u(a)
/ c`` with u(a) the unit bearing; scoring reuses the SRP machinery (one-hot
lag matmul on the MXU), and the peak is refined by parabolic interpolation
plus a least-squares bearing solve.

Flagship use: the 8-mic circular array SRP-PHAT configuration
(BASELINE.json config 4).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import PipelineConfig
from ..core import geometry
from ..ops import solver as solver_ops, srp, window as window_ops, xcorr
from . import localizer as localizer_mod


def azimuth_lag_lut(
    mic_positions: np.ndarray,
    pairs: np.ndarray,
    pipeline: PipelineConfig,
    n_azimuths: int,
) -> np.ndarray:
    """Integer lag LUT [P, A] over an azimuth circle."""
    ang = 2 * np.pi * np.arange(n_azimuths) / n_azimuths
    u = np.stack([np.cos(ang), np.sin(ang)], axis=-1)  # [A, 2]
    d = (mic_positions[pairs[:, 1]] - mic_positions[pairs[:, 0]])  # [P, 2]
    # source at bearing u: wave arrives from u, so the mic closer along u
    # hears it earlier; delay_j - delay_i = -(m_j - m_i).u / c
    tau = -(d @ u.T) / pipeline.speed_of_sound_mps  # [P, A] seconds
    v = tau * pipeline.sample_rate_hz
    shifts = np.trunc(v + np.copysign(0.5, v)).astype(np.int32)
    k = pipeline.max_shift
    return np.clip(shifts, -k, k) + k


def merge_pairs(mic_positions: np.ndarray, pairs: np.ndarray,
                tol: float = 1e-6):
    """SMP pair merging (Grondin et al., arXiv:2203.14409): pairs whose
    displacement vectors m_j - m_i are identical share the same far-field
    TDOA at EVERY bearing, so their cross-power spectra can be summed
    into one correlogram before lag synthesis — exact for azimuth SRP
    scores when the peak taper is off (the score is then linear in the
    correlograms; with ``taper_enabled=True`` the taper acts on the merged
    correlogram instead of per-pair, so scores differ slightly).  Regular
    arrays collapse hard: an 8-mic line's 28 pairs have 7 unique
    displacements.

    Returns (merge [P, P'] 0/1 float32, disp [P', 2] the unique
    displacements)."""
    d = (mic_positions[pairs[:, 1]]
         - mic_positions[pairs[:, 0]]).astype(np.float64)  # [P, 2]
    uniq: list = []
    group = np.empty(d.shape[0], np.int64)
    for p, v in enumerate(d):
        for gi, u in enumerate(uniq):
            if np.linalg.norm(v - u) <= tol:
                group[p] = gi
                break
        else:
            uniq.append(v)
            group[p] = len(uniq) - 1
    merge = np.zeros((d.shape[0], len(uniq)), np.float32)
    merge[np.arange(d.shape[0]), group] = 1.0
    return merge, np.asarray(uniq, np.float32)


@dataclasses.dataclass(frozen=True)
class DoaEstimator:
    """Jitted azimuth SRP estimator.

    With ``smp=True`` (create kwarg), same-displacement pairs are merged
    before lag synthesis (see :func:`merge_pairs`) — fewer correlogram
    rows and a smaller steering matmul, exact for the azimuth scores."""

    pipeline: PipelineConfig
    n_azimuths: int
    params: localizer_mod.LocalizerParams
    onehot_az: jnp.ndarray  # [P*L, A] (P = merged count under smp)
    merge: jnp.ndarray | None = None  # [P_raw, P'] when smp
    disp: np.ndarray | None = None  # [P', 2] unique displacements

    @classmethod
    def create(
        cls,
        mic_positions: np.ndarray,
        pipeline: PipelineConfig = PipelineConfig(phat=True),
        n_azimuths: int = 360,
        *,
        smp: bool = False,
    ) -> "DoaEstimator":
        mic_positions = np.asarray(mic_positions, np.float32)
        if pipeline.max_shift_samples is None:
            # same auto-widen as Doa3dEstimator/VolumeLocalizer: the lag
            # window must cover the array aperture, or azimuth_lag_lut's
            # clip and the correlogram window both saturate on the long
            # baselines and the bearing is silently biased (the default
            # +-46 assumes the reference's 0.2 m triangle)
            pipeline = dataclasses.replace(
                pipeline,
                max_shift_samples=geometry.max_lag_for_array(
                    mic_positions, pipeline))
        pairs = geometry.mic_pairs(mic_positions.shape[0])
        merge = disp = None
        if smp:
            # the merged path computes cross-power directly on the MXU
            # spectra; it implements none/phat weighting only
            if pipeline.effective_weighting not in ("none", "phat"):
                raise ValueError(
                    "smp=True supports weighting none/phat only "
                    f"(got {pipeline.effective_weighting!r})")
            if pipeline.xcorr_mode != "mxu":
                raise ValueError(
                    "smp=True requires xcorr_mode='mxu' "
                    f"(got {pipeline.xcorr_mode!r})")
            merge, disp = merge_pairs(mic_positions, pairs)
            # pseudo geometry: one pair (origin -> displacement) per group
            lut_mics, lut_pairs = _pseudo_geometry(disp)
        else:
            lut_mics, lut_pairs = mic_positions, pairs
        lut = azimuth_lag_lut(lut_mics, lut_pairs, pipeline, n_azimuths)
        num_lags = pipeline.num_lags
        n_rows = lut.shape[0]
        onehot = np.zeros((n_rows, num_lags, n_azimuths), np.float32)
        pp = np.repeat(np.arange(n_rows), n_azimuths)
        onehot[pp, lut.ravel(), np.tile(np.arange(n_azimuths),
                                        n_rows)] = 1.0
        win = window_ops.window_for(pipeline)
        params = localizer_mod.LocalizerParams(
            mic_positions=jnp.asarray(mic_positions),
            pairs=jnp.asarray(pairs),
            window=jnp.asarray(win),
            lut_flat=jnp.asarray(lut),
            onehot=None,
            score_bias=None,
        )
        return cls(
            pipeline=pipeline, n_azimuths=n_azimuths, params=params,
            onehot_az=jnp.asarray(
                onehot.reshape(n_rows * num_lags, n_azimuths)),
            merge=None if merge is None else jnp.asarray(merge),
            disp=disp,
        )

    def __call__(self, frames: jnp.ndarray) -> dict:
        if self.merge is None:
            return self._jitted(self.params, self.onehot_az, frames)
        return self._jitted_smp(self.params, self.onehot_az, self.merge,
                                frames)

    @functools.cached_property
    def _jitted(self):
        pairs_static = tuple(
            tuple(int(v) for v in row) for row in np.asarray(self.params.pairs))
        return jax.jit(functools.partial(
            estimate_doa, cfg=self.pipeline, n_azimuths=self.n_azimuths,
            pairs_static=pairs_static))

    @functools.cached_property
    def _jitted_smp(self):
        mics_p, pairs_p = _pseudo_geometry(self.disp)
        return jax.jit(functools.partial(
            estimate_doa_smp, cfg=self.pipeline,
            n_azimuths=self.n_azimuths,
            pseudo_mics=tuple(map(tuple, mics_p.tolist())),
            pseudo_pairs=tuple(map(tuple, pairs_p.tolist()))))


def _pseudo_geometry(disp: np.ndarray):
    """(mics [P'+1, 2], pairs [P', 2]): one origin->displacement pair per
    merged group, so the azimuth LUT and bearing solve see the shared
    baselines."""
    mics = np.concatenate(
        [np.zeros((1, 2), np.float32), np.asarray(disp, np.float32)])
    pairs = np.stack([np.zeros(disp.shape[0], np.int32),
                      np.arange(1, disp.shape[0] + 1, dtype=np.int32)], -1)
    return mics, pairs


def _refine_azimuth(scores: jnp.ndarray, n_azimuths: int) -> jnp.ndarray:
    """Circular 3-point parabolic refinement of the azimuth-score argmax
    -> bearing in degrees [...]."""
    a = jnp.argmax(scores, axis=-1)
    sm = jnp.take_along_axis(
        scores, ((a - 1) % n_azimuths)[..., None], axis=-1)[..., 0]
    s0 = jnp.take_along_axis(scores, a[..., None], axis=-1)[..., 0]
    sp = jnp.take_along_axis(
        scores, ((a + 1) % n_azimuths)[..., None], axis=-1)[..., 0]
    den = sm - 2.0 * s0 + sp
    delta = jnp.where(jnp.abs(den) > 1e-20, 0.5 * (sm - sp) / den, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    return ((a + delta) * (360.0 / n_azimuths)) % 360.0


def _doa_result(corr, scores, shifts, mics, pairs, cfg, n_azimuths):
    """Shared tail: refined azimuth + per-pair sub-sample TDOAs + the
    least-squares far-field bearing."""
    tdoa_samples, _ = xcorr.subsample_peak(corr, cfg.max_shift)
    bearing = solver_ops.farfield_bearing(
        tdoa_samples / cfg.sample_rate_hz,
        mics, pairs, cfg.speed_of_sound_mps)
    return {
        "azimuth_deg": _refine_azimuth(scores, n_azimuths),
        "scores": scores,
        "bearing": bearing,
        "tdoa_samples": tdoa_samples,
        "best_shift": shifts,
    }


def estimate_doa(
    params: localizer_mod.LocalizerParams,
    onehot_az: jnp.ndarray,
    frames: jnp.ndarray,
    *,
    cfg: PipelineConfig,
    n_azimuths: int,
    pairs_static: tuple | None = None,
) -> dict:
    """frames [..., M, N] -> azimuth estimates.

    Returns 'azimuth_deg' [...], 'scores' [..., A], 'bearing' [..., 2],
    'tdoa_samples' [..., P]."""
    k = cfg.max_shift
    corr = localizer_mod._conditioned_correlograms(
        params, frames, cfg, pairs_static)
    shifts = xcorr.best_lag(corr, k)
    corr_t = (xcorr.peak_taper(corr, k, cfg.taper_denom, shifts)
              if cfg.taper_enabled else corr)
    scores = srp.srp_scores_matmul(corr_t, onehot_az)  # [..., A]
    return _doa_result(corr, scores, shifts, params.mic_positions,
                       params.pairs, cfg, n_azimuths)


def estimate_doa_smp(
    params: localizer_mod.LocalizerParams,
    onehot_az: jnp.ndarray,
    merge: jnp.ndarray,
    frames: jnp.ndarray,
    *,
    cfg: PipelineConfig,
    n_azimuths: int,
    pseudo_mics: tuple,
    pseudo_pairs: tuple,
) -> dict:
    """SMP-PHAT azimuth estimation (merged same-displacement pairs,
    arXiv:2203.14409): cross-power spectra are summed within displacement
    groups BEFORE lag synthesis — with ``taper_enabled=False`` the azimuth
    scores are identical to the unmerged path (the score is linear in the
    correlograms), with P' <= P correlogram rows in the synthesis and
    steering matmuls.  With the peak taper ON the equivalence is only
    approximate: the taper is a nonlinear (argmax-centered) window applied
    to the MERGED correlogram here but per-pair in the unmerged path, so
    scores can differ near secondary peaks.

    'tdoa_samples' / 'best_shift' / 'bearing' are PER MERGED GROUP (the
    shared baseline), against the pseudo origin->displacement geometry."""
    from ..ops import mxu_fft

    k = cfg.max_shift
    prec = mxu_fft.dft_prec(cfg)
    crop = mxu_fft.crop_bins(cfg)
    x = localizer_mod.condition_frames(frames, params.window, cfg)
    if crop is not None:
        re, im = mxu_fft.forward_spectra_band(
            x, cfg.fft_length, *crop, cfg.matmul_dtype, prec)
        syn_c, syn_s = mxu_fft.lag_synthesis_matrices_band(
            cfg.fft_length, k, *crop, cfg.matmul_dtype)
    else:
        re, im = mxu_fft.forward_spectra(
            x, cfg.fft_length, cfg.matmul_dtype, prec)
        syn_c, syn_s = mxu_fft.masked_synthesis(cfg, cfg.matmul_dtype)
    rr, jj = mxu_fft.cross_power_reim(
        re, im, params.pairs, phat=cfg.phat, phat_eps=cfg.phat_eps,
        phat_beta=cfg.phat_beta)
    if cfg.band_auto:
        # band_hz='auto' must weight the merged path too (the unmerged
        # path gets it via xcorr_fft): 'auto' forbids band_crop, so
        # re/im are the full-band spectra; the weight is pair-averaged,
        # hence merge-invariant — applied before group summation
        w = xcorr.auto_band_weight(
            re + 1j * im, params.pairs, cfg)[..., None, :]
        rr = rr * w
        jj = jj * w
    rr = jnp.einsum("pq,...pf->...qf", merge, rr)  # [..., P', F]
    jj = jnp.einsum("pq,...pf->...qf", merge, jj)
    corr = mxu_fft.lag_correlogram(
        rr, jj, jnp.asarray(syn_c), jnp.asarray(syn_s), prec)

    shifts = xcorr.best_lag(corr, k)
    corr_t = (xcorr.peak_taper(corr, k, cfg.taper_denom, shifts)
              if cfg.taper_enabled else corr)
    scores = srp.srp_scores_matmul(corr_t, onehot_az)  # [..., A]
    mics_p = jnp.asarray(np.asarray(pseudo_mics, np.float32))
    pairs_p = jnp.asarray(np.asarray(pseudo_pairs, np.int32))
    return _doa_result(corr, scores, shifts, mics_p, pairs_p, cfg,
                       n_azimuths)


# ----------------------------------------------------------------------
# Subspace (MUSIC) DoA — azimuth-domain analogue of
# ops.srp_freq.localize_music (new capability; no reference equivalent)


def azimuth_steering_vectors(
    mic_positions: np.ndarray,
    pipeline: PipelineConfig,
    n_azimuths: int,
    *,
    bin_stride: int = 8,
):
    """Far-field per-mic steering a[Fk, M, A] over the bearing circle:
    tau_m(az) = -(m . u(az)) / c, centered over mics.  Returns
    (a complex64, bins, weights) matching ops.srp_freq's contract."""
    mics = np.asarray(mic_positions, np.float64)[:, :2]
    ang = 2 * np.pi * np.arange(n_azimuths) / n_azimuths
    u = np.stack([np.cos(ang), np.sin(ang)], axis=-1)     # [A, 2]
    tau = -(mics @ u.T) / pipeline.speed_of_sound_mps     # [M, A] seconds
    tau = tau - tau.mean(axis=0, keepdims=True)

    l = pipeline.fft_length
    f_full = l // 2 + 1
    bins = np.arange(1, f_full - 1, bin_stride)
    w = np.full(bins.shape[0], 1.0 / bins.shape[0], np.float32)
    phase = (-2.0 * np.pi * pipeline.sample_rate_hz / l
             * bins[:, None, None] * tau[None])           # [Fk, M, A]
    return np.exp(1j * phase).astype(np.complex64), bins, w


def circular_peaks(scores: np.ndarray, n_peaks: int,
                   min_separation: int) -> np.ndarray:
    """Indices of the top ``n_peaks`` local maxima on a circular axis,
    greedily NMS-suppressed within +-min_separation bins."""
    s = np.asarray(scores, np.float64).copy()
    a = s.shape[-1]
    out = []
    for _ in range(n_peaks):
        i = int(np.argmax(s))
        out.append(i)
        idx = (np.arange(i - min_separation, i + min_separation + 1)) % a
        s[idx] = -np.inf
    return np.asarray(out)


def estimate_doa_music(
    frames: jnp.ndarray,
    mic_positions: np.ndarray,
    cfg: PipelineConfig,
    *,
    n_azimuths: int = 360,
    n_sources: int | str = 1,
    bin_stride: int = 8,
    diagonal_loading: float = 0.0,
    min_separation_deg: float = 10.0,
) -> dict:
    """Snapshot frames [S, M, N] -> wideband MUSIC azimuth spectrum and the
    ``n_sources`` strongest bearings (degrees).  ``n_sources='auto'`` runs
    MDL model-order selection first (srp_freq.estimate_n_sources).

    Subspace super-resolution on the bearing circle: resolves sources
    closer than the array beamwidth where the lag-domain azimuth SRP
    (:class:`DoaEstimator`) merges them.  S snapshots estimate the spatial
    covariance; dispatched as split jitted stages like
    ops.srp_freq.localize_music (same TPU compile-time reasoning)."""
    from ..ops import mxu_fft, srp_freq

    n_estimated = None
    if n_sources == "auto":
        n_estimated = srp_freq.estimate_n_sources(
            frames, cfg, bin_stride=bin_stride,
            diagonal_loading=max(diagonal_loading, 1e-3))
        n_sources = max(1, n_estimated)  # MUSIC needs >= 1-dim subspace
    mic_positions = np.asarray(mic_positions, np.float32)
    steer, bins, w = azimuth_steering_vectors(
        mic_positions, cfg, n_azimuths, bin_stride=bin_stride)
    win = jnp.asarray(window_ops.window_for(cfg))

    @jax.jit
    def spectra(fr):
        x = localizer_mod.condition_frames(fr, win, cfg)
        return mxu_fft.forward_spectra(x, cfg.fft_length, cfg.matmul_dtype)

    @jax.jit
    def spectrum(re, im):
        return srp_freq.music_spectrum(
            re, im, steer, bins, w,
            n_sources=n_sources, diagonal_loading=diagonal_loading)

    scores = spectrum(*spectra(frames))
    sep = max(1, int(round(min_separation_deg * n_azimuths / 360.0)))
    peaks = circular_peaks(np.asarray(scores), n_sources, sep)
    az = peaks * (360.0 / n_azimuths)
    out = {"scores": scores, "azimuth_deg": az % 360.0,
           "n_sources": n_sources}
    if n_estimated is not None:
        out["n_sources_estimated"] = n_estimated  # 0 = silence detected
    return out


# ----------------------------------------------------------------------
# Spherical (azimuth + elevation) SRP DoA — full-bearing generalization of
# the azimuth estimator for non-coplanar (e.g. tetrahedral) arrays.
# New capability beyond the reference (whose only spatial model is the
# near-field planar grid, src/components/vga/vga_heatmap.h:48-93).


def sphere_directions(n_dirs: int, hemisphere: bool = False) -> np.ndarray:
    """Fibonacci lattice of unit bearings [D, 3] — near-uniform coverage of
    the full sphere (or the upper hemisphere: the right steering set for
    coplanar arrays, whose +-z ambiguity makes the lower half redundant)."""
    i = np.arange(n_dirs, dtype=np.float64) + 0.5
    z = 1.0 - (i / n_dirs if hemisphere else 2.0 * i / n_dirs)
    phi = i * (np.pi * (3.0 - np.sqrt(5.0)))  # golden angle
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack(
        [r * np.cos(phi), r * np.sin(phi), z], axis=-1).astype(np.float32)


def sphere_lag_lut(
    mic_positions: np.ndarray,
    pairs: np.ndarray,
    pipeline: PipelineConfig,
    dirs: np.ndarray,
) -> np.ndarray:
    """Integer lag LUT [P, D] over unit bearings ``dirs`` [D, 3] (the
    spherical analogue of :func:`azimuth_lag_lut`; same far-field TDOA
    model tau_p(u) = -(m_j - m_i) . u / c and firmware rounding)."""
    m = np.asarray(mic_positions, np.float64)
    m3 = np.zeros((m.shape[0], 3))
    m3[:, : m.shape[1]] = m
    d = m3[pairs[:, 1]] - m3[pairs[:, 0]]  # [P, 3]
    tau = -(d @ np.asarray(dirs, np.float64).T) / pipeline.speed_of_sound_mps
    v = tau * pipeline.sample_rate_hz
    shifts = np.trunc(v + np.copysign(0.5, v)).astype(np.int32)
    k = pipeline.max_shift
    return np.clip(shifts, -k, k) + k


@dataclasses.dataclass(frozen=True)
class Doa3dEstimator:
    """Jitted spherical SRP estimator: azimuth AND elevation.

    Scores a Fibonacci lattice of bearings with the same one-hot steering
    matmul as the azimuth estimator, then refines the grid peak with the
    dimension-generic least-squares bearing solve on the sub-sample TDOAs
    (ops.solver.farfield_bearing).  Elevation needs a non-coplanar array
    (geometry.tetrahedral_array); coplanar arrays are accepted but steer
    the upper hemisphere only (+-z ambiguity) and their LS z-component is
    damped to ~0, so 'elevation_deg' is grid-resolution-coarse there."""

    pipeline: PipelineConfig
    dirs: jnp.ndarray  # [D, 3] unit bearings
    params: localizer_mod.LocalizerParams  # mic_positions stored [M, 3]
    onehot_sph: jnp.ndarray  # [P*L, D]

    @classmethod
    def create(
        cls,
        mic_positions: np.ndarray,
        pipeline: PipelineConfig = PipelineConfig(phat=True),
        n_dirs: int = 2048,
        *,
        hemisphere: bool | None = None,
    ) -> "Doa3dEstimator":
        """``hemisphere=None`` auto-selects: upper hemisphere for coplanar
        arrays, full sphere otherwise."""
        m = np.asarray(mic_positions, np.float32)
        m3 = np.zeros((m.shape[0], 3), np.float32)
        m3[:, : m.shape[1]] = m
        if pipeline.max_shift_samples is None:
            # the lag window must cover the array aperture (same auto-widen
            # as VolumeLocalizer.create): the reference's fixed +-46
            # (constants.h:12) assumes its 0.2 m triangle — a default-config
            # tetrahedral array at 0.3 m needs +-45..+-74 depending on the
            # pair, and clipped LUT lags silently wreck the bearing estimate
            pipeline = dataclasses.replace(
                pipeline,
                max_shift_samples=geometry.max_lag_for_array(m3, pipeline))
        if hemisphere is None:
            hemisphere = bool(np.ptp(m3[:, 2]) < 1e-6)
        dirs = sphere_directions(n_dirs, hemisphere=hemisphere)
        pairs = geometry.mic_pairs(m3.shape[0])
        lut = sphere_lag_lut(m3, pairs, pipeline, dirs)  # [P, D]
        num_lags = pipeline.num_lags
        p = lut.shape[0]
        onehot = np.zeros((p, num_lags, n_dirs), np.float32)
        pp = np.repeat(np.arange(p), n_dirs)
        onehot[pp, lut.ravel(), np.tile(np.arange(n_dirs), p)] = 1.0
        params = localizer_mod.LocalizerParams(
            mic_positions=jnp.asarray(m3),
            pairs=jnp.asarray(pairs),
            window=jnp.asarray(window_ops.window_for(pipeline)),
            lut_flat=jnp.asarray(lut),
            onehot=None,
            score_bias=None,
        )
        return cls(pipeline=pipeline, dirs=jnp.asarray(dirs), params=params,
                   onehot_sph=jnp.asarray(
                       onehot.reshape(p * num_lags, n_dirs)))

    def __call__(self, frames: jnp.ndarray) -> dict:
        return self._jitted(self.params, self.onehot_sph, self.dirs, frames)

    @functools.cached_property
    def _jitted(self):
        pairs_static = tuple(
            tuple(int(v) for v in row)
            for row in np.asarray(self.params.pairs))
        coplanar = bool(
            np.ptp(np.asarray(self.params.mic_positions)[:, 2]) < 1e-6)
        return jax.jit(functools.partial(
            estimate_doa_3d, cfg=self.pipeline, pairs_static=pairs_static,
            coplanar=coplanar))


def estimate_doa_3d(
    params: localizer_mod.LocalizerParams,
    onehot_sph: jnp.ndarray,
    dirs: jnp.ndarray,
    frames: jnp.ndarray,
    *,
    cfg: PipelineConfig,
    pairs_static: tuple | None = None,
    coplanar: bool = False,
) -> dict:
    """frames [..., M, N] -> spherical DoA.

    Returns 'azimuth_deg'/'elevation_deg' [...], 'bearing' [..., 3]
    (refined unit), 'bearing_grid' [..., 3] (lattice peak), 'scores'
    [..., D], 'tdoa_samples', 'best_shift'.  Non-coplanar arrays refine
    both angles with the LS bearing solve on the sub-sample TDOAs;
    ``coplanar=True`` (static) takes azimuth from the LS solve (whose z
    row is degenerate there) and elevation from the hemisphere grid peak."""
    k = cfg.max_shift
    corr = localizer_mod._conditioned_correlograms(
        params, frames, cfg, pairs_static)
    shifts = xcorr.best_lag(corr, k)
    corr_t = (xcorr.peak_taper(corr, k, cfg.taper_denom, shifts)
              if cfg.taper_enabled else corr)
    scores = srp.srp_scores_matmul(corr_t, onehot_sph)  # [..., D]
    u_grid = jnp.take(dirs, jnp.argmax(scores, axis=-1), axis=0)  # [..., 3]

    tdoa_samples, _ = xcorr.subsample_peak(corr, k)
    u_ls = solver_ops.farfield_bearing(
        tdoa_samples / cfg.sample_rate_hz,
        params.mic_positions, params.pairs, cfg.speed_of_sound_mps)
    if coplanar:
        # the LS z row is rank-deficient: keep the LS azimuth (exact in
        # the plane) and take elevation from the hemisphere grid peak
        el_rad = jnp.arcsin(jnp.clip(u_grid[..., 2], -1.0, 1.0))
        az_rad = jnp.arctan2(u_ls[..., 1], u_ls[..., 0])
        ce = jnp.cos(el_rad)
        u = jnp.stack([ce * jnp.cos(az_rad), ce * jnp.sin(az_rad),
                       jnp.sin(el_rad)], axis=-1)
    else:
        u = u_ls
    az = jnp.degrees(jnp.arctan2(u[..., 1], u[..., 0])) % 360.0
    el = jnp.degrees(jnp.arcsin(jnp.clip(u[..., 2], -1.0, 1.0)))
    return {
        "azimuth_deg": az,
        "elevation_deg": el,
        "bearing": u,
        "bearing_grid": u_grid,
        "scores": scores,
        "tdoa_samples": tdoa_samples,
        "best_shift": shifts,
    }
