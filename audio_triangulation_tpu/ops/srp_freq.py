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
from . import xcorr


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
    bins = xcorr.restrict_bins_to_band(
        np.arange(0, f_full, bin_stride), pipeline)
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
    bins = xcorr.restrict_bins_to_band(
        np.arange(1, f_full - 1, bin_stride), pipeline)  # no DC/Nyquist
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
    per-frequency M x M solves run batched (M is small).

    Everything is computed in REAL arithmetic via the block embedding
    [[A, -B], [B, A]] of R = A + iB: the TPU backend has no complex LU at
    all, and complex einsums sharing an XLA module with large matmuls
    measured far slower to compile than the equivalent real contractions
    (38 s vs 2 s back-to-back for this covariance alone).  Super-resolves
    sources the delay-and-sum SRP merges."""
    a, b = _spatial_covariance_reim(re, im, bins, diagonal_loading)
    a_re, a_im = _split_steering(steering)
    top = jnp.concatenate([a, -b], axis=-1)
    bot = jnp.concatenate([b, a], axis=-1)
    block = jnp.concatenate([top, bot], axis=-2)      # [Fk, 2M, 2M] real
    rhs = jnp.concatenate([a_re, a_im], axis=-2)      # [Fk, 2M, G]
    x = jnp.linalg.solve(block, rhs)                  # R^-1 a, embedded
    m = a.shape[-1]
    # den = Re(a^H R^-1 a) = a_re . x_re + a_im . x_im
    den = (jnp.einsum("fmg,fmg->fg", a_re, x[..., :m, :])
           + jnp.einsum("fmg,fmg->fg", a_im, x[..., m:, :]))
    den = jnp.maximum(den, 1e-12)
    return jnp.sum(jnp.asarray(weights)[:, None] / den, axis=0)  # [G]


def _split_steering(steering) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(re, im) of a steering tensor; splits numpy hosts-side so no complex
    constant ever enters the XLA module (see mvdr_spectrum docstring)."""
    if isinstance(steering, np.ndarray):
        return (jnp.asarray(np.real(steering).astype(np.float32)),
                jnp.asarray(np.imag(steering).astype(np.float32)))
    return jnp.real(steering), jnp.imag(steering)


def _spatial_covariance_reim(
    re: jnp.ndarray,
    im: jnp.ndarray,
    bins: np.ndarray,
    diagonal_loading: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(A, B) = (Re, Im) of the per-frequency spatial covariance
    R_f = E_s[x x^H], x = re + i im, in real arithmetic:
    A_mn = E[r_m r_n + i_m i_n], B_mn = E[i_m r_n - r_m i_n].
    re/im: [S, M, F]; returns two [Fk, M, M] with scale-invariant diagonal
    loading applied to A."""
    rb = jnp.moveaxis(re[..., bins], -1, 0)  # [Fk, S, M]
    ib = jnp.moveaxis(im[..., bins], -1, 0)
    s_count = rb.shape[1]
    a = (jnp.einsum("fsm,fsn->fmn", rb, rb)
         + jnp.einsum("fsm,fsn->fmn", ib, ib)) / s_count
    b = (jnp.einsum("fsm,fsn->fmn", ib, rb)
         - jnp.einsum("fsm,fsn->fmn", rb, ib)) / s_count
    if diagonal_loading:
        m = a.shape[-1]
        tr = jnp.einsum("fmm->f", a) / m
        eye = jnp.eye(m, dtype=a.dtype)
        a = a + (diagonal_loading * tr)[:, None, None] * eye
    return a, b


def music_spectrum(
    re: jnp.ndarray,
    im: jnp.ndarray,
    steering: jnp.ndarray,   # [Fk, M, G] complex64
    bins: np.ndarray,
    weights: np.ndarray,     # [Fk]
    *,
    n_sources: int = 1,
    diagonal_loading: float = 0.0,
) -> jnp.ndarray:
    """Wideband (incoherent) MUSIC pseudo-spectrum over the grid (new
    capability; the reference has no subspace method).

        P(g) = sum_f w_f / (a_g^H E_n E_n^H a_g)
             = sum_f w_f / (M - ||P_sig a_g||^2)

    with E_n the noise subspace of the per-frequency spatial covariance
    R_f (estimated from the snapshot axis of (re, im) [S, M, F]).  The
    eigendecomposition runs on the real block embedding of R_f (the TPU
    backend has no complex eigh — see ``ops.linalg.complex_eigh``), and the
    signal-subspace quadratic form is four real einsums; no complex dtype
    ever enters the XLA module (see the mvdr_spectrum docstring for why
    that matters on TPU).  Sharper than both delay-and-sum SRP and MVDR
    when n_sources < M and snapshots >= M.

    ``n_sources`` is the assumed signal-subspace dimension (the classic
    MUSIC model-order parameter).  Requires S snapshots (more than M for a
    full-rank covariance; fewer still works with diagonal loading).
    """
    from . import linalg as cxlinalg

    m = re.shape[-2]
    if not 0 < n_sources < m:
        raise ValueError(f"n_sources must be in [1, {m - 1}], "
                         f"got {n_sources}")
    a, b = _spatial_covariance_reim(re, im, bins, diagonal_loading)
    a_re, a_im = _split_steering(steering)

    # real symmetric embedding [[A, -B], [B, A]]; eigenvalues of R, doubled
    top = jnp.concatenate([a, -b], axis=-1)
    bot = jnp.concatenate([b, a], axis=-1)
    block = jnp.concatenate([top, bot], axis=-2)   # [Fk, 2M, 2M]
    _, v2 = jnp.linalg.eigh(block)                 # ascending eigenvalues
    # signal subspace: top n_sources eigenvalues of R = last 2*n_sources
    # columns of the embedding's eigenvectors
    w_sig = v2[..., -2 * n_sources:]               # [Fk, 2M, 2K]
    sig = cxlinalg.subspace_projector_quadform(
        w_sig[..., :m, :], w_sig[..., m:, :], a_re, a_im)    # [Fk, G]
    # ||a_g||^2 = M for unit-modulus steering; noise power = M - signal
    den = jnp.maximum(m - sig, 1e-6)
    return jnp.sum(jnp.asarray(weights)[:, None] / den, axis=0)  # [G]


def focusing_matrices(
    steering: np.ndarray,   # [Fk, M, G] complex64 (mic_steering_vectors)
    f0_idx: int,
    focus_cells: np.ndarray,
) -> np.ndarray:
    """RSS focusing matrices T_f [Fk, M, M] mapping each frequency's array
    manifold onto the reference bin's (Hung & Kaveh rotational signal
    subspace): T_f = argmin_{T unitary} ||A_0 - T A_f||_F = U V^H from the
    SVD  A_0 A_f^H = U S V^H,  with A_f the steering matrix restricted to
    the focus cells.

    ``focus_cells`` must be a SMALL SECTOR around preliminary source
    estimates (see :func:`select_focus_cells`), not the whole grid: one
    unitary rotation can align two frequencies' manifolds only over a
    narrow spatial sector, and a whole-grid fit leaves the focusing
    residual essentially unchanged (measured: ||A_0 - T A_f||_F 60.4 ->
    58.9 on a full 61x61 grid vs a correct spectrum with sector focusing),
    producing garbage — on a centro-symmetric array the spectrum then
    peaks at the ANTIPODE of the true source.

    Computed HOST-SIDE in numpy: the matrices depend only on geometry and
    the chosen sector, and complex dtypes inside TPU XLA modules carry a
    large compile-time tax (see mvdr_spectrum) — the device only ever sees
    their re/im parts."""
    a0 = steering[f0_idx][:, focus_cells]            # [M, C]
    ts = []
    for f in range(steering.shape[0]):
        af = steering[f][:, focus_cells]             # [M, C]
        q = a0 @ af.conj().T                         # [M, M]
        u, _, vh = np.linalg.svd(q)
        ts.append(u @ vh)
    return np.stack(ts).astype(np.complex64)        # [Fk, M, M]


def conventional_spectrum(
    re: jnp.ndarray,
    im: jnp.ndarray,
    steering: jnp.ndarray,   # [Fk, M, G] complex64
    bins: np.ndarray,
    weights: np.ndarray,     # [Fk]
) -> jnp.ndarray:
    """Wideband conventional (Bartlett) spectrum over the grid:
    P(g) = sum_f w_f Re(a_g^H R_f a_g) / M.  The cheap delay-and-sum
    preliminary whose peaks seed CSSM's focusing sector
    (:func:`select_focus_cells`); all-real arithmetic like its siblings."""
    a, b = _spatial_covariance_reim(re, im, bins, 0.0)
    p, q = _split_steering(steering)
    # Re(a^H R a) with a = p + iq, R = A + iB (A sym, B antisym):
    #   p^T A p + q^T A q + 2 q^T B p
    m = re.shape[-2]
    quad = (jnp.einsum("fmg,fmn,fng->fg", p, a, p)
            + jnp.einsum("fmg,fmn,fng->fg", q, a, q)
            + 2.0 * jnp.einsum("fmg,fmn,fng->fg", q, b, p))
    return jnp.einsum("f,fg->g", jnp.asarray(weights), quad) / m


def select_focus_cells(
    spectrum: np.ndarray,     # [G] preliminary (Bartlett) spectrum
    grid_hw: tuple[int, int],
    n_peaks: int,
    *,
    radius_cells: int = 3,
    suppress_cells: int = 8,
) -> np.ndarray:
    """Host-side focusing-sector selection for CSSM: the union of
    (2r+1)^2 neighborhoods around the ``n_peaks`` strongest well-separated
    peaks of a preliminary spectrum (peaks extracted greedily with a
    ``suppress_cells``-radius exclusion zone, the same non-max suppression
    the multi-source grid peak picker uses)."""
    h, w = grid_hw
    flat = np.asarray(spectrum, np.float64).reshape(-1).copy()
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    mask = np.zeros(h * w, bool)
    for _ in range(max(1, int(n_peaks))):
        gi = int(np.argmax(flat))
        if not np.isfinite(flat[gi]):
            break
        r0, c0 = divmod(gi, w)
        mask |= ((np.abs(rr - r0) <= radius_cells)
                 & (np.abs(cc - c0) <= radius_cells)).reshape(-1)
        flat[((np.abs(rr - r0) < suppress_cells)
              & (np.abs(cc - c0) < suppress_cells)).reshape(-1)] = -np.inf
    return np.nonzero(mask)[0]


def music_spectrum_coherent(
    re: jnp.ndarray,
    im: jnp.ndarray,
    steering: np.ndarray,    # [Fk, M, G] complex64
    bins: np.ndarray,
    weights: np.ndarray,     # [Fk]
    focus_cells: np.ndarray,
    *,
    n_sources: int = 1,
    f0_idx: int | None = None,
    diagonal_loading: float = 1e-3,
) -> jnp.ndarray:
    """Coherent wideband MUSIC (CSSM) pseudo-spectrum over the grid.

    Where :func:`music_spectrum` averages per-frequency MUSIC spectra
    (incoherent), CSSM focuses every per-bin covariance onto one reference
    bin FIRST and eigendecomposes the average:

        R_coh = sum_f w_f T_f R_f T_f^H,   then MUSIC at bin f0.

    The frequency averaging restores signal-subspace rank for COHERENT
    sources (a source plus its specular reflection is rank-1 at every
    single bin, where incoherent MUSIC cannot separate them) and yields
    one eigendecomposition instead of Fk.  New capability beyond the
    reference (which has no subspace methods at all).

    ``focus_cells`` is the focusing sector (see :func:`select_focus_cells`
    and the sector-size warning on :func:`focusing_matrices`).  Use a
    band-limited ``cfg.band_hz`` when building the steering tensor: one
    unitary focusing per bin only holds over a moderate fractional
    bandwidth (full-band 48 Hz-25 kHz focusing fails even with a correct
    sector; 800-6000 Hz recovers both scenes exactly — see
    tests/test_srp_freq.py).

    TPU-shaped: the focusing matrices are host-side numpy (geometry + a
    sector, complex SVDs); on device everything is real block-embedding
    arithmetic — T R T^H expands into real einsums over [Fk, M, M], one
    real-embedded eigh, and the all-real projector quadform."""
    m = re.shape[-2]
    if not 0 < n_sources < m:
        raise ValueError(f"n_sources must be in [1, {m - 1}], "
                         f"got {n_sources}")
    fk = steering.shape[0]
    if f0_idx is None:
        f0_idx = fk // 2
    t = focusing_matrices(np.asarray(steering), f0_idx,
                          np.asarray(focus_cells))
    t_re = jnp.asarray(np.real(t).astype(np.float32))   # [Fk, M, M]
    t_im = jnp.asarray(np.imag(t).astype(np.float32))

    a, b = _spatial_covariance_reim(re, im, bins, diagonal_loading)

    # T R T^H in re/im parts: R = A + iB, T = Tr + iTi
    #   TR   = (Tr A - Ti B) + i (Ti A + Tr B)
    #   TRT^H: T^H = Tr^T - i Ti^T
    tr_a = jnp.einsum("fij,fjk->fik", t_re, a)
    ti_b = jnp.einsum("fij,fjk->fik", t_im, b)
    ti_a = jnp.einsum("fij,fjk->fik", t_im, a)
    tr_b = jnp.einsum("fij,fjk->fik", t_re, b)
    p_re, p_im = tr_a - ti_b, ti_a + tr_b
    c_re = (jnp.einsum("fik,fjk->fij", p_re, t_re)
            + jnp.einsum("fik,fjk->fij", p_im, t_im))
    c_im = (jnp.einsum("fik,fjk->fij", p_im, t_re)
            - jnp.einsum("fik,fjk->fij", p_re, t_im))
    w = jnp.asarray(weights)[:, None, None]
    r_re = jnp.sum(w * c_re, axis=0)                    # [M, M]
    r_im = jnp.sum(w * c_im, axis=0)
    # enforce exact Hermitian symmetry against f32 round-off
    r_re = 0.5 * (r_re + r_re.T)
    r_im = 0.5 * (r_im - r_im.T)

    # narrowband MUSIC at f0 on the focused covariance (real embedding)
    top = jnp.concatenate([r_re, -r_im], axis=-1)
    bot = jnp.concatenate([r_im, r_re], axis=-1)
    block = jnp.concatenate([top, bot], axis=-2)        # [2M, 2M]
    _, v2 = jnp.linalg.eigh(block)
    w_sig = v2[:, -2 * n_sources:]                      # [2M, 2K]
    a0_re, a0_im = _split_steering(np.asarray(steering)[f0_idx])
    from . import linalg as cxlinalg

    sig = cxlinalg.subspace_projector_quadform(
        w_sig[None, :m, :], w_sig[None, m:, :],
        a0_re[None], a0_im[None])[0]                    # [G]
    return 1.0 / jnp.maximum(m - sig, 1e-6)


def estimate_n_sources(
    frames: jnp.ndarray,
    cfg: PipelineConfig,
    *,
    bin_stride: int = 8,
    criterion: str = "mdl",
    diagonal_loading: float = 1e-3,
    max_sources: int | None = None,
) -> int:
    """Automatic model-order selection: how many sources are present?

    Wideband Wax-Kailath information criterion on the per-frequency
    spatial-covariance eigenvalues (new capability; MUSIC/JPDA/multi-source
    currently take ``n_sources`` as a given).  For each candidate k the
    smallest M-k eigenvalues should be equal (the noise floor); the
    log-likelihood term S*(M-k)*ln(arith/geom mean ratio) measures their
    spread, summed incoherently over frequency bins, plus the
    per-bin penalty summed over the Fk bins ('mdl' = 0.5 k(2M-k) Fk ln(S),
    'aic' = k(2M-k) Fk — each bin carries its own signal subspace).

    frames: [S, M, N] snapshots (S > M for a full-rank covariance).
    Returns the k in [0, max_sources] minimizing the criterion.
    """
    from . import mxu_fft
    from . import window as window_ops
    from ..models import localizer as localizer_mod

    s_count, m = frames.shape[0], frames.shape[1]
    k_max = min(m - 1, max_sources if max_sources is not None else m - 1)
    win = jnp.asarray(window_ops.window_for(cfg))
    x = localizer_mod.condition_frames(jnp.asarray(frames), win, cfg)
    re, im = mxu_fft.forward_spectra(
        x, cfg.fft_length, cfg.matmul_dtype, mxu_fft.dft_prec(cfg))
    f_full = cfg.fft_length // 2 + 1
    bins = xcorr.restrict_bins_to_band(
        np.arange(1, f_full - 1, bin_stride), cfg)
    a, b = _spatial_covariance_reim(re, im, bins, diagonal_loading)
    top = jnp.concatenate([a, -b], axis=-1)
    bot = jnp.concatenate([b, a], axis=-1)
    block = jnp.concatenate([top, bot], axis=-2)  # [Fk, 2M, 2M]
    ev2 = jnp.linalg.eigvalsh(block)  # ascending; R's eigs doubled
    lam = np.maximum(np.asarray(ev2)[..., ::2], 1e-20)  # [Fk, M] ascending

    # noise-subspace mean ratios for every candidate noise dim d = M - k:
    # ascending order -> the smallest d eigenvalues are lam[:, :d]
    csum = np.cumsum(lam, axis=-1)  # [Fk, M]
    clog = np.cumsum(np.log(lam), axis=-1)
    d = np.arange(1, m + 1)
    arith = csum / d  # [Fk, M] mean of the d smallest
    geo = clog / d  # log geometric mean
    # log(A_d / G_d) >= 0, == 0 iff the d smallest are equal
    spread = np.log(np.maximum(arith, 1e-20)) - geo  # [Fk, M]
    fk = lam.shape[0]
    crit = np.empty(k_max + 1)
    for k in range(k_max + 1):
        dd = m - k
        ll = s_count * dd * spread[:, dd - 1].sum()  # over bins
        # each bin carries its own k-dim signal subspace, so the penalty's
        # free-parameter count k(2M - k) scales with the bin count
        if criterion == "mdl":
            pen = 0.5 * k * (2 * m - k) * fk * np.log(s_count)
        elif criterion == "aic":
            pen = k * (2 * m - k) * fk
        else:
            raise ValueError(f"criterion={criterion!r}")
        crit[k] = ll + pen
    return int(np.argmin(crit))


def localize_music(
    frames: jnp.ndarray,
    mic_positions: np.ndarray,
    grid: GridConfig,
    cfg: PipelineConfig,
    *,
    n_sources: int | str = 1,
    bin_stride: int = 8,
    diagonal_loading: float = 0.0,
    coherent: bool = False,
    focus_radius_cells: int = 3,
) -> dict:
    """Snapshot frames [S, M, N] -> wideband MUSIC grid spectrum + peak.

    The subspace analogue of :func:`localize_mvdr`: sharper pseudo-spectrum
    (super-resolution beyond the array beamwidth) at the cost of an assumed
    source count.  S snapshots estimate the spatial covariance.

    ``coherent=True`` switches to CSSM focusing
    (:func:`music_spectrum_coherent`): required when sources are mutually
    COHERENT (e.g. a source plus its wall reflection), where the per-bin
    covariance is rank-deficient and incoherent averaging cannot recover
    the second source.  The focusing sector is seeded automatically from a
    conventional (Bartlett) preliminary pass — ``focus_radius_cells``
    around each of the ``n_sources`` strongest well-separated peaks — and
    ``cfg.band_hz`` should be set (moderate fractional bandwidth; see the
    music_spectrum_coherent docstring).

    Dispatched as THREE jitted stages (spectra | spectrum | peak): fusing
    the batched eigh, the DFT matmuls, and the argmax/gather peak into one
    XLA module repeatedly measured minutes of TPU compile time vs ~16 s
    split (the axon compile service is also noisy, but the split was
    consistently fastest), and this once-per-scene path gains nothing from
    whole-graph fusion."""
    from . import mxu_fft, srp as srp_lag
    from . import window as window_ops
    from ..models import localizer as localizer_mod

    n_estimated = None
    if n_sources == "auto":
        # MDL model-order selection (estimate_n_sources); MUSIC needs at
        # least a 1-dim signal subspace, but the RAW estimate (which can
        # be 0 = silence) is reported so callers can tell the difference
        n_estimated = estimate_n_sources(
            frames, cfg, bin_stride=bin_stride,
            diagonal_loading=max(diagonal_loading, 1e-3))
        n_sources = max(1, n_estimated)
    mic_positions = np.asarray(mic_positions, np.float32)
    steer, bins, w = mic_steering_vectors(
        grid, mic_positions, cfg, bin_stride=bin_stride)
    win = jnp.asarray(window_ops.window_for(cfg))

    @jax.jit
    def spectra(fr):
        x = localizer_mod.condition_frames(fr, win, cfg)
        return mxu_fft.forward_spectra(x, cfg.fft_length, cfg.matmul_dtype,
                                       mxu_fft.dft_prec(cfg))

    @jax.jit
    def spectrum(re, im):
        return music_spectrum(
            re, im, steer, bins, w,
            n_sources=n_sources, diagonal_loading=diagonal_loading)

    if coherent:
        # CSSM needs its focusing sector before its jitted stage can be
        # traced (focusing_matrices is host numpy): run the cheap Bartlett
        # preliminary as its own jitted stage, pick the sector host-side
        # from its peaks, then trace the focused spectrum with the sector
        # folded in as a constant.  One extra host round-trip on a
        # once-per-scene path.
        prelim_fn = jax.jit(
            lambda re, im: conventional_spectrum(re, im, steer, bins, w))

        def spectrum(re, im):  # noqa: F811 — coherent dispatch
            cells = select_focus_cells(
                np.asarray(prelim_fn(re, im)),
                (grid.height, grid.width), n_sources,
                radius_cells=focus_radius_cells)
            coh_fn = jax.jit(
                lambda re, im: music_spectrum_coherent(
                    re, im, steer, bins, w, cells, n_sources=n_sources,
                    diagonal_loading=max(diagonal_loading, 1e-3)))
            return coh_fn(re, im)

    @jax.jit
    def peak(scores):
        return srp_lag.grid_peak_xy(
            scores[None], (grid.height, grid.width),
            (grid.half_cells_x, grid.half_cells_y), grid.cells_per_m,
            refine=True)[0]

    scores = spectrum(*spectra(frames))
    out = {"scores": scores, "xy_grid": peak(scores),
           "n_sources": n_sources}
    if n_estimated is not None:
        out["n_sources_estimated"] = n_estimated  # 0 = silence detected
    return out


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
    more snapshots -> better interference rejection.

    Three jitted stages, like :func:`localize_music` (one big XLA module
    costs compile time for zero fusion benefit on this once-per-scene
    path)."""
    from . import mxu_fft, srp as srp_lag
    from . import window as window_ops
    from ..models import localizer as localizer_mod

    mic_positions = np.asarray(mic_positions, np.float32)
    steer, bins, w = mic_steering_vectors(
        grid, mic_positions, cfg, bin_stride=bin_stride)
    win = jnp.asarray(window_ops.window_for(cfg))

    @jax.jit
    def spectra(fr):
        x = localizer_mod.condition_frames(fr, win, cfg)
        return mxu_fft.forward_spectra(x, cfg.fft_length, cfg.matmul_dtype,
                                       mxu_fft.dft_prec(cfg))

    @jax.jit
    def spectrum(re, im):
        return mvdr_spectrum(
            re, im, steer, bins, w,
            diagonal_loading=diagonal_loading)

    @jax.jit
    def peak(scores):
        return srp_lag.grid_peak_xy(
            scores[None], (grid.height, grid.width),
            (grid.half_cells_x, grid.half_cells_y), grid.cells_per_m,
            refine=True)[0]

    scores = spectrum(*spectra(frames))
    return {"scores": scores, "xy_grid": peak(scores)}


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
        re, im = mxu_fft.forward_spectra(x, cfg.fft_length, cfg.matmul_dtype,
                                         mxu_fft.dft_prec(cfg))
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
