"""MXU-native GCC: the DFT chain as matrix multiplies.

XLA's TPU FFT runs at a few hundred GFLOPS; the MXU runs matmuls at tens of
TFLOPS.  For GCC on short frames (N ~ 1024) with a narrow lag window
(L_out ~ 93), expressing the transform chain as matmuls is an order of
magnitude faster despite the higher FLOP count:

- forward:  Re/Im spectra = frames @ cos/sin DFT matrices  [N, F]
- cross-power + optional PHAT: elementwise (VPU)
- inverse:  correlogram = Re/Im cross-power @ lag-synthesis matrices [F, L_out]
  — synthesizing ONLY the +-max_shift lags the pipeline needs, instead of a
  full irfft followed by slicing (the reference only ever looks at +-46 lags,
  correlations.h:8).

The inverse matrices fold in the irfft normalization and the rfft Hermitian
doubling, so results equal ``xcorr_fft`` up to float rounding.  Matmuls can
run in bf16 (2x MXU throughput) with f32 accumulation; the correlogram error
stays ~1e-3 relative, far below what sub-sample peak interpolation needs.

This module is the hot path's engine; ``ops.xcorr.xcorr_fft`` remains the
reference implementation (and the two are tested against each other).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import PipelineConfig


@functools.lru_cache(maxsize=16)
def dft_matrices(n: int, fft_length: int, dtype_str: str = "float32"):
    """Forward real-DFT matrices (cos, -sin) of shape [n, F], F = L/2 + 1.

    x_padded(L) = [x, 0...]; Re X[f] = sum_n x[n] cos(2 pi f n / L),
    Im X[f] = -sum_n x[n] sin(2 pi f n / L).  Zero-padding is implicit: rows
    only cover the n real samples."""
    dtype = np.dtype(dtype_str)
    f = fft_length // 2 + 1
    nn = np.arange(n)[:, None]
    ff = np.arange(f)[None, :]
    ang = 2.0 * np.pi * nn * ff / fft_length
    cos = np.cos(ang)
    msin = -np.sin(ang)
    if dtype_str == "bfloat16":
        import ml_dtypes

        return (cos.astype(ml_dtypes.bfloat16), msin.astype(ml_dtypes.bfloat16))
    return cos.astype(dtype), msin.astype(dtype)


@functools.lru_cache(maxsize=16)
def lag_synthesis_matrices(fft_length: int, max_shift: int,
                           dtype_str: str = "float32"):
    """Inverse matrices [F, 2K+1] mapping a cross-power spectrum to the
    correlogram at lags s in [-K, K]:

        corr[s] = (1/L) * sum_f w_f * Re(R[f] e^{+j 2 pi f s / L})
                = Re(R) @ C + Im(R) @ S

    with Hermitian weights w_f = 1 for f in {0, L/2} else 2 (folded in)."""
    l, k = fft_length, max_shift
    f = l // 2 + 1
    lags = np.arange(-k, k + 1)[None, :]  # negative lag s -> index L + s
    ff = np.arange(f)[:, None]
    ang = 2.0 * np.pi * ff * lags / l  # e^{+j ang}; s<0 == s+L mod L
    w = np.full((f, 1), 2.0)
    w[0] = 1.0
    if l % 2 == 0:
        w[-1] = 1.0
    c = (w * np.cos(ang)) / l
    s = (-w * np.sin(ang)) / l  # Re(R e^{j a}) = Re R cos a - Im R sin a
    dtype = np.dtype(dtype_str)
    if dtype_str == "bfloat16":
        import ml_dtypes

        return c.astype(ml_dtypes.bfloat16), s.astype(ml_dtypes.bfloat16)
    return c.astype(dtype), s.astype(dtype)


@functools.lru_cache(maxsize=16)
def band_bins(fft_length: int, sample_rate_hz: float,
              lo_hz: float, hi_hz: float) -> tuple:
    """(lo_bin, hi_bin) half-open rfft bin range covering [lo_hz, hi_hz]."""
    f = fft_length // 2 + 1
    freqs = np.arange(f) * (sample_rate_hz / fft_length)
    idx = np.nonzero((freqs >= lo_hz) & (freqs <= hi_hz))[0]
    if idx.size == 0:
        raise ValueError(f"band {lo_hz}:{hi_hz} Hz covers no rfft bins")
    return int(idx[0]), int(idx[-1] + 1)


@functools.lru_cache(maxsize=16)
def dft_matrices_band(n: int, fft_length: int, lo_bin: int, hi_bin: int,
                      dtype_str: str = "float32"):
    """Forward real-DFT matrices restricted to bins [lo_bin, hi_bin):
    [n, Fb] with Fb = hi - lo.  Out-of-band bins are never computed —
    the band-crop fast path (vs. :func:`masked_synthesis`, which zeroes
    them after computing them)."""
    cos, msin = dft_matrices(n, fft_length, dtype_str)
    return (np.ascontiguousarray(cos[:, lo_bin:hi_bin]),
            np.ascontiguousarray(msin[:, lo_bin:hi_bin]))


@functools.lru_cache(maxsize=16)
def lag_synthesis_matrices_band(fft_length: int, max_shift: int,
                                lo_bin: int, hi_bin: int,
                                dtype_str: str = "float32"):
    """Lag-synthesis matrices restricted to bins [lo_bin, hi_bin):
    [Fb, 2K+1].  Identical correlograms to the masked full-band form
    (dropped rows contribute exactly zero there)."""
    c, s = lag_synthesis_matrices(fft_length, max_shift, dtype_str)
    return (np.ascontiguousarray(c[lo_bin:hi_bin]),
            np.ascontiguousarray(s[lo_bin:hi_bin]))


def dft_prec(cfg: PipelineConfig):
    """jax matmul precision for the DFT/synthesis contractions."""
    return (jax.lax.Precision.HIGHEST
            if cfg.dft_precision == "highest" else None)


def crop_bins(cfg: PipelineConfig):
    """(lo_bin, hi_bin) when the band-crop fast path applies, else None."""
    if cfg.band_hz is None or not cfg.band_crop:
        return None
    return band_bins(cfg.fft_length, cfg.sample_rate_hz, *cfg.band_hz)


def masked_synthesis(cfg: PipelineConfig, matmul_dtype: str = "float32"):
    """Lag-synthesis matrices with ``cfg.band_hz`` folded in: rows of
    out-of-band frequency bins are zeroed, so band-limiting costs nothing
    at run time (the matmul shape is unchanged)."""
    from . import xcorr

    syn_c, syn_s = lag_synthesis_matrices(
        cfg.fft_length, cfg.max_shift, matmul_dtype)
    mask = xcorr.band_mask(cfg)
    if mask is not None:
        syn_c = syn_c * mask[:, None].astype(syn_c.dtype)
        syn_s = syn_s * mask[:, None].astype(syn_s.dtype)
    return syn_c, syn_s


def rdft(frames: jnp.ndarray, cos: jnp.ndarray, msin: jnp.ndarray,
         precision=None):
    """Real DFT via MXU: frames [..., N] -> (re, im) [..., F], f32 accum."""
    dt = cos.dtype
    x = frames.astype(dt)
    re = jnp.matmul(x, cos, preferred_element_type=jnp.float32,
                    precision=precision)
    im = jnp.matmul(x, msin, preferred_element_type=jnp.float32,
                    precision=precision)
    return re, im


# N^2 matmul-DFT beats XLA's FFT for short frames; the FFT wins past this
# (matmul cost grows ~N/log N faster).  Measured on the v5e chip: at
# N = 4096 the two DFT matmuls take ~3.1 ms for [256, 64] frames vs ~9 ms
# of rfft fusions, so the crossover sits above 4096 there.
MATMUL_DFT_MAX_N = 4096


def forward_spectra(frames: jnp.ndarray, fft_length: int,
                    matmul_dtype: str = "float32", precision=None):
    """(re, im) [..., F] via the faster of matmul-DFT / XLA rfft."""
    n = frames.shape[-1]
    if n <= MATMUL_DFT_MAX_N:
        cos, msin = dft_matrices(n, fft_length, matmul_dtype)
        return rdft(frames, jnp.asarray(cos), jnp.asarray(msin), precision)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=fft_length, axis=-1)
    return jnp.real(spec), jnp.imag(spec)


def forward_spectra_band(frames: jnp.ndarray, fft_length: int,
                         lo_bin: int, hi_bin: int,
                         matmul_dtype: str = "float32", precision=None):
    """(re, im) [..., Fb] of ONLY the bins [lo_bin, hi_bin) — the
    band-crop fast path's forward transform."""
    n = frames.shape[-1]
    if n <= MATMUL_DFT_MAX_N:
        cos, msin = dft_matrices_band(
            n, fft_length, lo_bin, hi_bin, matmul_dtype)
        return rdft(frames, jnp.asarray(cos), jnp.asarray(msin), precision)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=fft_length, axis=-1)
    spec = spec[..., lo_bin:hi_bin]
    return jnp.real(spec), jnp.imag(spec)


def whiten_reim(re: jnp.ndarray, im: jnp.ndarray, eps: float = 1e-12,
                beta: float = 1.0):
    """Per-mic PHAT whitening on (re, im) spectra [..., M, F]: the pair
    weight 1/|X_i X_j*| factorizes into per-mic normalization (see
    ops.xcorr.whiten_spectra) — O(M F) rsqrts instead of O(P F).
    ``beta`` < 1 is partial (PHAT-beta) whitening."""
    mag2 = re * re + im * im + eps * eps
    inv = jax.lax.rsqrt(mag2) if beta == 1.0 else mag2 ** (-0.5 * beta)
    return re * inv, im * inv


def autoband_scale_reim(re: jnp.ndarray, im: jnp.ndarray,
                        pairs, cfg: PipelineConfig):
    """Fold the per-event auto band (``band_hz='auto'``) into RAW spectra
    [..., M, F]: scale by sqrt(w).  Because the weight is binary 0/1, the
    scaling commutes with PHAT whitening (whiten(0) = 0, whiten(X) else),
    so the downstream cross-power equals the w-weighted whitened
    cross-power — the engine needs no separate band operand.  The weight
    is estimated in f32 from an evenly-strided pair subsample
    (ops.xcorr.band_pair_subset; identity for small arrays)."""
    from . import xcorr

    # subset by STATIC indices (derived from the pair count alone): pairs
    # may be a traced array under jit, so band_pair_subset's concrete
    # slicing cannot run here
    pairs = jnp.asarray(pairs)
    p = pairs.shape[0]
    if p > 64:
        idx = np.unique(np.linspace(0, p - 1, 64).round().astype(np.int64))
        sub = jnp.take(pairs, jnp.asarray(idx), axis=0)
    else:
        sub = pairs
    w = xcorr.auto_band_weight_reim(
        re.astype(jnp.float32), im.astype(jnp.float32), sub, cfg)
    ws = jnp.sqrt(w)[..., None, :]
    return (re * ws.astype(re.dtype)), (im * ws.astype(im.dtype))


def cross_power_reim(
    re: jnp.ndarray, im: jnp.ndarray, pairs: jnp.ndarray,
    *, phat: bool = False, phat_eps: float = 1e-12, phat_beta: float = 1.0,
):
    """conj(X_i) * X_j per pair on (re, im) [..., M, F] -> [..., P, F],
    optionally PHAT-whitened (per-mic factorization when M >= 3, see
    ops.xcorr.phat_per_mic; per-pair for 2-mic arrays; ``phat_beta`` < 1
    is partial whitening)."""
    from . import xcorr

    per_mic = phat and xcorr.phat_per_mic(re.shape[-2])
    if per_mic:
        re, im = whiten_reim(re, im, phat_eps, phat_beta)
    ri = jnp.take(re, pairs[:, 0], axis=-2)
    ii = jnp.take(im, pairs[:, 0], axis=-2)
    rj = jnp.take(re, pairs[:, 1], axis=-2)
    ij = jnp.take(im, pairs[:, 1], axis=-2)
    rr = ri * rj + ii * ij
    jj = ri * ij - ii * rj
    if phat and not per_mic:
        mag2 = rr * rr + jj * jj + phat_eps * phat_eps
        inv = (jax.lax.rsqrt(mag2) if phat_beta == 1.0
               else mag2 ** (-0.5 * phat_beta))
        rr = rr * inv
        jj = jj * inv
    return rr, jj


def lag_correlogram(rr: jnp.ndarray, jj: jnp.ndarray,
                    syn_c: jnp.ndarray, syn_s: jnp.ndarray,
                    precision=None) -> jnp.ndarray:
    """Cross-power (re, im) [..., P, F] -> correlogram [..., P, 2K+1]."""
    dt = syn_c.dtype
    a = jnp.matmul(rr.astype(dt), syn_c, preferred_element_type=jnp.float32,
                   precision=precision)
    b = jnp.matmul(jj.astype(dt), syn_s, preferred_element_type=jnp.float32,
                   precision=precision)
    return a + b


def xcorr_mxu_pairblocked(
    frames: jnp.ndarray,
    pairs: jnp.ndarray,
    cfg: PipelineConfig,
    *,
    matmul_dtype: str = "float32",
    pair_chunk: int = 128,
) -> jnp.ndarray:
    """Large-array GCC: spectra computed once, then cross-power + lag
    synthesis evaluated ``pair_chunk`` pairs at a time under ``lax.map``.

    For arrays like 64 mics (2016 pairs) the full [B, P, F] cross-power
    would need tens of GB of HBM; blocking the pair axis bounds the live
    intermediate to [B, pair_chunk, F] while producing the same [B, P, L]
    correlograms (tested against :func:`xcorr_mxu`)."""
    n = frames.shape[-1]
    prec = dft_prec(cfg)
    crop = crop_bins(cfg)
    if crop is not None:
        syn_c, syn_s = lag_synthesis_matrices_band(
            cfg.fft_length, cfg.max_shift, *crop, matmul_dtype)
        re, im = forward_spectra_band(
            frames, cfg.fft_length, *crop, matmul_dtype, prec)
    else:
        syn_c, syn_s = masked_synthesis(cfg, matmul_dtype)
        re, im = forward_spectra(frames, cfg.fft_length, matmul_dtype, prec)
    syn_c = jnp.asarray(syn_c)
    syn_s = jnp.asarray(syn_s)
    if cfg.band_auto:
        re, im = autoband_scale_reim(re, im, pairs, cfg)
    if cfg.phat:
        # whiten per mic ONCE outside the chunk loop (lax.map would redo
        # the rsqrt pass for every pair chunk); this path only runs for
        # large arrays, where per-mic always wins (phat_per_mic)
        re, im = whiten_reim(re, im, cfg.phat_eps, cfg.phat_beta)

    p = pairs.shape[0]
    pad = (-p) % pair_chunk
    pairs_padded = jnp.concatenate(
        [pairs, jnp.zeros((pad, 2), pairs.dtype)]) if pad else pairs
    chunks = pairs_padded.reshape(-1, pair_chunk, 2)

    def body(pc):
        rr, jj = cross_power_reim(re, im, pc, phat=False)
        return lag_correlogram(rr, jj, syn_c, syn_s, prec)  # [..., chunk, L]

    out = jax.lax.map(body, chunks)  # [n_chunks, ..., chunk, L]
    out = jnp.moveaxis(out, 0, -3)  # [..., n_chunks, chunk, L]
    lead = out.shape[:-3]
    out = out.reshape(*lead, -1, out.shape[-1])
    return out[..., :p, :]


def xcorr_mxu(
    frames: jnp.ndarray,
    pairs: jnp.ndarray,
    cfg: PipelineConfig,
    *,
    matmul_dtype: str = "float32",
) -> jnp.ndarray:
    """GCC correlograms [..., P, 2K+1] via the MXU matmul chain.

    Numerically equivalent to ``xcorr.xcorr_fft`` (tested); with
    matmul_dtype='bfloat16' the DFT/synthesis matmuls run at 2x MXU rate with
    f32 accumulation."""
    prec = dft_prec(cfg)
    crop = crop_bins(cfg)
    if crop is not None:
        syn_c, syn_s = lag_synthesis_matrices_band(
            cfg.fft_length, cfg.max_shift, *crop, matmul_dtype)
        re, im = forward_spectra_band(
            frames, cfg.fft_length, *crop, matmul_dtype, prec)
    else:
        syn_c, syn_s = masked_synthesis(cfg, matmul_dtype)
        re, im = forward_spectra(frames, cfg.fft_length, matmul_dtype, prec)
    if cfg.band_auto:
        re, im = autoband_scale_reim(re, im, pairs, cfg)
    rr, jj = cross_power_reim(
        re, im, pairs, phat=cfg.phat, phat_eps=cfg.phat_eps,
        phat_beta=cfg.phat_beta)
    return lag_correlogram(rr, jj, jnp.asarray(syn_c), jnp.asarray(syn_s),
                           prec)
