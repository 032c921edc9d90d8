"""Large-array GCC Pallas kernel: pair-chunked cross-power + lag synthesis.

For arrays whose pair count makes the fused small-array kernel impossible
(64 mics -> 2016 pairs; the full [B, P, F] cross-power is tens of GB), the
XLA pair-blocked path (`mxu_fft.xcorr_mxu_pairblocked`) works but pays HBM
round-trips and `lax.map` overhead per chunk.  This kernel runs the chunk
loop as a Pallas grid dimension instead:

    grid = (batch_tiles, pair_chunks)
    per step: spectra tile [TB, M, F] (revisited across chunks, stays in
    VMEM) + this chunk's one-hot mic-selection matrices [chunk, M] ->
    per-pair spectra via selection MATMULS -> cross-power (+PHAT) on big
    contiguous tiles -> one synthesis matmul -> correlogram block
    [TB, chunk, L_pad]

The selection matmuls replace a per-pair dynamic-index loop (the round-1
design): extracting ``re[:, i]``/``re[:, j]`` with runtime indices forced 64
tiny [tile_b, F] VPU ops per step and ran at ~17% VPU utilization; one-hot
selection rides the MXU and leaves the VPU full [chunk, F] tiles
(measured ~1.8x on the whole kernel).  Selection matrices are data (built
from the pair list on host), so one compiled kernel serves every chunk.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import PipelineConfig
from .. import mxu_fft
from .. import xcorr as xcorr_ops


def _prep_spectra(frames, pairs, cfg: PipelineConfig):
    """Forward spectra + per-mic PHAT + (auto) band weighting shared by
    the large-array entry points.

    ``band_hz='auto'`` factorizes THROUGH the spectra: the 0/1 weight w
    multiplies the cross-power, and since w >= 0, scaling every mic's
    spectrum by sqrt(w) yields exactly w-weighted cross-powers — so the
    chunked kernel itself needs no band operand at all.  The pair-mean
    coherence that picks the band is estimated from an evenly-strided
    pair subsample (ops.xcorr.band_pair_subset): the band decision is a
    pair-average statistic, so 2016-pair arrays need not pay O(P F)
    smoothing for it."""
    crop = mxu_fft.crop_bins(cfg)
    if crop is not None:
        re, im = mxu_fft.forward_spectra_band(
            frames, cfg.fft_length, *crop, "float32")
    else:
        re, im = mxu_fft.forward_spectra(frames, cfg.fft_length, "float32")
    w_sqrt = None
    if cfg.band_auto:
        sub = xcorr_ops.band_pair_subset(np.asarray(pairs))
        w = xcorr_ops.auto_band_weight_reim(re, im, sub, cfg)  # [..., F]
        w_sqrt = jnp.sqrt(w)[..., None, :]
    if cfg.phat:
        re, im = mxu_fft.whiten_reim(re, im, cfg.phat_eps, cfg.phat_beta)
    if w_sqrt is not None:
        re, im = re * w_sqrt, im * w_sqrt
    return re, im


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(ei_ref, ej_ref,  # [1, chunk, M] one-hot selection, VMEM
            re_ref, im_ref, sync_ref, syns_ref, out_ref, aux_ref,
            rr_ref, jj_ref, *, tile_b, chunk, mm_dtype, num_lags=0,
            taper_denom=0.0, taper_enabled=True):
    # PHAT happens per mic in the wrapper (whiten_reim), ONCE per spectrum
    # instead of once per pair: 2016-pair arrays would otherwise rsqrt 31x
    # the data volume inside this loop.
    #
    # mm_dtype = bfloat16 runs the selection + synthesis matmuls in bf16
    # with f32 accumulation.  On v5e-lite this measured NEUTRAL (24.2 vs
    # 24.5 ms at 64 mics — its MXU runs f32 at bf16-class rate, consistent
    # with docs/PERFORMANCE.md), so float32 stays the default; the knob
    # exists for TPU generations where bf16 is 2x (v4/v5p).  Inputs are
    # tame for bf16: whitened spectra unit-modulus, selections exact 0/1.
    ei = ei_ref[0]  # [chunk, M]
    ej = ej_ref[0]
    for b in range(tile_b):  # static unroll over the small batch tile
        re_b = re_ref[b]  # [M, F]
        im_b = im_ref[b]
        ri = jnp.dot(ei, re_b, preferred_element_type=jnp.float32)
        ii = jnp.dot(ei, im_b, preferred_element_type=jnp.float32)
        rj = jnp.dot(ej, re_b, preferred_element_type=jnp.float32)
        ij = jnp.dot(ej, im_b, preferred_element_type=jnp.float32)
        rr = ri * rj + ii * ij  # [chunk, F]
        jj = ri * ij - ii * rj
        rr_ref[b * chunk:(b + 1) * chunk, :] = rr.astype(mm_dtype)
        jj_ref[b * chunk:(b + 1) * chunk, :] = jj.astype(mm_dtype)

    corr = (jnp.dot(rr_ref[:], sync_ref[:],
                    preferred_element_type=jnp.float32)
            + jnp.dot(jj_ref[:], syns_ref[:],
                      preferred_element_type=jnp.float32))
    if aux_ref is None:
        out_ref[:] = corr.reshape(tile_b, chunk, -1)
        return

    # ---- in-kernel peaks + taper on the VMEM-resident correlograms ----
    # The external masked reductions (best_lag/subsample_peak/
    # peak_confidence + peak_taper) re-read the [B, P, L] f32 correlogram
    # from HBM three times — 2.03 ms of the 8.76 ms config-5b device step
    # (r3 trace).  Same gather-free one-hot math as gcc_kernel.stage_out;
    # psr is computed on the RAW correlogram, the written output is
    # TAPERED (reference correlations.c:26-33 semantics).
    rows_n = tile_b * chunk
    l_pad = corr.shape[-1]
    k = (num_lags - 1) // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows_n, l_pad), 1)
    valid = lane < num_lags
    neg = jnp.float32(-3e38)
    masked = jnp.where(valid, corr, neg)
    v0 = jnp.max(masked, axis=-1, keepdims=True)
    is_max = (masked == v0) & valid
    big = jnp.where(is_max, lane, l_pad)
    idx = jnp.min(big, axis=-1, keepdims=True)  # first max wins
    cm = jnp.sum(jnp.where(lane == idx - 1, corr, 0.0), -1, keepdims=True)
    cp = jnp.sum(jnp.where(lane == idx + 1, corr, 0.0), -1, keepdims=True)
    den = cm - 2.0 * v0 + cp
    interior = (idx >= 1) & (idx <= num_lags - 2)
    delta = jnp.where(
        (jnp.abs(den) > 1e-20) & interior, 0.5 * (cm - cp) / den, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    shift = (idx - k).astype(jnp.float32)
    tdoa = shift + delta
    if taper_enabled:  # cfg.taper_enabled, matching the external path
        d = (lane - idx).astype(jnp.float32)
        tapered = corr * jnp.exp(-(d * d) / jnp.float32(taper_denom))
    else:
        tapered = corr
    outside = (jnp.abs(lane - idx) > 3) & valid
    side = jnp.max(jnp.where(outside, corr, neg), axis=-1, keepdims=True)
    psr = jnp.abs(v0) / jnp.maximum(jnp.abs(side), 1e-20)

    out_ref[:] = tapered.reshape(tile_b, chunk, l_pad)
    # aux: 128 lanes, 0=shift 1=tdoa 2=peak 3=psr (broadcast-select from
    # the [rows, 1] columns — no sublane->lane relayout)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (rows_n, 128), 1)
    aux = (jnp.where(lane8 == 0, shift, 0.0)
           + jnp.where(lane8 == 1, tdoa, 0.0)
           + jnp.where(lane8 == 2, v0, 0.0)
           + jnp.where(lane8 == 3, psr, 0.0))
    aux_ref[:] = aux.reshape(tile_b, chunk, 128)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tile_b", "chunk", "interpret", "with_peaks"))
def _call(re, im, sel_i, sel_j, cfg: PipelineConfig, tile_b, chunk,
          interpret, with_peaks=False):
    b, m, f = re.shape
    n_chunks = sel_i.shape[0]
    k = cfg.max_shift
    l_pad = _round_up(2 * k + 1, 128)
    mm = jnp.dtype(cfg.matmul_dtype)
    crop = mxu_fft.crop_bins(cfg)
    if crop is not None:
        sync, syns = mxu_fft.lag_synthesis_matrices_band(
            cfg.fft_length, k, *crop, cfg.matmul_dtype)
    else:
        sync, syns = mxu_fft.masked_synthesis(cfg, cfg.matmul_dtype)
    sync = np.pad(sync, [(0, 0), (0, l_pad - sync.shape[1])])
    syns = np.pad(syns, [(0, 0), (0, l_pad - syns.shape[1])])
    re = re.astype(mm)
    im = im.astype(mm)
    sel_i = sel_i.astype(mm)  # 0/1: exact in bf16
    sel_j = sel_j.astype(mm)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b // tile_b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, m), lambda bi, ci: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, m), lambda bi, ci: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, m, f), lambda bi, ci: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, m, f), lambda bi, ci: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sync
            pl.BlockSpec(memory_space=pltpu.VMEM),  # syns
        ],
        out_specs=(
            (pl.BlockSpec((tile_b, chunk, l_pad), lambda bi, ci: (bi, ci, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((tile_b, chunk, 128), lambda bi, ci: (bi, ci, 0),
                          memory_space=pltpu.VMEM))
            if with_peaks else
            pl.BlockSpec((tile_b, chunk, l_pad), lambda bi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((chunk * tile_b, f), mm),
            pltpu.VMEM((chunk * tile_b, f), mm),
        ],
    )
    kernel = functools.partial(
        _kernel, tile_b=tile_b, chunk=chunk, mm_dtype=mm,
        num_lags=2 * k + 1, taper_denom=cfg.taper_denom,
        taper_enabled=cfg.taper_enabled)
    if not with_peaks:
        def kernel(ei, ej, re_, im_, sc, ss, out, rr, jj,  # noqa: F811
                   _k=kernel):
            _k(ei, ej, re_, im_, sc, ss, out, None, rr, jj)
    out_shape = jax.ShapeDtypeStruct((b, n_chunks * chunk, l_pad),
                                     jnp.float32)
    if with_peaks:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, n_chunks * chunk, 128),
                                          jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # larger tiles need more than the default 16 MB scoped-VMEM budget;
        # v5e has headroom well past it (the compiler rejects true overflows)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(sel_i, sel_j, re, im, jnp.asarray(sync), jnp.asarray(syns))
    if with_peaks:
        corr, aux = outs
        return (corr[..., : 2 * k + 1],
                aux[..., 0].astype(jnp.int32),  # integer best shift
                aux[..., 1],                    # sub-sample tdoa (lags)
                aux[..., 2],                    # raw peak value
                aux[..., 3])                    # peak-to-sidelobe ratio
    return outs[..., : 2 * k + 1]


def _selection_matrices(pairs: np.ndarray, n_mics: int, chunk: int):
    """One-hot [n_chunks, chunk, M] float32 matrices selecting each pair's
    (i, j) mic rows; padded pairs select mic 0 (their correlograms are
    sliced off by the caller)."""
    p = pairs.shape[0]
    pad = (-p) % chunk
    pairs_p = np.concatenate(
        [np.asarray(pairs, np.int64),
         np.zeros((pad, 2), np.int64)]) if pad else np.asarray(pairs, np.int64)
    eye = np.eye(n_mics, dtype=np.float32)
    sel_i = eye[pairs_p[:, 0]].reshape(-1, chunk, n_mics)
    sel_j = eye[pairs_p[:, 1]].reshape(-1, chunk, n_mics)
    return sel_i, sel_j


def xcorr_large(
    frames: jnp.ndarray,
    pairs: np.ndarray,
    cfg: PipelineConfig,
    *,
    tile_b: int = 4,
    chunk: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Correlograms [B, P, 2K+1] for large pair counts via the chunked Pallas
    kernel.  frames must already be conditioned (windowed); B must divide by
    tile_b.  Matches `mxu_fft.xcorr_mxu_pairblocked` (tested).

    ``cfg.matmul_dtype`` = 'bfloat16' runs the selection and synthesis
    matmuls in bf16 with f32 accumulation — measured NEUTRAL on v5e-lite
    (f32 MXU already at bf16-class rate there) but available for chips
    where bf16 is 2x.  Tile size (tile_b 4-16, chunk 64-256) is also
    measured neutral (23.6-24.1 ms): the kernel is bound by Mosaic's
    serialization of the VPU cross-power between the two matmul stages,
    the same ceiling as the fused small-array kernel.

    Negative result for the record: a phase-difference form (per-mic PHAT
    makes spectra unit-modulus, so rr/jj = cos/sin(phi_j - phi_i) needs
    only ONE +-1 selection matmul on phases) was built and measured 2x
    SLOWER (44 ms vs 23 ms at 64 mics): the 2 * P * F * B cos/sin
    transcendentals dominate everything the saved matmuls buy back."""
    b = frames.shape[0]
    if b % tile_b != 0:
        raise ValueError(f"batch {b} % tile_b {tile_b} != 0")
    re, im = _prep_spectra(frames, pairs, cfg)
    m = frames.shape[1]
    p = pairs.shape[0]
    sel_i, sel_j = _selection_matrices(np.asarray(pairs), m, chunk)
    out = _call(re, im, jnp.asarray(sel_i), jnp.asarray(sel_j), cfg, tile_b,
                chunk, interpret)
    return out[:, :p, :]


def xcorr_large_peaks(
    frames: jnp.ndarray,
    pairs: np.ndarray,
    cfg: PipelineConfig,
    *,
    tile_b: int = 4,
    chunk: int = 64,
    interpret: bool = False,
):
    """Large-array fused GCC + in-kernel peaks: conditioned frames
    [B, M, N] -> (TAPERED correlograms [B, P, 2K+1], best shifts int32
    [B, P], sub-sample TDOAs [B, P] in lags, raw peak values [B, P],
    psr [B, P]).

    The peak/taper stage runs on the VMEM-resident correlograms inside
    the kernel instead of three external HBM re-reads of the [B, P, L]
    f32 tensor.  Math identical to the external ops (same one-hot
    reductions as gcc_kernel; tested bit-equal in interpret mode).

    Measured SLOWER than the external path on v5e-lite (r3 config-5b
    trace: 9.50 vs 8.76 ms device per 256-frame batch — Mosaic serializes
    the ~15 VPU peak passes per grid step, +1.23 ms in-kernel, more than
    the ~1.6 ms of external HBM re-reads saved), so localize_frames does
    NOT route here by default; kept for chips whose schedulers overlap
    VPU with MXU."""
    b = frames.shape[0]
    if b % tile_b != 0:
        raise ValueError(f"batch {b} % tile_b {tile_b} != 0")
    re, im = _prep_spectra(frames, pairs, cfg)
    m = frames.shape[1]
    p = pairs.shape[0]
    sel_i, sel_j = _selection_matrices(np.asarray(pairs), m, chunk)
    corr, shifts, tdoa, peak, psr = _call(
        re, im, jnp.asarray(sel_i), jnp.asarray(sel_j), cfg, tile_b,
        chunk, interpret, with_peaks=True)
    return (corr[:, :p, :], shifts[:, :p], tdoa[:, :p], peak[:, :p],
            psr[:, :p])
