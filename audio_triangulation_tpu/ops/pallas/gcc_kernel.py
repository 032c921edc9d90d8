"""Fused GCC Pallas kernel: the whole per-frame hot chain in one VMEM pass.

The reference's per-event compute burst (``src/sample_compute.h:105-122``:
DC-remove -> gain -> window -> cross-correlate) maps here to a single Pallas
kernel over a tile of frames:

    frames tile [TB, M, N]  --(VMEM)-->
      DC-remove + gain + window            (VPU)
      Re/Im DFT = x @ cos / x @ -sin       (MXU, weights resident in VMEM)
      per-pair cross-power (+ PHAT)        (VPU)
      correlogram = Re @ synC + Im @ synS  (MXU)
    -> correlograms [TB, P, L_pad]

Unlike the unfused ops.mxu_fft path, the [B, M, F] spectra and [B, P, F]
cross-power never touch HBM — per frame only the 16 KB of PCM comes in and
~3 KB of correlogram goes out.  The DFT/synthesis matrices stay resident in
VMEM across the whole grid.

Falls back gracefully: tests run it with ``interpret=True`` on CPU; the
wrapper in ops.mxu_fft/models dispatches to it only when shapes fit VMEM.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gcc_kernel(frames_ref, window_ref, cos_ref, msin_ref, sync_ref,
                syns_ref, out_ref, aux_ref, onehot_ref=None, cell_ref=None,
                *, pairs, phat, phat_eps, n, tile_b, n_mics, num_lags,
                taper_denom, with_peaks, nyq_fold, inv_fft_len, srp_g=0,
                compact=False, sub_tiles=1, mxu_precision=None):
    """One grid step: frames_ref [TB, M, N] -> out_ref [TB, P, L_pad]
    (tapered correlograms) and, when with_peaks, aux_ref [TB, P, L_pad]
    carrying lane 0 = integer best shift, lane 1 = sub-sample TDOA, lane 2 =
    peak value.

    With ``nyq_fold`` the DFT matrices carry only F-1 = fft_length/2 bins —
    a full 128-lane multiple, so Mosaic wastes no MXU columns / VPU lanes on
    padding (513 would pad to 640) — and the Nyquist bin is reconstructed
    exactly on the VPU: at f = L/2 the DFT row is cos(pi n) = (-1)^n with
    sin = 0, so Im X = 0, the pair cross-power is the real product, and the
    lag-synthesis row is cos(pi lag)/L = alternating +-1/L — a rank-1
    broadcast add.

    With ``sub_tiles`` > 1 the batch tile is processed as a software
    pipeline: sub-tile s+1's conditioning + DFT (MXU-heavy) is emitted
    before sub-tile s's cross-power / peak stages (VPU-heavy), giving the
    Mosaic scheduler adjacent independent chains for the two units to
    overlap.  Per-row math is identical to sub_tiles=1 (results equal to
    float tolerance; matmul shapes differ, so contraction order may)."""
    sb = tile_b // sub_tiles
    n_pairs = len(pairs)
    k_half = (num_lags - 1) // 2
    l_pad = sync_ref.shape[-1]
    # whiten per mic iff M >= 3 (ops.xcorr.phat_per_mic; 2-mic arrays have
    # P = 1 < M, so per-pair touches less data there)
    per_mic = phat and n_mics >= 3

    if nyq_fold:
        # Nyquist-bin helpers shared by all sub-tiles:
        # alternating time-domain row ((-1)^n) and the Nyquist lag-synthesis
        # row cos(pi (lane - K)) / L (Hermitian weight 1)
        alt_n = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % 2 == 0,
            jnp.float32(1.0), jnp.float32(-1.0))
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, l_pad), 1)
        alt_l = jnp.where((lane_i - k_half) % 2 == 0,
                          jnp.float32(inv_fft_len),
                          jnp.float32(-inv_fft_len))

    def stage_front(s):
        """Conditioning + DFT (+ whitening, Nyquist) for sub-tile s."""
        x = frames_ref[s * sb:(s + 1) * sb].astype(jnp.float32)
        x = x.reshape(sb * n_mics, n)
        # conditioning: DC removal + gain folded into the window vector
        mean = jnp.mean(x, axis=-1, keepdims=True)
        x = (x - mean) * window_ref[:]
        re = jnp.dot(x, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=mxu_precision)
        im = jnp.dot(x, msin_ref[:], preferred_element_type=jnp.float32,
                     precision=mxu_precision)
        if per_mic:
            # per-mic PHAT whitening (the pair weight 1/|X_i X_j*|
            # factorizes, see ops.xcorr.whiten_spectra): M rows of rsqrt
            # instead of P, and the per-pair stage is pure multiplies
            inv = jax.lax.rsqrt(re * re + im * im + phat_eps * phat_eps)
            re = re * inv
            im = im * inv
        re_nyq = None
        if nyq_fold:
            # Nyquist-bin Re via alternating sum (Im is exactly 0 there);
            # keep lane dim = 1 throughout (Mosaic can't cast lane widths)
            re_nyq = jnp.sum(x * alt_n, axis=-1, keepdims=True)  # [SB*M, 1]
            if per_mic:
                re_nyq = re_nyq * jax.lax.rsqrt(
                    re_nyq * re_nyq + phat_eps * phat_eps)
            re_nyq = re_nyq.reshape(sb, n_mics, 1)
        f = re.shape[-1]
        return (re.reshape(sb, n_mics, f), im.reshape(sb, n_mics, f), re_nyq)

    def stage_cross(front):
        """Per-pair cross-power (VPU) for one sub-tile."""
        re, im, re_nyq = front
        f = re.shape[-1]
        rrs, jjs, nyq_corrs = [], [], []
        for (i, j) in pairs:  # static unroll over the (small) pair list
            rr = re[:, i, :] * re[:, j, :] + im[:, i, :] * im[:, j, :]
            jj = re[:, i, :] * im[:, j, :] - im[:, i, :] * re[:, j, :]
            if phat and not per_mic:  # 2-mic: whiten the single pair
                inv = jax.lax.rsqrt(rr * rr + jj * jj + phat_eps * phat_eps)
                rr = rr * inv
                jj = jj * inv
            rrs.append(rr)
            jjs.append(jj)
            if nyq_fold:
                rrn = re_nyq[:, i, :] * re_nyq[:, j, :]  # [SB, 1]; Im == 0
                if phat and not per_mic:
                    rrn = rrn * jax.lax.rsqrt(
                        rrn * rrn + phat_eps * phat_eps)
                nyq_corrs.append(rrn * alt_l)  # [SB, l_pad]
        rr = jnp.stack(rrs, axis=1).reshape(sb * n_pairs, f)
        jj = jnp.stack(jjs, axis=1).reshape(sb * n_pairs, f)
        return rr, jj, nyq_corrs

    def stage_synth(rr, jj, nyq_corrs):
        """Lag synthesis (MXU) for one sub-tile."""
        corr = (jnp.dot(rr, sync_ref[:], preferred_element_type=jnp.float32,
                        precision=mxu_precision)
                + jnp.dot(jj, syns_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=mxu_precision))
        if nyq_fold:
            corr = corr + jnp.stack(nyq_corrs, axis=1).reshape(
                sb * n_pairs, l_pad)
        return corr

    def lanes_from_rows(col):
        """[SB*P, 1] per-(frame,pair) column -> [SB, P] lanes (Mosaic's
        native sublane->lane relayout)."""
        return col.reshape(sb, n_pairs)

    def stage_out(s, corr):
        """Peaks + taper (VPU) and output writes for one sub-tile."""
        rows = slice(s * sb, (s + 1) * sb)
        if not with_peaks:
            out_ref[rows] = corr.reshape(sb, n_pairs, l_pad)
            return
        # ---- peak handling fused in-kernel (gather-free one-hot sums) ----
        k = k_half
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (sb * n_pairs, l_pad), 1)
        valid = lane < num_lags
        neg = jnp.float32(-3e38)
        masked = jnp.where(valid, corr, neg)
        # argmax (first max wins, matching jnp.argmax / the ref's > scan)
        v0 = jnp.max(masked, axis=-1, keepdims=True)
        is_max = (masked == v0) & valid
        big = jnp.where(is_max, lane, l_pad)
        idx = jnp.min(big, axis=-1, keepdims=True)  # [rows, 1]
        # neighbors via one-hot sums (gather-free)
        cm = jnp.sum(jnp.where(lane == idx - 1, corr, 0.0), -1,
                     keepdims=True)
        cp = jnp.sum(jnp.where(lane == idx + 1, corr, 0.0), -1,
                     keepdims=True)
        den = cm - 2.0 * v0 + cp
        interior = (idx >= 1) & (idx <= num_lags - 2)
        delta = jnp.where(
            (jnp.abs(den) > 1e-20) & interior, 0.5 * (cm - cp) / den, 0.0)
        delta = jnp.clip(delta, -0.5, 0.5)
        shift = (idx - k).astype(jnp.float32)
        tdoa = shift + delta

        # Gaussian taper around the integer peak (correlations.c:26-33)
        d = (lane - idx).astype(jnp.float32)
        tapered = corr * jnp.exp(-(d * d) / jnp.float32(taper_denom))

        # peak-to-sidelobe confidence on the RAW correlogram (before
        # tapering, which would manufacture a dominant peak even for noise)
        outside = (jnp.abs(lane - idx) > 3) & valid
        side = jnp.max(jnp.where(outside, corr, neg), axis=-1,
                       keepdims=True)
        psr = jnp.abs(v0) / jnp.maximum(jnp.abs(side), 1e-20)

        out_ref[rows] = tapered.reshape(sb, n_pairs, l_pad)

        if compact:
            # ---- Mode B: SRP scoring + grid argmax INSIDE the kernel ----
            # The r3 headline trace showed the kernel boundary (full-lane
            # aux relayout copies + bf16 cast-slice-reshape + the external
            # scoring fusion) costing ~30% of device time.  Here the
            # tapered correlograms never leave VMEM: per-pair bf16 matmuls
            # against the resident steering matrix accumulate the SRP
            # scores, the grid argmax runs on the VPU, and everything the
            # solver path needs leaves as ONE compact [SB, 128] row:
            # lanes [0:P) shift | [P:2P) tdoa | [2P:3P) peak | [3P:4P) psr
            # | [4P] argmax cell | [4P+1] max score.
            tp = tapered.reshape(sb, n_pairs, l_pad)
            acc = None
            for pi in range(n_pairs):
                part = jnp.dot(
                    tp[:, pi, :].astype(jnp.bfloat16), onehot_ref[pi],
                    preferred_element_type=jnp.float32)  # [SB, G]
                acc = part if acc is None else acc + part
            glane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
            gmask = glane < srp_g
            smax = jnp.max(jnp.where(gmask, acc, neg), -1, keepdims=True)
            sidx = jnp.min(
                jnp.where((acc == smax) & gmask, glane, srp_g),
                -1, keepdims=True)  # first max, matching jnp.argmax

            packed = jnp.concatenate(
                [lanes_from_rows(shift), lanes_from_rows(tdoa),
                 lanes_from_rows(v0), lanes_from_rows(psr),
                 sidx.astype(jnp.float32), smax,
                 jnp.zeros((sb, 128 - 4 * n_pairs - 2), jnp.float32)],
                axis=1)  # [SB, 128]
            cell_ref[rows] = packed
            return

        aux = jnp.where(lane == 0, shift, 0.0)
        aux = aux + jnp.where(lane == 1, tdoa, 0.0)
        aux = aux + jnp.where(lane == 2, v0, 0.0)
        aux = aux + jnp.where(lane == 3, psr, 0.0)
        aux_ref[rows] = aux.reshape(sb, n_pairs, l_pad)

    # software-pipelined emission: front(s+1) ahead of cross/synth/out(s)
    front = stage_front(0)
    for s in range(sub_tiles):
        nxt = stage_front(s + 1) if s + 1 < sub_tiles else None
        rr, jj, nyq_corrs = stage_cross(front)
        corr = stage_synth(rr, jj, nyq_corrs)
        stage_out(s, corr)
        front = nxt


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "pairs_tuple", "tile_b", "interpret",
                     "with_peaks"))
def _fused_gcc_call(frames, window, cfg: PipelineConfig, pairs_tuple,
                    tile_b: int, interpret: bool, with_peaks: bool,
                    srp_onehot=None):
    b, m, n = frames.shape
    pairs = pairs_tuple
    p = len(pairs)
    k = cfg.max_shift
    num_lags = 2 * k + 1
    l_pad = _round_up(num_lags, 128)

    crop = mxu_fft.crop_bins(cfg)
    if crop is not None:
        # band-crop fast path: only in-band bins enter the kernel at all
        # (identical correlograms to the masked full-band form); no
        # Nyquist fold — the cropped width is already small
        cos, msin = mxu_fft.dft_matrices_band(
            n, cfg.fft_length, *crop, "float32")
        sync, syns = mxu_fft.lag_synthesis_matrices_band(
            cfg.fft_length, k, *crop, "float32")
        nyq_in_band = True  # unused: no fold
        nyq_fold = False
    else:
        cos, msin = mxu_fft.dft_matrices(n, cfg.fft_length, "float32")
        sync, syns = mxu_fft.lag_synthesis_matrices(
            cfg.fft_length, k, "float32")
        # band limit (cfg.band_hz): zero out-of-band synthesis rows — free
        # at run time; the Nyquist bin's in-kernel reconstruction is
        # disabled via inv_fft_len = 0 below when the band excludes it
        mask = xcorr_ops.band_mask(cfg)
        nyq_in_band = True
        if mask is not None:
            sync = sync * mask[:, None]
            syns = syns * mask[:, None]
            nyq_in_band = bool(mask[-1])
        # Nyquist fold: drop the last spectral column/row (F = L/2+1 ->
        # L/2, a 128 multiple, so no Mosaic lane padding) and reconstruct
        # the bin exactly inside the kernel (see _gcc_kernel docstring)
        nyq_fold = cfg.fft_length % 2 == 0
        if nyq_fold:
            cos, msin = cos[:, :-1], msin[:, :-1]
            sync, syns = sync[:-1], syns[:-1]
    # pad lag axis to the 128-lane boundary
    sync = np.pad(sync, [(0, 0), (0, l_pad - sync.shape[1])])
    syns = np.pad(syns, [(0, 0), (0, l_pad - syns.shape[1])])
    gain = 256.0 if cfg.normalize_mode == "shift8" else 1.0
    win = window.astype(jnp.float32)
    if not cfg.window_enabled:
        # parity with the unfused path: conditioning skips the window
        win = jnp.ones_like(win)
    win = win * gain

    grid = (b // tile_b,)
    sub_tiles = cfg.fused_sub_tiles
    if tile_b % sub_tiles != 0:
        sub_tiles = 1
    # compact peak outputs: only with in-kernel SRP (Mode B).  Measured on
    # v5e-lite (r3): packing the per-pair scalars into one 128-lane row
    # costs ~1 us/tile of Mosaic sublane->lane relayout — MORE than the
    # full-lane aux tensor's relayout copies cost outside the kernel
    # (device 3.29 vs 2.95 ms/iter on the headline config), so the classic
    # aux output stays the default.
    # compact == Mode B (in-kernel SRP + peaks packed into one [SB, 128]
    # row).  A compact-WITHOUT-scoring variant was measured and removed:
    # the sublane->lane relayout of the packed row costs more than the
    # full-lane aux tensor's relayout copies outside (3.29 vs 2.95 ms/iter)
    compact = with_peaks and 4 * p + 2 <= 128 and srp_onehot is not None
    kernel = functools.partial(
        _gcc_kernel, pairs=pairs, phat=cfg.phat, phat_eps=cfg.phat_eps,
        n=n, tile_b=tile_b, n_mics=m, num_lags=num_lags,
        taper_denom=cfg.taper_denom, with_peaks=with_peaks,
        mxu_precision=(jax.lax.Precision.HIGHEST
                       if cfg.dft_precision == "highest" else None),
        nyq_fold=nyq_fold,
        inv_fft_len=(1.0 / cfg.fft_length) if nyq_in_band else 0.0,
        sub_tiles=sub_tiles,
        srp_g=int(srp_onehot.shape[-1]) if compact else 0,
        compact=compact)
    if not with_peaks:
        def kernel(*refs, _k=kernel):  # noqa: F811 - drop the aux ref slot
            _k(*refs, None)
    elif compact:
        # refs: ...inputs(incl. onehot), corr, compact row
        def kernel(f, w, c, ms, sc, ss, oh, corr, cell,  # noqa: F811
                   _k=kernel):
            _k(f, w, c, ms, sc, ss, corr, None, onehot_ref=oh,
               cell_ref=cell)

    block = pl.BlockSpec((tile_b, p, l_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, p, l_pad), jnp.float32)
    in_specs = [
        pl.BlockSpec((tile_b, m, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # window
        pl.BlockSpec(memory_space=pltpu.VMEM),  # cos
        pl.BlockSpec(memory_space=pltpu.VMEM),  # msin
        pl.BlockSpec(memory_space=pltpu.VMEM),  # sync
        pl.BlockSpec(memory_space=pltpu.VMEM),  # syns
    ]
    inputs = [frames, win, jnp.asarray(cos), jnp.asarray(msin),
              jnp.asarray(sync), jnp.asarray(syns)]
    if compact:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # onehot
        inputs.append(srp_onehot.astype(jnp.bfloat16))
        cell_block = pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        out_specs = (block, cell_block)
        out_shapes = (out_shape,
                      jax.ShapeDtypeStruct((b, 128), jnp.float32))
    elif with_peaks:
        out_specs, out_shapes = (block, block), (out_shape, out_shape)
    else:
        out_specs, out_shapes = block, out_shape
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # big tiles need more than the default 16 MB scoped-VMEM budget;
        # the batch-tile grid dimension is embarrassingly parallel (every
        # tile writes a disjoint output block), so tell Mosaic it may
        # overlap/reorder grid steps (cross-step DMA/compute pipelining)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*inputs)

    if not with_peaks:
        return outs[..., :num_lags]
    if compact:
        corr_t, packed = outs
        return (corr_t[..., :num_lags],
                packed[:, 0:p].astype(jnp.int32),     # best shift
                packed[:, p:2 * p],                   # sub-sample tdoa
                packed[:, 2 * p:3 * p],               # peak value
                packed[:, 3 * p:4 * p],               # psr
                packed[:, 4 * p].astype(jnp.int32),   # SRP argmax cell
                packed[:, 4 * p + 1])                 # SRP max score
    corr_t, aux = outs
    return (corr_t[..., :num_lags],
            aux[..., 0].astype(jnp.int32),  # integer best shift
            aux[..., 1],  # sub-sample tdoa (lags)
            aux[..., 2],  # peak value
            aux[..., 3])  # peak-to-sidelobe ratio (raw correlogram)


def fused_gcc(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    pairs: np.ndarray,
    cfg: PipelineConfig,
    *,
    tile_b: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Conditioned (untapered) correlograms [B, P, 2K+1] straight from raw
    frames [B, M, N] (includes DC removal, gain and windowing).

    B must be a multiple of tile_b (pad the batch if needed)."""
    b = frames.shape[0]
    if b % tile_b != 0:
        raise ValueError(f"batch {b} not a multiple of tile_b {tile_b}")
    pairs_tuple = tuple(tuple(int(v) for v in row) for row in np.asarray(pairs))
    return _fused_gcc_call(
        frames, window, cfg, pairs_tuple, tile_b, interpret, False)


def fused_gcc_peaks(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    pairs: np.ndarray,
    cfg: PipelineConfig,
    *,
    tile_b: int = 64,
    interpret: bool = False,
    srp_onehot: jnp.ndarray | None = None,
):
    """Full fused front half of the pipeline: raw frames [B, M, N] ->
    (tapered correlograms [B, P, L], best shifts int32 [B, P],
    sub-sample TDOAs [B, P] in lags, peak values [B, P], psr [B, P]).

    The taper, argmax and parabolic interpolation run inside the kernel on
    VMEM-resident correlograms using gather-free one-hot reductions.

    ``srp_onehot`` ([P, L_pad, G] steering matrix, zero rows at lag
    padding) additionally runs SRP scoring (per-pair bf16 matmuls against
    the VMEM-resident matrix) AND the grid argmax inside the kernel —
    the tapered correlograms never leave VMEM for scoring, and the only
    extra HBM traffic is one compact [B, 128] row (r3 trace: the external
    scoring path cost ~30% of headline device time in boundary copies and
    fusions).  Two more values are returned: argmax cell int32 [B] and
    max score f32 [B]."""
    b = frames.shape[0]
    if b % tile_b != 0:
        raise ValueError(f"batch {b} not a multiple of tile_b {tile_b}")
    pairs_tuple = tuple(tuple(int(v) for v in row) for row in np.asarray(pairs))
    return _fused_gcc_call(
        frames, window, cfg, pairs_tuple, tile_b, interpret, True,
        srp_onehot)


def fused_gcc_fits_vmem(n_mics: int, n: int, cfg: PipelineConfig,
                        tile_b: int = 64,
                        vmem_budget: int = 14 * 1024 * 1024) -> bool:
    """Conservative VMEM feasibility estimate for the fused kernel."""
    crop = mxu_fft.crop_bins(cfg)
    if crop is not None:
        # band-crop: only in-band bins enter the kernel (Mosaic pads the
        # lane dim to 128)
        f = max(128, _round_up(crop[1] - crop[0], 128))
    else:
        # Nyquist fold drops the odd last bin (see _gcc_kernel)
        f = (cfg.fft_length // 2 if cfg.fft_length % 2 == 0
             else cfg.fft_length // 2 + 1)
    p = n_mics * (n_mics - 1) // 2
    l_pad = _round_up(cfg.num_lags, 128)
    weights = 4 * (2 * n * f + 2 * f * l_pad + n)
    acts = 4 * (tile_b * n_mics * n + 4 * tile_b * n_mics * f
                + 2 * tile_b * p * f + tile_b * p * l_pad)
    return weights + acts <= vmem_budget


def pick_tile_b(n_mics: int, n: int, cfg: PipelineConfig,
                preferred: int = 64) -> int | None:
    """Largest batch tile (preferred, then halves down to 8) that fits VMEM;
    None when even the smallest doesn't (use the unfused/large-array path)."""
    tb = preferred
    while tb >= 8:
        if fused_gcc_fits_vmem(n_mics, n, cfg, tb):
            return tb
        tb //= 2
    return None
