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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(ei_ref, ej_ref,  # [1, chunk, M] one-hot selection, VMEM
            re_ref, im_ref, sync_ref, syns_ref, out_ref,
            rr_ref, jj_ref, *, tile_b, chunk, mm_dtype):
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
    out_ref[:] = corr.reshape(tile_b, chunk, -1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tile_b", "chunk", "interpret"))
def _call(re, im, sel_i, sel_j, cfg: PipelineConfig, tile_b, chunk,
          interpret):
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
        out_specs=pl.BlockSpec(
            (tile_b, chunk, l_pad), lambda bi, ci: (bi, ci, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk * tile_b, f), mm),
            pltpu.VMEM((chunk * tile_b, f), mm),
        ],
    )
    kernel = functools.partial(_kernel, tile_b=tile_b, chunk=chunk,
                               mm_dtype=mm)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, n_chunks * chunk, l_pad), jnp.float32),
        # larger tiles need more than the default 16 MB scoped-VMEM budget;
        # v5e has headroom well past it (the compiler rejects true overflows)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(sel_i, sel_j, re, im, jnp.asarray(sync), jnp.asarray(syns))
    return out[..., : 2 * k + 1]


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
    crop = mxu_fft.crop_bins(cfg)
    if crop is not None:
        re, im = mxu_fft.forward_spectra_band(
            frames, cfg.fft_length, *crop, "float32")
    else:
        re, im = mxu_fft.forward_spectra(frames, cfg.fft_length, "float32")
    if cfg.phat:
        re, im = mxu_fft.whiten_reim(re, im, cfg.phat_eps, cfg.phat_beta)
    m = frames.shape[1]
    p = pairs.shape[0]
    sel_i, sel_j = _selection_matrices(np.asarray(pairs), m, chunk)
    out = _call(re, im, jnp.asarray(sel_i), jnp.asarray(sel_j), cfg, tile_b,
                chunk, interpret)
    return out[:, :p, :]
