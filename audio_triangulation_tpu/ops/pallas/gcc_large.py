"""Large-array GCC Pallas kernel: pair-chunked cross-power + lag synthesis.

For arrays whose pair count makes the fused small-array kernel impossible
(64 mics -> 2016 pairs; the full [B, P, F] cross-power is tens of GB), the
XLA pair-blocked path (`mxu_fft.xcorr_mxu_pairblocked`) works but pays HBM
round-trips and `lax.map` overhead per chunk.  This kernel runs the chunk
loop as a Pallas grid dimension instead:

    grid = (batch_tiles, pair_chunks)
    per step: spectra tile [TB, M, F] (revisited across chunks, stays in
    VMEM) + this chunk's pair indices (scalar-prefetched into SMEM) ->
    cross-power rows in VMEM scratch -> one synthesis matmul -> correlogram
    block [TB, chunk, L_pad]

Pair indices are data (not trace constants), so one compiled kernel serves
every chunk; the static inner loop is over the chunk size only.
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


def _kernel(pairs_ref,  # this chunk's pair indices [1, chunk, 2] in SMEM
            re_ref, im_ref, sync_ref, syns_ref, out_ref,
            rr_ref, jj_ref, *, tile_b, chunk, phat, phat_eps):
    for k in range(chunk):  # static unroll over the chunk
        i = pairs_ref[0, k, 0]
        j = pairs_ref[0, k, 1]
        ri = re_ref[:, i, :]
        ii = im_ref[:, i, :]
        rj = re_ref[:, j, :]
        ij = im_ref[:, j, :]
        rr = ri * rj + ii * ij
        jj = ri * ij - ii * rj
        if phat:
            inv = 1.0 / (jnp.sqrt(rr * rr + jj * jj) + phat_eps)
            rr = rr * inv
            jj = jj * inv
        rr_ref[k * tile_b:(k + 1) * tile_b, :] = rr
        jj_ref[k * tile_b:(k + 1) * tile_b, :] = jj

    corr = (jnp.dot(rr_ref[:], sync_ref[:],
                    preferred_element_type=jnp.float32)
            + jnp.dot(jj_ref[:], syns_ref[:],
                      preferred_element_type=jnp.float32))
    out_ref[:] = corr.reshape(chunk, tile_b, -1).swapaxes(0, 1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tile_b", "chunk", "interpret"))
def _call(re, im, pairs_chunked, cfg: PipelineConfig, tile_b, chunk,
          interpret):
    b, m, f = re.shape
    n_chunks = pairs_chunked.shape[0]
    k = cfg.max_shift
    l_pad = _round_up(2 * k + 1, 128)
    sync, syns = mxu_fft.lag_synthesis_matrices(cfg.fft_length, k, "float32")
    sync = np.pad(sync, [(0, 0), (0, l_pad - sync.shape[1])])
    syns = np.pad(syns, [(0, 0), (0, l_pad - syns.shape[1])])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b // tile_b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, 2), lambda bi, ci: (ci, 0, 0),
                         memory_space=pltpu.SMEM),
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
            pltpu.VMEM((chunk * tile_b, f), jnp.float32),
            pltpu.VMEM((chunk * tile_b, f), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, tile_b=tile_b, chunk=chunk, phat=cfg.phat,
        phat_eps=cfg.phat_eps)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, n_chunks * chunk, l_pad), jnp.float32),
        interpret=interpret,
    )(pairs_chunked, re, im, jnp.asarray(sync), jnp.asarray(syns))
    return out[..., : 2 * k + 1]


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
    tile_b.  Matches `mxu_fft.xcorr_mxu_pairblocked` (tested)."""
    b = frames.shape[0]
    if b % tile_b != 0:
        raise ValueError(f"batch {b} % tile_b {tile_b} != 0")
    re, im = mxu_fft.forward_spectra(frames, cfg.fft_length, "float32")
    p = pairs.shape[0]
    pad = (-p) % chunk
    pairs_p = np.concatenate(
        [np.asarray(pairs, np.int32),
         np.zeros((pad, 2), np.int32)]) if pad else np.asarray(pairs, np.int32)
    pairs_chunked = jnp.asarray(pairs_p.reshape(-1, chunk, 2))
    out = _call(re, im, pairs_chunked, cfg, tile_b, chunk, interpret)
    return out[:, :p, :]
