#!/usr/bin/env python3
"""Measure pltpu.emit_pipeline grid-level double buffering on the fused
GCC kernel (real TPU).

The shipping kernel uses the classic pallas_call grid over batch tiles
with ``dimension_semantics=("parallel",)`` — Mosaic double-buffers the
block DMAs across grid steps automatically.  This probe re-expresses the
SAME kernel body as a single-grid-step pallas_call whose body drives a
manual inner pipeline via ``pltpu.emit_pipeline`` over the batch tiles
(frames streamed HBM->VMEM by the pipeline helper, weights VMEM-resident
across the whole run).  If Mosaic's automatic cross-step pipelining were
leaving DMA/compute overlap on the table, this variant would be faster.

Methodology: on-device profiler totals per iteration (immune to the axon
tunnel's dispatch caching and RTT), identical inputs and math to the
shipping kernel (outputs asserted equal to float tolerance).

Usage: python tools/emit_pipeline_probe.py [--batch 16384] [--iters 30]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.core.config import PipelineConfig
    from audio_triangulation_tpu.ops import mxu_fft, window as window_ops
    from audio_triangulation_tpu.ops.pallas import gcc_kernel
    from audio_triangulation_tpu.utils import synth

    cfg = PipelineConfig(phat=True, fft_pad_mode="circular",
                         band_hz=(800.0, 6000.0), band_crop=True)
    mics = geometry.square_array(0.3)
    pairs = geometry.mic_pairs(4)
    pairs_tuple = tuple(tuple(int(v) for v in row) for row in pairs)
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frame = synth.synth_scene(src, mics, noise_rms=0.01, seed=0)
    b = args.batch
    m, n = 4, 1024
    p = len(pairs_tuple)
    frames = jnp.asarray(
        np.broadcast_to(frame, (b, m, n)).astype(np.float32))
    win = window_ops.window_for(cfg)
    tile = gcc_kernel.pick_tile_b(m, n, cfg, cfg.fused_tile_b)
    k = cfg.max_shift
    num_lags = 2 * k + 1
    l_pad = gcc_kernel._round_up(num_lags, 128)
    print(f"tile_b={tile} batch={b} pairs={p}")

    # weights: identical prep to _fused_gcc_call's band-crop path
    crop = mxu_fft.crop_bins(cfg)
    cos, msin = mxu_fft.dft_matrices_band(n, cfg.fft_length, *crop,
                                          "float32")
    sync, syns = mxu_fft.lag_synthesis_matrices_band(
        cfg.fft_length, k, *crop, "float32")
    sync = np.pad(sync, [(0, 0), (0, l_pad - sync.shape[1])])
    syns = np.pad(syns, [(0, 0), (0, l_pad - syns.shape[1])])
    gain = 256.0 if cfg.normalize_mode == "shift8" else 1.0
    wvec = win.astype(jnp.float32) * gain

    body = functools.partial(
        gcc_kernel._gcc_kernel, pairs=pairs_tuple, phat=cfg.phat,
        phat_eps=cfg.phat_eps, n=n, tile_b=tile, n_mics=m,
        num_lags=num_lags, taper_denom=cfg.taper_denom, with_peaks=True,
        nyq_fold=False, inv_fft_len=0.0, sub_tiles=1, mxu_precision=None)

    def outer(frames_hbm, w_ref, cos_ref, msin_ref, sync_ref, syns_ref,
              out_hbm, aux_hbm):
        def inner(frames_ref, out_ref, aux_ref):
            body(frames_ref, w_ref, cos_ref, msin_ref, sync_ref, syns_ref,
                 out_ref, aux_ref)

        pipe = pltpu.emit_pipeline(
            inner,
            grid=(b // tile,),
            in_specs=[pl.BlockSpec((tile, m, n), lambda i: (i, 0, 0))],
            out_specs=[pl.BlockSpec((tile, p, l_pad), lambda i: (i, 0, 0)),
                       pl.BlockSpec((tile, p, l_pad), lambda i: (i, 0, 0))],
        )
        pipe(frames_hbm, out_hbm, aux_hbm)

    @jax.jit
    def pipelined(x):
        outs = pl.pallas_call(
            outer,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # frames stay HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),  # window
                pl.BlockSpec(memory_space=pltpu.VMEM),  # cos
                pl.BlockSpec(memory_space=pltpu.VMEM),  # msin
                pl.BlockSpec(memory_space=pltpu.VMEM),  # sync
                pl.BlockSpec(memory_space=pltpu.VMEM),  # syns
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                       pl.BlockSpec(memory_space=pltpu.ANY)),
            out_shape=(jax.ShapeDtypeStruct((b, p, l_pad), jnp.float32),
                       jax.ShapeDtypeStruct((b, p, l_pad), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, wvec, jnp.asarray(cos), jnp.asarray(msin), jnp.asarray(sync),
          jnp.asarray(syns))
        return outs

    def shipping(x):
        return gcc_kernel.fused_gcc_peaks(x, win, np.asarray(pairs), cfg,
                                          tile_b=tile)

    # correctness: identical tapered correlograms + TDOAs
    corr_pipe, aux_pipe = pipelined(frames)
    ship = shipping(frames)
    np.testing.assert_allclose(np.asarray(corr_pipe[..., :num_lags]),
                               np.asarray(ship[0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux_pipe[..., 1]),
                               np.asarray(ship[2]), rtol=1e-4, atol=1e-4)
    print("outputs match (correlograms + TDOAs)")

    from trace_stages import device_op_durations, load_xspace  # noqa: E402

    def timeit(name, fn, reduce_out):
        r = jax.jit(lambda x: reduce_out(fn(x)))
        jax.block_until_ready(r(frames))
        logdir = f"/tmp/emit-pipe/{name.replace(' ', '_')}"
        os.makedirs(logdir, exist_ok=True)
        jax.profiler.start_trace(logdir)
        out = None
        for _ in range(args.iters):
            out = r(frames)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        totals = device_op_durations(load_xspace(logdir))
        dev_ms = sum(totals.values()) / 1e3 / args.iters
        print(f"{name:28s} {dev_ms:8.3f} ms/iter device "
              f"({b / dev_ms * 1e3 / 1e6:7.2f} Mframes/s)")
        return dev_ms

    timeit("shipping (pallas grid)", shipping,
           lambda o: (jnp.mean(o[0]) + jnp.mean(o[2]))[None, None, None])
    timeit("emit_pipeline (manual)", pipelined,
           lambda o: (jnp.mean(o[0]) + jnp.mean(o[1]))[None, None, None])


if __name__ == "__main__":
    main()
