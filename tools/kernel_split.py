#!/usr/bin/env python3
"""Split the fused GCC kernel's device time by stage (real TPU).

Times three kernel variants on identical inputs with chained dispatches
(amortizing the axon tunnel, docs/PERFORMANCE.md methodology):

- peaks:    the shipping fused_gcc_peaks (front + cross + synth + peaks)
- corr:     fused_gcc (front + cross + synth, no peak/taper stage)
- matmuls:  pure-matmul floor — the kernel's exact DFT + synthesis matmul
            shapes as plain XLA jnp.dot chains (no VPU stages at all)

The deltas bound the VPU stages' serialized cost inside the kernel:
peaks-corr = peak/taper stage, corr-matmuls = cross-power + Mosaic
relayouts (stack/reshape) + conditioning.

Usage: python tools/kernel_split.py [--batch 16384] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--sub-tiles", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.core.config import PipelineConfig
    from audio_triangulation_tpu.ops import mxu_fft, window as window_ops
    from audio_triangulation_tpu.ops.pallas import gcc_kernel
    from audio_triangulation_tpu.utils import synth

    cfg = PipelineConfig(phat=True, fft_pad_mode="circular",
                         band_hz=(800.0, 6000.0), band_crop=True,
                         fused_sub_tiles=args.sub_tiles)
    mics = geometry.square_array(0.3)
    pairs = geometry.mic_pairs(4)
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frame = synth.synth_scene(src, mics, noise_rms=0.01, seed=0)
    b = args.batch
    frames = jnp.asarray(
        np.broadcast_to(frame, (b, 4, 1024)).astype(np.float32))
    win = window_ops.window_for(cfg)
    tile = gcc_kernel.pick_tile_b(4, 1024, cfg, cfg.fused_tile_b)
    print(f"tile_b={tile} sub_tiles={args.sub_tiles}")

    # ground truth via the on-device profiler (trace_stages methodology):
    # immune to the axon tunnel's dispatch caching AND its RTT, both of
    # which corrupt wall timing here (see docs/PERFORMANCE.md)
    from trace_stages import device_op_durations, load_xspace  # noqa: E402

    def timeit(name, fn, reduce_out):
        r = jax.jit(lambda x: reduce_out(fn(x)))
        jax.block_until_ready(r(frames))  # compile+warm
        logdir = f"/tmp/kernel-split/{name.replace(' ', '_')}"
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
        return dev_ms / 1e3

    # 1. shipping kernel with peaks
    def k_peaks(x):
        return gcc_kernel.fused_gcc_peaks(
            x, win, np.asarray(pairs), cfg, tile_b=tile)

    t_peaks = timeit("fused_gcc_peaks", k_peaks,
                     lambda o: (jnp.mean(o[0]) + jnp.mean(o[2]))[None, None,
                                                                 None])

    # 2. corr-only kernel (no peak/taper VPU stage)
    t_corr = timeit(
        "fused_gcc (corr only)",
        lambda x: gcc_kernel.fused_gcc(
            x, win, np.asarray(pairs), cfg, tile_b=tile),
        lambda o: jnp.mean(o)[None, None, None])

    # 3. pure-matmul floor: same DFT + synthesis shapes, no VPU stages
    crop = mxu_fft.crop_bins(cfg)
    cos, msin = mxu_fft.dft_matrices_band(1024, cfg.fft_length, *crop,
                                          "float32")
    sync, syns = mxu_fft.lag_synthesis_matrices_band(
        cfg.fft_length, cfg.max_shift, *crop, "float32")
    l_pad = 128
    sync = jnp.asarray(np.pad(sync, [(0, 0), (0, l_pad - sync.shape[1])]))
    syns = jnp.asarray(np.pad(syns, [(0, 0), (0, l_pad - syns.shape[1])]))
    cos, msin = jnp.asarray(cos), jnp.asarray(msin)

    def mm_floor(x):
        z = x.reshape(b * 4, 1024)
        re = jnp.dot(z, cos, preferred_element_type=jnp.float32)
        im = jnp.dot(z, msin, preferred_element_type=jnp.float32)
        # fake per-pair axis without relayout cost: reuse rows (6/4 ratio
        # approximated by 1.5x row count via concat)
        rr = jnp.concatenate([re, im[: b * 2]], axis=0)  # [6b, F]
        jj = jnp.concatenate([im, re[: b * 2]], axis=0)
        corr = (jnp.dot(rr, sync, preferred_element_type=jnp.float32)
                + jnp.dot(jj, syns, preferred_element_type=jnp.float32))
        return corr

    t_mm = timeit("pure matmul floor (XLA)", mm_floor,
                  lambda o: jnp.mean(o)[None, None, None])

    print(f"\npeak/taper stage:  {(t_peaks - t_corr) * 1e3:7.3f} ms")
    print(f"cross+relayout+conditioning vs matmul floor: "
          f"{(t_corr - t_mm) * 1e3:7.3f} ms")
    print(f"matmul floor:      {t_mm * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
