#!/usr/bin/env python3
"""Benchmark matrix: all five BASELINE.json configurations on the current
backend.  Prints one JSON line per config plus a summary line.

  1. 2-mic GCC-PHAT, 1024-sample frames (TDOA only)
  2. 3-mic planar triangulation, single frame (latency) + batched
  3. 4-mic square array, streaming 50%-overlap frames, all pairs
  4. 8-mic circular SRP-PHAT over a 64x64-ish spatial grid
  5. 64-mic array, 4096-pt frames, 10k-frame batched inference (chunked)

``bench.py`` remains the single headline metric; this is the coverage run.

Record names carry a methodology suffix when a config's settings changed
across rounds, so cross-round BENCH_CONFIGS history stays self-describing
(r4 advisor): ``_lanes_s3`` = lane-order framing + stride-3 init grid,
``_s2bf16`` = stride-2 init grid + bf16 SRP contraction.  Rows without a
suffix have kept their original methodology since r1.
"""

import json
import time

import numpy as np


def _timed(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def _timed_resident(run_one, params, batch_np, g, iters=10, warmup=2):
    """Per-batch seconds with g HBM-resident batches per dispatch.

    Same mechanism as bench.py's headline: a tuple of separate resident
    arrays unrolled inside one jit (a lax.map over a stacked array would
    dynamic-slice-copy each batch out of HBM first) amortizes the
    per-dispatch tunnel latency the way production ingest keeps a chip fed.
    """
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    xs = tuple(jax.device_put(jnp.asarray(batch_np), dev) for _ in range(g))
    run_c = jax.jit(lambda p, xs: tuple(run_one(p, x) for x in xs))
    for _ in range(warmup):
        jax.block_until_ready(run_c(params, xs))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run_c(params, xs)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / (iters * g)


def main():
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu import (
        GridConfig, Localizer, PipelineConfig, geometry,
    )
    
    from audio_triangulation_tpu.ops import xcorr as xcorr_ops
    from audio_triangulation_tpu.ops import mxu_fft
    from audio_triangulation_tpu.utils import synth

    results = []
    dev = str(jax.devices()[0])

    def report(name, frames_per_sec, batch, extra=None):
        rec = {"config": name, "frames_per_sec": round(frames_per_sec, 1),
               "batch": batch, "device": dev}
        if extra:
            rec.update(extra)
        results.append(rec)
        print(json.dumps(rec))

    # ---- config 1: 2-mic GCC-PHAT TDOA ----
    cfg1 = PipelineConfig(phat=True, fft_pad_mode="circular")
    mics2 = np.array([[-0.1, 0.0], [0.1, 0.0]], np.float32)
    sig = synth.chirp_burst(1024, 48_000.0)
    b1 = 16384
    pair = jnp.asarray([[0, 1]], jnp.int32)
    f2 = np.stack([sig, synth.fractional_delay(sig, 7.3)])
    frames2 = jax.device_put(
        jnp.asarray(np.tile(f2.astype(np.float32), (b1, 1, 1))))

    def gcc2(_, x):
        corr = mxu_fft.xcorr_mxu(x, pair, cfg1)
        return xcorr_ops.subsample_peak(corr, cfg1.max_shift)[0]

    dt = _timed_resident(gcc2, None, np.asarray(frames2), g=8)
    report("1_2mic_gcc_phat_1024", b1 / dt, b1, {"resident_batches": 8})

    # ---- config 2: 3-mic triangulation ----
    mics3 = geometry.reference_array()
    loc3 = Localizer.create(mics3, PipelineConfig(fft_pad_mode="circular"))
    src = np.array([0.7, 0.4, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    one = synth.synth_scene(src, mics3, noise_rms=0.01, seed=1)
    fr1 = jnp.asarray(one, jnp.float32)
    run3 = jax.jit(lambda x: loc3._jitted(loc3.params, x)["xy"])
    dt_lat = _timed(run3, fr1, iters=50, warmup=3)
    b3 = 16384
    frb = np.broadcast_to(one, (b3, 3, 1024)).astype(np.float32)
    dt = _timed_resident(lambda p, x: loc3._jitted(p, x)["xy"],
                         loc3.params, frb, g=8)
    report("2_3mic_triangulation", b3 / dt, b3,
           {"single_frame_latency_us": round(dt_lat * 1e6, 1),
            "resident_batches": 8})

    # ---- config 3: 4-mic square, streaming 50%-overlap framing ----
    # r4 roofline work (docs/PERFORMANCE.md): lane-order framing (the
    # interleave/pad copy chain was 64% of device time) plus the
    # headline's accuracy-neutral settings (stride-3 init grid + bf16 SRP
    # contraction; the GN solver supersedes grid resolution) — 1.19M ->
    # ~3.5M frames/s, at the traced device ceiling
    mics4 = geometry.square_array(0.3)
    loc4 = Localizer.create(
        mics4, PipelineConfig(phat=True, fft_pad_mode="circular",
                              srp_dtype="bfloat16"),
        init_grid_stride=3)
    t_len = 1024 * 2049  # -> 4097 overlapped frames of 1024 @ hop 512
    stream = np.random.default_rng(0).normal(
        0, 0.05, (4, t_len)).astype(np.float32)

    from audio_triangulation_tpu.ops import framing

    def overlap_localize(p, s):
        frames, order = framing.frame_multichannel_lanes(s, 1024, 512)
        # time order restored on the SMALL output, not the frames
        return loc4._jitted(p, frames)["xy"][jnp.asarray(order)]

    dt = _timed_resident(overlap_localize, loc4.params, stream, g=12,
                         iters=5)
    n_frames = (t_len - 1024) // 512 + 1
    report("3_4mic_streaming_overlap_lanes_s3", n_frames / dt,
           n_frames,
           {"resident_batches": 12, "framing": "lanes",
            "init_grid_stride": 3})

    # ---- config 4: 8-mic circular SRP-PHAT, 64x64 grid ----
    # r4 roofline work: stride-2 init grid + bf16 scoring attack the
    # 2.1 ms scoring stage (accuracy-neutral, BENCH_ACCURACY.json);
    # the fused kernel itself is compute-bound at ~140 TFLOPS and keeps
    # 72% of device time — see docs/PERFORMANCE.md for the table
    mics8 = geometry.circular_array(8, 0.15)
    grid64 = GridConfig(half_cells_x=32, half_cells_y=32, cells_per_m=24.0)
    loc8 = Localizer.create(
        mics8, PipelineConfig(phat=True, fft_pad_mode="circular",
                              srp_dtype="bfloat16"), grid64,
        init_grid_stride=2)
    b8 = 8192
    one8 = synth.synth_scene(src, mics8, noise_rms=0.01, seed=2)
    fr8 = np.broadcast_to(one8, (b8, 8, 1024)).astype(np.float32)
    dt = _timed_resident(lambda p, x: loc8._jitted(p, x)["xy"],
                         loc8.params, fr8, g=12)
    report("4_8mic_circular_srp_phat_65x65_s2bf16", b8 / dt, b8,
           {"srp_form": loc8.srp_form, "resident_batches": 12,
            "init_grid_stride": 2})

    # ---- config 5: 64-mic, 4096-pt frames, 10k frames chunked ----
    mics64 = geometry.grid_array(8, 8, 0.05)
    cfg64 = PipelineConfig(
        frame_size_bits=12,
        max_shift_samples=geometry.max_lag_for_array(
            mics64, PipelineConfig()),
        phat=True, fft_pad_mode="circular", srp_dtype="bfloat16")
    grid5 = GridConfig(half_cells_x=31, half_cells_y=31, cells_per_m=16.0)
    # same accuracy-neutral settings as the headline bench: bf16 SRP
    # contraction (one-hot exact; argmax cell unchanged) and a strided init
    # grid (the GN solver supersedes grid resolution — BENCH_ACCURACY.json)
    loc64 = Localizer.create(mics64, cfg64, grid5, init_grid_stride=2)
    chunk = 256
    one64 = synth.synth_scene(src, mics64, n=4096, seed=3)
    fr64_np = np.broadcast_to(one64, (chunk, 64, 4096)).astype(np.float32)
    # params as a jit ARG (closure capture would embed the large-array
    # steering matrix as an HLO constant: HTTP 413 on remote compile);
    # 4 resident 268 MB chunks per dispatch amortize the tunnel bubble
    dt = _timed_resident(lambda p, x: loc64._jitted(p, x)["xy"],
                         loc64.params, fr64_np, g=4, iters=5)
    fps = chunk / dt
    report("5_64mic_4096pt_batched", fps, chunk,
           {"pairs": 2016, "time_for_10k_frames_s": round(10_000 / fps, 2),
            "srp_form": loc64.srp_form, "resident_batches": 4})

    # ---- config 5b: 64-mic with the band-cropped spectral fast path ----
    # (band matched to the chirp source; identical accuracy, ~1.8x faster:
    # only in-band bins flow through the gcc_large kernel)
    cfg64b = PipelineConfig(
        frame_size_bits=12,
        max_shift_samples=geometry.max_lag_for_array(
            mics64, PipelineConfig()),
        phat=True, fft_pad_mode="circular", srp_dtype="bfloat16",
        band_hz=(800.0, 6000.0), band_crop=True)
    loc64b = Localizer.create(mics64, cfg64b, grid5, init_grid_stride=2)
    dt = _timed_resident(lambda p, x: loc64b._jitted(p, x)["xy"],
                         loc64b.params, fr64_np, g=4, iters=5)
    fps = chunk / dt
    report("5b_64mic_4096pt_band_crop", fps, chunk,
           {"pairs": 2016, "time_for_10k_frames_s": round(10_000 / fps, 2),
            "band_hz": [800.0, 6000.0], "resident_batches": 4})

    # ---- config 5c: 64-mic with the HANDS-FREE auto band ----
    # (band_hz='auto': per-event coherence-selected band from a 64-pair
    # subsample, folded into the spectra — gcc_large._prep_spectra; no
    # constant hand-matched to the source, unlike 5b's (800, 6000))
    cfg64c = PipelineConfig(
        frame_size_bits=12,
        max_shift_samples=geometry.max_lag_for_array(
            mics64, PipelineConfig()),
        phat=True, fft_pad_mode="circular", srp_dtype="bfloat16",
        band_hz="auto")
    loc64c = Localizer.create(mics64, cfg64c, grid5, init_grid_stride=2)
    dt = _timed_resident(lambda p, x: loc64c._jitted(p, x)["xy"],
                         loc64c.params, fr64_np, g=4, iters=5)
    fps = chunk / dt
    report("5c_64mic_4096pt_band_auto", fps, chunk,
           {"pairs": 2016, "time_for_10k_frames_s": round(10_000 / fps, 2),
            "band_hz": "auto", "resident_batches": 4})

    with open("BENCH_CONFIGS.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"summary": "ok", "configs": len(results)}))


if __name__ == "__main__":
    main()
