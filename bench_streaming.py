#!/usr/bin/env python3
"""Streaming benchmark: real-time capacity of the stateful chunked pipeline.

Measures single-stream step latency and vmapped multi-stream throughput,
derives the number of concurrent real-time 50 kHz streams one chip sustains,
and writes BENCH_STREAMING.json.  (The reference firmware sustains exactly
one 3-mic 50 kHz stream on its MCU.)
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    chunk = 512
    chunk_s = chunk / 50_000.0
    sl = StreamingLocalizer.create(
        geometry.reference_array(), stream=StreamConfig(chunk_size=chunk))
    rng = np.random.default_rng(0)
    results = []

    # single stream
    state = sl.init_state()
    c1 = jnp.asarray(rng.integers(127, 130, (3, chunk)), jnp.float32)
    state, out = sl(state, c1)
    jax.block_until_ready(out["xy_grid"])
    t0 = time.perf_counter()
    iters = 100
    for _ in range(iters):
        state, out = sl(state, c1)
    jax.block_until_ready(out["xy_grid"])
    lat1 = (time.perf_counter() - t0) / iters
    rec = {"streams": 1, "step_ms": round(lat1 * 1e3, 3),
           "realtime_margin": round(chunk_s / lat1, 1)}
    results.append(rec)
    print(json.dumps(rec))

    # capacity claims must be worst-case-valid: `capacity` extrapolates
    # (budget / step * streams), which is only honest where scaling is
    # linear, so the summary reports the measured capacity at the LARGEST
    # real-time-feasible stream count, not the sweet-spot extrapolation.
    # (The r2 artifact's 2,879 rode the 1,024-stream point while 2,048
    # dense streams fell off a VMEM-spill cliff — fixed in r3 by
    # StreamConfig.batch_chunk_streams sub-batch dispatch; the sweep
    # through 4,096 documents the now-linear scaling.)
    best = 0
    worst_case = None
    for s_count in (256, 1024, 2048, 4096):
        states = sl.init_states(s_count)
        chunks = jax.device_put(jnp.asarray(
            rng.integers(127, 130, (s_count, 3, chunk)), jnp.float32))
        states, out = sl.step_many(states, chunks)
        jax.block_until_ready(out["xy_grid"])
        t0 = time.perf_counter()
        for _ in range(20):
            states, out = sl.step_many(states, chunks)
        jax.block_until_ready(out["xy_grid"])
        lat = (time.perf_counter() - t0) / 20
        capacity = int(chunk_s / lat * s_count)
        best = max(best, capacity)
        if s_count >= 1024:
            worst_case = (capacity if worst_case is None
                          else min(worst_case, capacity))
        rec = {"streams": s_count, "step_ms": round(lat * 1e3, 2),
               "realtime_capacity_streams": capacity,
               "realtime_ok": lat < chunk_s}
        results.append(rec)
        print(json.dumps(rec))

    # --- band-cropped pipeline: the production config (PHAT + band prior,
    # only in-band bins computed) through the same dense vmapped step ---
    from audio_triangulation_tpu.core.config import PipelineConfig

    sl_band = StreamingLocalizer.create(
        geometry.reference_array(),
        PipelineConfig(phat=True, band_hz=(800.0, 6000.0), band_crop=True),
        stream=StreamConfig(chunk_size=chunk))
    best_band = 0
    worst_case_band = None
    for s_count in (1024, 2048, 4096):
        states = sl_band.init_states(s_count)
        chunks = jax.device_put(jnp.asarray(
            rng.integers(127, 130, (s_count, 3, chunk)), jnp.float32))
        states, out = sl_band.step_many(states, chunks)
        jax.block_until_ready(out["xy_grid"])
        t0 = time.perf_counter()
        for _ in range(20):
            states, out = sl_band.step_many(states, chunks)
        jax.block_until_ready(out["xy_grid"])
        lat = (time.perf_counter() - t0) / 20
        capacity = int(chunk_s / lat * s_count)
        best_band = max(best_band, capacity)
        worst_case_band = (capacity if worst_case_band is None
                           else min(worst_case_band, capacity))
        rec = {"streams": s_count, "mode": "band_crop_phat",
               "step_ms": round(lat * 1e3, 2),
               "realtime_capacity_streams": capacity,
               "realtime_ok": lat < chunk_s}
        results.append(rec)
        print(json.dumps(rec))
    best = max(best, best_band)

    # --- hands-free auto band: the same PHAT pipeline with the per-event
    # coherence-selected band (band_hz='auto', no hand-matched constant;
    # rides the MXU engine via spectra scaling, mxu_fft.autoband_scale_reim)
    sl_auto = StreamingLocalizer.create(
        geometry.reference_array(),
        PipelineConfig(phat=True, band_hz="auto"),
        stream=StreamConfig(chunk_size=chunk))
    worst_case_auto = None
    for s_count in (1024, 2048, 4096):
        states = sl_auto.init_states(s_count)
        chunks = jax.device_put(jnp.asarray(
            rng.integers(127, 130, (s_count, 3, chunk)), jnp.float32))
        states, out = sl_auto.step_many(states, chunks)
        jax.block_until_ready(out["xy_grid"])
        t0 = time.perf_counter()
        for _ in range(20):
            states, out = sl_auto.step_many(states, chunks)
        jax.block_until_ready(out["xy_grid"])
        lat = (time.perf_counter() - t0) / 20
        capacity = int(chunk_s / lat * s_count)
        worst_case_auto = (capacity if worst_case_auto is None
                           else min(worst_case_auto, capacity))
        rec = {"streams": s_count, "mode": "band_auto_phat",
               "step_ms": round(lat * 1e3, 2),
               "realtime_capacity_streams": capacity,
               "realtime_ok": lat < chunk_s}
        results.append(rec)
        print(json.dumps(rec))

    # --- tracked serving: the ONE-dispatch fused localize+track step ---
    # (models/tracked.py: Kalman bank update rides the same device program
    # as the burst — no host round-trip, so tracked capacity is measured
    # at the same scale as dense serving)
    from audio_triangulation_tpu.models.tracked import (
        TrackedStreamingLocalizer)

    tsl = TrackedStreamingLocalizer.create(
        geometry.reference_array(), stream=StreamConfig(chunk_size=chunk))
    worst_case_tracked = None
    for s_count in (1024, 2048, 4096):
        states = tsl.init_states(s_count)
        chunks = jax.device_put(jnp.asarray(
            rng.integers(127, 130, (s_count, 3, chunk)), jnp.float32))
        states, out = tsl.step_many(states, chunks)
        jax.block_until_ready(out["track_xy"])
        t0 = time.perf_counter()
        for _ in range(20):
            states, out = tsl.step_many(states, chunks)
        jax.block_until_ready(out["track_xy"])
        lat = (time.perf_counter() - t0) / 20
        capacity = int(chunk_s / lat * s_count)
        worst_case_tracked = (capacity if worst_case_tracked is None
                              else min(worst_case_tracked, capacity))
        rec = {"streams": s_count, "mode": "tracked_fused",
               "step_ms": round(lat * 1e3, 2),
               "realtime_capacity_streams": capacity,
               "realtime_ok": lat < chunk_s}
        results.append(rec)
        print(json.dumps(rec))

    # --- tracked, K-step fused dispatch (models/tracked.step_many_scan):
    # the r5 trace showed the 1,024-stream tracked step is DISPATCH-
    # limited (1.33 ms device inside a ~3.6 ms step; the tracker bank is
    # +0.105 ms device over untracked) — scanning K chunks per dispatch
    # amortizes the tunnel/host latency at the cost of K-chunk reporting
    # latency (K=4 @ 512-sample chunks = 41 ms)
    k_scan = 4
    worst_case_tracked_scan = None
    for s_count in (1024, 2048):
        states = tsl.init_states(s_count)
        chunks = jax.device_put(jnp.asarray(
            rng.integers(127, 130, (s_count, k_scan, 3, chunk)),
            jnp.float32))
        states, out = tsl.step_many_scan(states, chunks)
        jax.block_until_ready(out["track_xy"])
        t0 = time.perf_counter()
        for _ in range(20):
            states, out = tsl.step_many_scan(states, chunks)
        jax.block_until_ready(out["track_xy"])
        lat = (time.perf_counter() - t0) / 20 / k_scan  # per chunk-step
        capacity = int(chunk_s / lat * s_count)
        worst_case_tracked_scan = (
            capacity if worst_case_tracked_scan is None
            else min(worst_case_tracked_scan, capacity))
        rec = {"streams": s_count, "mode": "tracked_fused_scan4",
               "step_ms": round(lat * 1e3, 2),
               "realtime_capacity_streams": capacity,
               "realtime_ok": lat < chunk_s,
               "reporting_latency_ms": round(k_scan * chunk_s * 1e3, 1)}
        results.append(rec)
        print(json.dumps(rec))

    # --- two-rate serving: detect every chunk, localize at event rate ---
    # Acoustic events are sparse, so the detect-only step bounds capacity;
    # the event-rate localization batch amortizes over all streams.  The
    # capacity figure below charges every chunk the detect cost plus the
    # localize cost at a 5%-of-streams-triggering-per-chunk event rate
    # (pessimistic: ~5 events/s/stream at 10 ms chunks).
    from audio_triangulation_tpu.models.streaming import (
        TwoRateStreamingLocalizer)

    tr = TwoRateStreamingLocalizer.create(
        geometry.reference_array(), stream=StreamConfig(chunk_size=chunk),
        event_capacity=128)
    best_tworate = 0
    for s_count in (1024, 4096, 8192):
        states = tr.init_states(s_count)
        chunks = jax.device_put(jnp.asarray(
            rng.integers(127, 130, (s_count, 3, chunk)), jnp.float32))
        states, det = tr.detect_many(states, chunks)
        jax.block_until_ready(det["triggered"])
        t0 = time.perf_counter()
        for _ in range(20):
            states, det = tr.detect_many(states, chunks)
        jax.block_until_ready(det["triggered"])
        lat_det = (time.perf_counter() - t0) / 20
        states, ev = tr.localize_triggered(states, det)
        jax.block_until_ready(ev["xy"])
        t0 = time.perf_counter()
        for _ in range(20):
            states, ev = tr.localize_triggered(states, det)
        jax.block_until_ready(ev["xy"])
        lat_loc = (time.perf_counter() - t0) / 20
        # events/chunk at the assumed rate, localized in capacity-128 batches
        ev_batches = max(1, int(np.ceil(0.05 * s_count / 128)))
        lat = lat_det + ev_batches * lat_loc
        capacity = int(chunk_s / lat * s_count)
        best_tworate = max(best_tworate, capacity)
        rec = {"streams": s_count, "mode": "two_rate",
               "detect_ms": round(lat_det * 1e3, 2),
               "localize128_ms": round(lat_loc * 1e3, 2),
               "realtime_capacity_streams_at_5pct_event_rate": capacity}
        results.append(rec)
        print(json.dumps(rec))

    # headline value = worst-case-valid dense capacity of the production
    # (band-cropped) config across all >=1,024-stream points — NOT the
    # sweet-spot extrapolation; best/two-rate kept for context
    summary = {"metric": "concurrent_realtime_50khz_streams_per_chip",
               "value": worst_case_band, "unit": "streams",
               "dense_path_best": best,
               "dense_fullband_worst_case": worst_case,
               "dense_band_crop_worst_case": worst_case_band,
               "dense_band_auto_worst_case": worst_case_auto,
               "tracked_fused_worst_case": worst_case_tracked,
               "tracked_fused_scan4_worst_case": worst_case_tracked_scan,
               "two_rate_path": best_tworate,
               "vs_baseline": worst_case_band}  # reference: 1 stream
    results.append(summary)
    print(json.dumps(summary))
    with open("BENCH_STREAMING.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
