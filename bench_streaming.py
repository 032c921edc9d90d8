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

    best = 0
    for s_count in (256, 1024, 2048):
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
        rec = {"streams": s_count, "step_ms": round(lat * 1e3, 2),
               "realtime_capacity_streams": capacity}
        results.append(rec)
        print(json.dumps(rec))

    summary = {"metric": "concurrent_realtime_50khz_streams_per_chip",
               "value": best, "unit": "streams",
               "vs_baseline": best}  # reference: 1 stream on the MCU
    results.append(summary)
    print(json.dumps(summary))
    with open("BENCH_STREAMING.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
