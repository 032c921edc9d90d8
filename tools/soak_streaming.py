#!/usr/bin/env python3
"""Endurance soak of the sub-batched multi-stream path (r3 cliff fix).

Drives step_many at >batch_chunk_streams concurrency for many steps —
the production serving loop — checking:

- events keep being detected and localized (sane xy on event steps),
- host RSS stays flat (the per-step jitted split/dispatch/concat chain
  must not leak buffers or cache entries),
- step wall time stays flat (no compilation churn after warmup).

Writes SOAK_STREAMING.json.  Usage:
    python tools/soak_streaming.py [--streams 2048] [--steps 500]
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer
    from audio_triangulation_tpu.utils import synth

    n, c = args.streams, args.chunk
    sl = StreamingLocalizer.create(
        geometry.reference_array(), stream=StreamConfig(chunk_size=c))
    rng = np.random.default_rng(0)
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frame = np.asarray(synth.synth_scene(
        src, geometry.reference_array(), noise_rms=0.0, seed=7))[0]

    # pre-staged chunk ring (8 quiet + 1 event-bearing), device-resident
    ring = []
    for i in range(8):
        s = rng.integers(127, 130, (n, 3, c)).astype(np.float64)
        if i == 4:
            s += 110.0 * frame[:, :c]
        ring.append(jnp.asarray(np.clip(np.round(s), 0, 255), jnp.float32))

    states = sl.init_states(n)
    rss0 = None
    walls = []
    events = 0
    xy_err_max = 0.0
    plane = np.array([0.5, 0.4])
    t_start = time.perf_counter()
    for step in range(args.steps):
        t0 = time.perf_counter()
        states, out = sl.step_many(states, ring[step % 8])
        trig = np.asarray(out["trigger_abs"])
        walls.append((time.perf_counter() - t0) * 1e3)
        hit = trig >= 0
        if hit.any():
            events += int(hit.sum())
            xy = np.asarray(out["xy"])[hit]
            xy_err_max = max(xy_err_max,
                             float(np.abs(xy - plane).max()))
        if step == 19:  # RSS baseline after warmup/compiles
            rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    w = np.asarray(walls[20:])
    result = {
        "metric": "streaming_soak",
        "streams": n, "steps": args.steps, "chunk": c,
        "events_detected": events,
        "xy_err_max_m": round(xy_err_max, 4),
        "step_ms_p50": round(float(np.percentile(w, 50)), 2),
        "step_ms_p99": round(float(np.percentile(w, 99)), 2),
        "rss_growth_mb": round((rss1 - (rss0 or rss1)) / 1024.0, 1),
        "wall_s": round(time.perf_counter() - t_start, 1),
        "ok": bool(events >= args.steps // 8 - 2
                   and xy_err_max < 0.15
                   and (rss1 - (rss0 or rss1)) / 1024.0 < 256),
    }
    print(json.dumps(result))
    with open("SOAK_STREAMING.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
