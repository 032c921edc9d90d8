#!/usr/bin/env python3
"""Event latency benchmark: host-chunk-in-hand -> solved position.

The reference's real-time claim is a LATENCY claim (the detector must run
inside its 20 us/sample budget, src/sample_compute.h:62-99); the repo's
other artifacts publish throughput and step time.  This one measures the
end-to-end per-chunk latency of the streaming localizer — host chunk in
hand (numpy array) to solved `xy` on the host, INCLUDING H2D transfer,
device step (detect + masked GCC + EMA + SRP + GN solve + covariance),
and D2H readback — at p50/p99:

- 1 stream (interactive latency), and
- under 1,024-stream load (the dense-path capacity regime), where the
  per-chunk latency is what every one of the 1,024 streams experiences.

Writes BENCH_LATENCY.json.  Note the axon-tunnel caveat: each sample is a
synchronized dispatch, so the measured latency INCLUDES the host<->device
transport round-trip — representative of a host-fed production serving
path (what a caller actually waits), pessimistic for on-host pipelines.
"""

import json
import time

import numpy as np


def _percentiles(samples_ms):
    a = np.asarray(samples_ms)
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 3),
        "p90_ms": round(float(np.percentile(a, 90)), 3),
        "p99_ms": round(float(np.percentile(a, 99)), 3),
        "max_ms": round(float(a.max()), 3),
        "n": int(a.size),
    }


def main():
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    chunk = 512
    chunk_s = chunk / 50_000.0
    fs_int = 50_000
    sl = StreamingLocalizer.create(
        geometry.reference_array(), stream=StreamConfig(chunk_size=chunk))
    rng = np.random.default_rng(0)
    results = {"metric": "chunk_to_xy_latency",
               "chunk_samples": chunk, "chunk_ms": chunk_s * 1e3}

    # host-side chunk generator with periodic events so the solver path is
    # hot (one chunk materialized at a time: 1,024 streams x 60 chunks
    # would otherwise be ~750 MB of host RAM)
    from audio_triangulation_tpu.utils import synth

    _src3 = np.array([0.5, 0.4, 1.2])
    _src3 = _src3 * 1.2 / np.linalg.norm(_src3)
    _frame = np.asarray(synth.synth_scene(
        _src3, geometry.reference_array(), noise_rms=0.0, seed=7))[0]

    def gen_chunks(n_streams, t_chunks, seed):
        r = np.random.default_rng(seed)
        for t in range(t_chunks):
            s = r.integers(
                127, 130, (n_streams, 3, chunk)).astype(np.float64)
            if t >= 4 and (t - 4) % 12 == 0:  # burst inside this chunk
                s[:, :, :] += 110.0 * _frame[:, :chunk]
            yield np.clip(np.round(s), 0, 255).astype(np.float32)

    # --- 1 stream ------------------------------------------------------
    state = sl.init_state()
    lat = []
    for host_chunk in gen_chunks(1, 220, seed=1):
        host_chunk = host_chunk[0]
        t0 = time.perf_counter()
        state, out = sl(state, jnp.asarray(host_chunk))
        xy = np.asarray(out["xy"])  # D2H fence: answer on the host
        lat.append((time.perf_counter() - t0) * 1e3)
        assert xy.shape == (2,)
    results["single_stream"] = _percentiles(lat[20:])  # skip warmup
    results["single_stream"]["realtime_ok"] = (
        float(np.percentile(lat[20:], 99)) < chunk_s * 1e3)
    print(json.dumps({"single_stream": results["single_stream"]}))

    # --- 1,024-stream load ----------------------------------------------
    n = 1024
    states = sl.init_states(n)
    lat_b = []
    for host_chunk in gen_chunks(n, 60, seed=2):
        t0 = time.perf_counter()
        states, out = sl.step_many(states, jnp.asarray(host_chunk))
        xy = np.asarray(out["xy"])
        lat_b.append((time.perf_counter() - t0) * 1e3)
        assert xy.shape == (n, 2)
    results["load_1024_streams"] = _percentiles(lat_b[10:])
    results["load_1024_streams"]["realtime_ok"] = (
        float(np.percentile(lat_b[10:], 99)) < chunk_s * 1e3)
    print(json.dumps({"load_1024_streams": results["load_1024_streams"]}))

    results["note"] = (
        "synchronized per-chunk dispatch incl. H2D + step + D2H; "
        f"real-time budget per chunk = {chunk_s * 1e3:.2f} ms at "
        f"{fs_int} Hz")
    with open("BENCH_LATENCY.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"metric": "chunk_to_xy_p99_latency_1stream",
                      "value": results["single_stream"]["p99_ms"],
                      "unit": "ms",
                      "vs_baseline": round(
                          chunk_s * 1e3
                          / results["single_stream"]["p99_ms"], 2)}))


if __name__ == "__main__":
    main()
