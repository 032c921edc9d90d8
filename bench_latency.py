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

Three numbers per load point, because the transport matters and this dev
environment reaches its chip through a tunnel:

- synchronized_tunnel_bound: submit one chunk, block for its xy.  Every
  blocking call here crosses the axon dev tunnel (~28 ms RTT), so this is
  a TRANSPORT-dominated upper bound — what a WAN-remote caller would see,
  not a device-capability number.
- device_step_ms: the true on-device service time of the chunk->xy step,
  from `jax.profiler` device op durations (tunnel-immune).
- colocated_model_ms: device_step_ms + H2D/D2H bytes at a conservative
  25 GB/s PCIe rate — the per-chunk latency a co-located production host
  would observe (MODELED from the two measured components, labeled so).

Writes BENCH_LATENCY.json.
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

    def sync_run(n, t_chunks, seed, skip):
        """Synchronized per-chunk dispatch (includes tunnel RTT)."""
        state = sl.init_state() if n == 1 else sl.init_states(n)
        step = (lambda s, c: sl(s, c[0])) if n == 1 else sl.step_many
        lat = []
        for host_chunk in gen_chunks(n, t_chunks, seed):
            t0 = time.perf_counter()
            state, out = step(state, jnp.asarray(host_chunk))
            xy = np.asarray(out["xy"])  # D2H fence: answer on the host
            lat.append((time.perf_counter() - t0) * 1e3)
            assert xy.shape == ((2,) if n == 1 else (n, 2))
        r = _percentiles(lat[skip:])
        r["realtime_ok"] = r["p99_ms"] < chunk_s * 1e3
        return r

    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from trace_stages import device_op_durations, load_xspace  # noqa: E402

    def device_step(n, t_chunks, seed):
        """On-device per-chunk service time via the profiler (tunnel-
        immune): trace t_chunks steps on distinct event-bearing chunks,
        divide total device op time by the step count."""
        state = sl.init_state() if n == 1 else sl.init_states(n)
        step = (lambda s, c: sl(s, c[0])) if n == 1 else sl.step_many
        chunks = [jnp.asarray(c) for c in gen_chunks(n, t_chunks, seed)]
        state, out = step(state, chunks[0])  # compile+warm
        np.asarray(out["xy"])
        logdir = f"/tmp/bench-latency/{n}"
        os.makedirs(logdir, exist_ok=True)
        jax.profiler.start_trace(logdir)
        for c in chunks[1:]:
            state, out = step(state, c)
        jax.block_until_ready(out["xy"])
        jax.profiler.stop_trace()
        totals = device_op_durations(load_xspace(logdir))
        return sum(totals.values()) / 1e3 / (len(chunks) - 1)

    # conservative co-located host transfer model: H2D chunk + D2H xy at
    # 25 GB/s (PCIe gen4 x8 with margin); the chunk is the dominant term
    pcie_gbs = 25.0

    for n, t_chunks, seed, skip, tag in (
            (1, 220, 1, 20, "single_stream"),
            (1024, 60, 2, 10, "load_1024_streams")):
        sync = sync_run(n, t_chunks, seed, skip)
        dev_ms = device_step(n, 30, seed + 10)
        xfer_ms = (n * 3 * chunk * 4) / (pcie_gbs * 1e9) * 1e3
        model_ms = dev_ms + xfer_ms
        results[tag] = {
            "synchronized_tunnel_bound": sync,
            "device_step_ms": round(dev_ms, 3),
            "h2d_model_ms": round(xfer_ms, 3),
            "colocated_model_ms": round(model_ms, 3),
            "colocated_realtime_ok": model_ms < chunk_s * 1e3,
        }
        print(json.dumps({tag: results[tag]}))

    results["note"] = (
        "synchronized = one blocking dispatch per chunk through the axon "
        "dev tunnel (~28 ms RTT: transport-dominated upper bound); "
        "device_step_ms = profiler-measured on-device service time; "
        "colocated_model_ms = device step + H2D at 25 GB/s (modeled "
        "co-located host). Real-time budget per chunk = "
        f"{chunk_s * 1e3:.2f} ms at {fs_int} Hz")
    with open("BENCH_LATENCY.json", "w") as f:
        json.dump(results, f, indent=1)
    v = results["single_stream"]["colocated_model_ms"]
    print(json.dumps({"metric": "chunk_to_xy_latency_1stream_colocated",
                      "value": v, "unit": "ms",
                      "vs_baseline": round(chunk_s * 1e3 / v, 2)}))


if __name__ == "__main__":
    main()
