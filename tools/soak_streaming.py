#!/usr/bin/env python3
"""Endurance soak of the sub-batched multi-stream path (r3 cliff fix),
optionally with the FULL system in the loop (r4): fused tracking + health
weighting + a mid-soak dead channel + multi-source segments.

Drives step_many at >batch_chunk_streams concurrency for many steps —
the production serving loop — checking:

- events keep being detected and localized (sane xy on event steps),
- host RSS stays flat (the per-step jitted split/dispatch/concat chain
  must not leak buffers or cache entries),
- step wall time stays flat (no compilation churn after warmup),
- with --track: track identity persists across the whole soak (one
  confirmed track for the static source, same id before and after the
  fault),
- with --fault-at: localization stays accurate after a channel dies
  (health weighting suppresses the dead mic's pairs).

Writes SOAK_STREAMING.json.  Usage:
    python tools/soak_streaming.py [--streams 2048] [--steps 500]
        [--minutes 60] [--track] [--fault-at 0.5] [--chunk 512]

--minutes runs by wall clock (overrides --steps); --fault-at is the
fraction of the soak after which channel 1 of every stream goes flat.
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
    ap.add_argument("--minutes", type=float, default=None,
                    help="run by wall clock instead of --steps")
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--track", action="store_true",
                    help="fused tracked streaming + health weighting "
                         "(models/tracked.py) instead of the plain "
                         "localizer")
    ap.add_argument("--fault-at", type=float, default=None,
                    help="fraction of the soak (0-1) after which channel "
                         "1 goes dead on every stream")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer
    from audio_triangulation_tpu.utils import synth

    n, c = args.streams, args.chunk
    # --track needs mic redundancy for the dead channel to be absorbed
    # (M >= 5); the plain soak keeps the 3-mic reference array
    if args.track:
        mics = geometry.circular_array(6, 0.25)
    else:
        mics = geometry.reference_array()
    m = mics.shape[0]
    stream_cfg = StreamConfig(chunk_size=c,
                              health_weighting=args.track)
    if args.track:
        from audio_triangulation_tpu.models.tracked import (
            TrackedStreamingLocalizer)

        stepper = TrackedStreamingLocalizer.create(mics,
                                                   stream=stream_cfg)
    else:
        stepper = StreamingLocalizer.create(mics, stream=stream_cfg)

    rng = np.random.default_rng(0)
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frame = np.asarray(synth.synth_scene(src, mics, noise_rms=0.0,
                                         seed=7))[0]
    # second, weaker simultaneous source for the multi-source segments
    src2 = np.array([-0.7, -0.5, 1.2]) * (
        1.2 / np.linalg.norm([-0.7, -0.5, 1.2]))
    sig2 = synth.chirp_burst(1024, 50_000.0, f0=2000, f1=9000, center=0.45)
    frame2 = np.asarray(synth.synth_scene(src2, mics, signal=sig2,
                                          noise_rms=0.0, seed=8))[0]

    # pre-staged chunk ring (quiet + single-source at 4 + two-source
    # overlap at 6), device-resident; a faulted twin with channel 1 flat
    ring, ring_fault = [], []
    for i in range(8):
        s = rng.integers(127, 130, (n, m, c)).astype(np.float64)
        if i == 4:
            s += 110.0 * frame[:, :c]
        elif i == 6:
            s += 110.0 * frame[:, :c] + 70.0 * frame2[:, :c]
        s = np.clip(np.round(s), 0, 255)
        ring.append(jnp.asarray(s, jnp.float32))
        sf = s.copy()
        sf[:, 1, :] = 128.0  # dead channel: flat ADC midscale
        ring_fault.append(jnp.asarray(sf, jnp.float32))

    states = stepper.init_states(n)
    rss0 = None
    walls = []
    events = 0
    xy_err_max = 0.0          # single-source events, pre-fault
    xy_err_max_fault = 0.0    # single-source events, post-fault
    plane = np.array([0.5, 0.4])
    track_ids_pre, track_ids_post = set(), set()

    if args.minutes is not None:
        budget_s = args.minutes * 60.0
        total_steps = None
    else:
        budget_s = None
        total_steps = args.steps
    fault_after_s = (budget_s * args.fault_at
                     if (budget_s and args.fault_at is not None) else None)
    fault_after_step = (int(args.steps * args.fault_at)
                        if (total_steps and args.fault_at is not None)
                        else None)

    def _vm_rss_mb():
        # CURRENT resident set (ru_maxrss is the high-water mark only —
        # it cannot distinguish a steady leak from one transient spike)
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    rss_curve = []  # (step, VmRSS MB) sampled during the run
    t_start = time.perf_counter()
    step = 0
    while True:
        elapsed = time.perf_counter() - t_start
        if budget_s is not None and elapsed >= budget_s:
            break
        if total_steps is not None and step >= total_steps:
            break
        faulted = (
            (fault_after_s is not None and elapsed >= fault_after_s)
            or (fault_after_step is not None and step >= fault_after_step))
        chunk = (ring_fault if faulted else ring)[step % 8]
        t0 = time.perf_counter()
        states, out = stepper.step_many(states, chunk)
        trig = np.asarray(out["trigger_abs"])
        walls.append((time.perf_counter() - t0) * 1e3)
        hit = trig >= 0
        if hit.any():
            events += int(hit.sum())
            if step % 8 in (4, 5):  # single-source event (the trigger
                # can land in the chunk after the burst's onset slot)
                xy = np.asarray(out["xy"])[hit]
                err = float(np.abs(xy - plane).max())
                if faulted:
                    xy_err_max_fault = max(xy_err_max_fault, err)
                else:
                    xy_err_max = max(xy_err_max, err)
            if args.track:
                # identity persistence: the dominant confirmed track's id
                active = np.asarray(out["track_confirmed"])
                ids = np.asarray(out["track_id"])
                dom = ids[np.asarray(hit)][active[np.asarray(hit)]]
                bucket = track_ids_post if faulted else track_ids_pre
                bucket.update(int(v) for v in np.unique(dom))
        if step == 19:  # RSS baseline after warmup/compiles
            rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        if os.environ.get("ATRT_TRACEMALLOC"):
            import tracemalloc

            base_step = int(os.environ.get("ATRT_TM_BASE", 400))
            if step == base_step - 200:
                tracemalloc.start(25)
            elif step == base_step:
                globals()["_tm_base"] = tracemalloc.take_snapshot()
            elif step == base_step + 2000:
                snap = tracemalloc.take_snapshot()
                for st in snap.compare_to(
                        globals()["_tm_base"], "traceback")[:10]:
                    print(f"tm {st.size_diff/1024:+.0f} KB "
                          f"({st.count_diff:+d})", file=sys.stderr)
                    for line in st.traceback.format()[-4:]:
                        print("   ", line, file=sys.stderr)
        clear_every = int(os.environ.get("ATRT_CLEAR_CACHES_EVERY", 0))
        if clear_every and step and step % clear_every == 0:
            # endurance mitigation for the jax host runtime's per-dispatch
            # retention (r5 diagnosis: ~6-7 KB/dispatch linear host-RSS
            # growth after a ~3k-step warmup, backend-independent,
            # invisible to tracemalloc, not reclaimed by malloc_trim):
            # dropping the executable caches releases it; the retrace
            # costs one compile per program per interval (amortized
            # negligible at >= 3000-step intervals)
            import gc

            jax.clear_caches()
            gc.collect()
        if step % 500 == 0:
            if os.environ.get("ATRT_MALLOC_TRIM"):
                import ctypes

                ctypes.CDLL("libc.so.6").malloc_trim(0)
            rss_curve.append((step, round(_vm_rss_mb(), 1)))
            live = (f" live_arrays={len(jax.live_arrays())}"
                    if os.environ.get("ATRT_LIVE_ARRAYS") else "")
            print(f"rss step={step} vm={rss_curve[-1][1]} MB{live}",
                  file=sys.stderr, flush=True)
        step += 1

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # very short runs (<= warmup) have no post-warmup samples: fall back
    # to the full wall list so the percentiles below never see an empty
    # slice (half == 0 additionally disables the flat-wall split)
    w = np.asarray(walls[20:] if len(walls) > 20 else walls)
    half = len(w) // 2

    def pct(a, q):
        return round(float(np.percentile(a, q)), 2) if len(a) else None

    result = {
        "metric": "streaming_soak",
        "streams": n, "steps": step, "chunk": c,
        "tracked": bool(args.track),
        "fault_at": args.fault_at,
        "events_detected": events,
        "xy_err_max_m": round(xy_err_max, 4),
        "step_ms_p50": pct(w, 50),
        "step_ms_p99": pct(w, 99),
        # flat-wall check: second half vs first half medians
        "step_ms_p50_first_half": pct(w[:half], 50),
        "step_ms_p50_second_half": pct(w[half:], 50),
        "rss_peak_growth_mb": round((rss1 - (rss0 or rss1)) / 1024.0, 1),
        "wall_s": round(time.perf_counter() - t_start, 1),
    }
    # leak gate on CURRENT RSS (post-warmup sample vs end), not the
    # ru_maxrss high-water mark: endurance means no unbounded growth; a
    # transient allocation spike moves the peak once but not the curve
    vm_growth = (rss_curve[-1][1] - rss_curve[1][1]
                 if len(rss_curve) >= 3 else 0.0)
    result["rss_growth_mb"] = round(vm_growth, 1)
    stride = max(1, len(rss_curve) // 24)
    result["rss_curve_mb"] = rss_curve[::stride]
    ok = (events >= step // 8 - 2
          and xy_err_max < 0.15
          and vm_growth < 256
          and (half < 10 or float(np.percentile(w[half:], 50))
               < 1.5 * float(np.percentile(w[:half], 50))))
    if args.fault_at is not None:
        result["xy_err_max_post_fault_m"] = round(xy_err_max_fault, 4)
        ok = ok and xy_err_max_fault < 0.15
    if args.track:
        # identity persistence: every stream sees the same physical
        # source, so dominant-track ids collapse to one value per stream;
        # across the fault the id set must not change (no track loss)
        result["track_ids_pre_fault"] = sorted(track_ids_pre)[:8]
        result["track_ids_post_fault"] = sorted(track_ids_post)[:8]
        if args.fault_at is not None:
            ok = ok and (track_ids_post <= track_ids_pre
                         or not track_ids_post)
    result["ok"] = bool(ok)
    print(json.dumps(result))
    with open("SOAK_STREAMING.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
