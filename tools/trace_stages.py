#!/usr/bin/env python3
"""Per-stage on-device trace tables for the shipping configurations.

Runs a chosen pipeline config under ``jax.profiler``, parses the XSpace
(xplane.pb) trace, and aggregates *device* durations per HLO op, grouped
into pipeline stages — the ground-truth roofline methodology from
docs/PERFORMANCE.md (immune to tunnel RTT and dispatch caching).

Usage (real TPU):
    python tools/trace_stages.py headline        # band-crop + stride-3
    python tools/trace_stages.py fullband
    python tools/trace_stages.py streaming --streams 1024 2048 4096
    python tools/trace_stages.py config5b

Prints a stage table (total device ms per timed iteration, share) and the
top HLO ops, and writes JSON next to it when --json is given.
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


# ----------------------------------------------------------------------
# XSpace parsing
# ----------------------------------------------------------------------

def load_xspace(logdir):
    """Parse the newest xplane.pb under logdir into (device planes)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def device_op_durations(xspace):
    """{op_name: total_duration_us} summed over all TPU device planes'
    XLA-op lines (steady state: everything in the trace window)."""
    totals = {}
    for plane in xspace.planes:
        if "TPU" not in plane.name or "SparseCore" in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            # device planes carry XLA Modules / XLA Ops / Steps lines;
            # per-op truth lives in the "XLA Ops" line
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] = (totals.get(name, 0.0)
                                + ev.duration_ps / 1e6)
    return totals


STAGE_PATTERNS = [
    # (stage, regex on HLO op name) — first match wins
    ("gcc fused kernel (pallas)", r"gcc_kernel|fused_gcc|custom-call.*gcc"),
    ("gcc large kernel (pallas)", r"gcc_large"),
    ("gn solver kernel (pallas)", r"gn_kernel|gn_solve"),
    ("srp scoring (matmul)", r"srp|one_hot|onehot"),
    ("dft/synthesis matmul", r"dot|convolution"),
    ("fft", r"fft"),
    ("argmax/peaks", r"arg|reduce|iota|select-and|sort"),
    ("copies/layout", r"copy|transpose|bitcast|reshape|broadcast|concat"),
    ("elementwise fusion", r"fusion|add|multiply|subtract|divide|rsqrt"),
]


def classify(name):
    low = name.lower()
    for stage, pat in STAGE_PATTERNS:
        if re.search(pat, low):
            return stage
    return "other"


def stage_table(totals, iters):
    stages = {}
    for name, us in totals.items():
        stages.setdefault(classify(name), [0.0, 0])
        stages[classify(name)][0] += us
        stages[classify(name)][1] += 1
    total = sum(v[0] for v in stages.values())
    rows = sorted(stages.items(), key=lambda kv: -kv[1][0])
    out = []
    print(f"\n{'stage':34s} {'ms/iter':>10s} {'share':>7s} {'#ops':>5s}")
    for stage, (us, n) in rows:
        ms = us / 1e3 / iters
        print(f"{stage:34s} {ms:10.3f} {100 * us / total:6.1f}% {n:5d}")
        out.append({"stage": stage, "ms_per_iter": ms,
                    "share": us / total, "ops": n})
    print(f"{'TOTAL device':34s} {total / 1e3 / iters:10.3f}")
    return out, total / 1e3 / iters


def top_ops(totals, iters, k=15):
    print(f"\n{'top HLO ops':70s} {'ms/iter':>10s}")
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:k]
    for name, us in rows:
        print(f"{name[:70]:70s} {us / 1e3 / iters:10.3f}")
    return [{"op": n, "ms_per_iter": us / 1e3 / iters} for n, us in rows]


# ----------------------------------------------------------------------
# traced workloads
# ----------------------------------------------------------------------

def trace_run(fn, args_dev, iters, logdir):
    """Warm up, then trace `iters` chained dispatches of fn."""
    import jax

    for _ in range(3):
        jax.block_until_ready(fn(*args_dev))
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args_dev)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return wall


def build_headline(band, batch, resident, stride):
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
    from audio_triangulation_tpu.utils import synth

    mics = geometry.square_array(0.3)
    cfg = PipelineConfig(phat=True, fft_pad_mode="circular",
                         srp_dtype="bfloat16",
                         band_hz=band, band_crop=band is not None)
    loc = Localizer.create(mics, cfg, with_solver=True,
                           init_grid_stride=stride)
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frame = synth.synth_scene(src, mics, noise_rms=0.01, seed=0)
    one = np.broadcast_to(frame, (batch, 4, 1024)).astype(np.float32)
    dev = jax.devices()[0]
    frames = tuple(jax.device_put(jnp.asarray(one), dev)
                   for _ in range(resident))

    def run_one(x):
        out = loc._jitted(loc.params, x)
        return out["xy"], out["tdoa_samples"], out["rms_m"]

    run = jax.jit(lambda xs: tuple(run_one(x) for x in xs))
    return run, (frames,), batch * resident


def build_config5b(batch):
    """BENCH_CONFIGS.json config 5b: 64-mic 8x8 grid array, 4096-pt frames,
    band-cropped gcc_large path, stride-2 init grid."""
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu import (GridConfig, Localizer,
                                         PipelineConfig, geometry)
    from audio_triangulation_tpu.utils import synth

    mics = geometry.grid_array(8, 8, 0.05)
    cfg = PipelineConfig(
        frame_size_bits=12,
        max_shift_samples=geometry.max_lag_for_array(mics, PipelineConfig()),
        phat=True, fft_pad_mode="circular", srp_dtype="bfloat16",
        band_hz=(800.0, 6000.0), band_crop=True)
    grid5 = GridConfig(half_cells_x=31, half_cells_y=31, cells_per_m=16.0)
    loc = Localizer.create(mics, cfg, grid5, init_grid_stride=2)
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frame = synth.synth_scene(src, mics, n=cfg.frame_size, seed=3)
    one = np.broadcast_to(
        frame, (batch, 64, cfg.frame_size)).astype(np.float32)
    dev = jax.devices()[0]
    frames = jax.device_put(jnp.asarray(one), dev)

    # params passed as a jit ARGUMENT: closure capture would embed the
    # precomputed steering matrix (~589 MB) as an HLO constant and blow
    # the remote-compile payload limit (HTTP 413 through the axon tunnel)
    def run(params, x):
        return loc._jitted(params, x)["xy"]

    return jax.jit(run), (loc.params, frames), batch


def build_config3(t_chunks, resident):
    """BENCH_CONFIGS.json config 3: 4-mic square array, 50%-overlap framing
    of a continuous stream through the full pipeline (the framing +
    pipeline composition bench_configs times)."""
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
    from audio_triangulation_tpu.ops import framing

    mics4 = geometry.square_array(0.3)
    loc4 = Localizer.create(
        mics4, PipelineConfig(phat=True, fft_pad_mode="circular"))
    t_len = 1024 * (t_chunks + 1)  # -> 2*t_chunks+1 overlapped frames
    stream_np = np.random.default_rng(0).normal(
        0, 0.05, (4, t_len)).astype(np.float32)
    dev = jax.devices()[0]
    streams = tuple(jax.device_put(jnp.asarray(stream_np), dev)
                    for _ in range(resident))

    def one(p, s):
        frames = framing.frame_multichannel(s, 1024, 512)
        return loc4._jitted(p, frames)["xy"]

    run = jax.jit(lambda p, ss: tuple(one(p, s) for s in ss))
    n_frames = (t_len - 1024) // 512 + 1
    return (lambda ss: run(loc4.params, ss)), (streams,), \
        n_frames * resident


def build_config3_lanes(t_chunks, resident):
    """Config 3 with lane-order framing (ops.framing.
    frame_multichannel_lanes): the interleave/pad copy chain replaced by
    per-lane reshapes + transposes, time order restored on the xy output."""
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
    from audio_triangulation_tpu.ops import framing

    mics4 = geometry.square_array(0.3)
    loc4 = Localizer.create(
        mics4, PipelineConfig(phat=True, fft_pad_mode="circular"))
    t_len = 1024 * (t_chunks + 1)
    stream_np = np.random.default_rng(0).normal(
        0, 0.05, (4, t_len)).astype(np.float32)
    dev = jax.devices()[0]
    streams = tuple(jax.device_put(jnp.asarray(stream_np), dev)
                    for _ in range(resident))

    def one(p, s):
        frames, order = framing.frame_multichannel_lanes(s, 1024, 512)
        xy = loc4._jitted(p, frames)["xy"]
        return xy[jnp.asarray(order)]  # time order on the SMALL output

    run = jax.jit(lambda p, ss: tuple(one(p, s) for s in ss))
    n_frames = (t_len - 1024) // 512 + 1
    return (lambda ss: run(loc4.params, ss)), (streams,), \
        n_frames * resident


def build_config4(batch, resident, tuned=False, sub_tiles=1):
    """BENCH_CONFIGS.json config 4: 8-mic circular SRP-PHAT over the
    65x65 grid (28 pairs; the cross-power/scoring-heavy config).

    ``tuned`` applies the headline's accuracy-neutral settings (stride-2
    init grid + bf16 SRP contraction: the GN solver supersedes grid
    resolution, BENCH_ACCURACY.json); ``sub_tiles`` > 1 software-pipelines
    the fused kernel's MXU/VPU stages."""
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu import (GridConfig, Localizer,
                                         PipelineConfig, geometry)
    from audio_triangulation_tpu.utils import synth

    mics8 = geometry.circular_array(8, 0.15)
    grid64 = GridConfig(half_cells_x=32, half_cells_y=32, cells_per_m=24.0)
    cfg8 = PipelineConfig(
        phat=True, fft_pad_mode="circular",
        srp_dtype="bfloat16" if tuned else "float32",
        fused_sub_tiles=sub_tiles)
    loc8 = Localizer.create(mics8, cfg8, grid64,
                            init_grid_stride=2 if tuned else 1)
    src = np.array([0.7, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.7, 0.4, 1.2]))
    one8 = synth.synth_scene(src, mics8, noise_rms=0.01, seed=2)
    one = np.broadcast_to(one8, (batch, 8, 1024)).astype(np.float32)
    dev = jax.devices()[0]
    frames = tuple(jax.device_put(jnp.asarray(one), dev)
                   for _ in range(resident))

    run = jax.jit(
        lambda p, xs: tuple(loc8._jitted(p, x)["xy"] for x in xs))
    return (lambda xs: run(loc8.params, xs)), (frames,), batch * resident


def build_streaming(n_streams):
    """Dense vmapped stream_step at n_streams — the BENCH_STREAMING.json
    dense-path workload (3-mic reference array, 512-sample chunks)."""
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    sl = StreamingLocalizer.create(
        geometry.reference_array(), stream=StreamConfig(chunk_size=512))
    states = sl.init_states(n_streams)
    rng = np.random.default_rng(0)
    chunks = jax.device_put(jnp.asarray(
        rng.integers(127, 130, (n_streams, 3, 512)), jnp.float32))

    holder = {"states": states}

    def run(chunks):
        s, out = sl.step_many(holder["states"], chunks)
        holder["states"] = s
        return out["xy_grid"]

    return run, (chunks,), n_streams


def build_tracked(n_streams):
    """Fused tracked streaming (models/tracked.py) at n_streams — the
    BENCH_STREAMING tracked_fused workload, for the r4->r5 question of
    where the low-concurrency overhead vs the untracked step lives."""
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.tracked import (
        TrackedStreamingLocalizer)

    tsl = TrackedStreamingLocalizer.create(
        geometry.reference_array(), stream=StreamConfig(chunk_size=512))
    states = tsl.init_states(n_streams)
    rng = np.random.default_rng(0)
    chunks = jax.device_put(jnp.asarray(
        rng.integers(127, 130, (n_streams, 3, 512)), jnp.float32))

    holder = {"states": states}

    def run(chunks):
        s, out = tsl.step_many(holder["states"], chunks)
        holder["states"] = s
        return out["track_xy"]

    return run, (chunks,), n_streams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["headline", "fullband", "config3",
                                     "config3_lanes", "config4",
                                     "config4_tuned", "config5b",
                                     "streaming", "tracked"])
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--resident", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--streams", type=int, nargs="+", default=[1024])
    ap.add_argument("--stride", type=int, default=3)
    ap.add_argument("--sub-tiles", type=int, default=1)
    ap.add_argument("--json", help="write results here")
    ap.add_argument("--logdir", default="/tmp/jax-trace-stages")
    args = ap.parse_args()

    import jax

    print(f"device: {jax.devices()[0]}")
    results = []

    def one(tag, build_args):
        logdir = os.path.join(args.logdir, tag)
        os.makedirs(logdir, exist_ok=True)
        fn, fargs, units = build_args
        wall = trace_run(fn, fargs, args.iters, logdir)
        totals = device_op_durations(load_xspace(logdir))
        print(f"\n=== {tag}: wall {wall * 1e3 / args.iters:.3f} ms/iter, "
              f"{units * args.iters / wall:,.0f} units/s (wall) ===")
        stages, dev_ms = stage_table(totals, args.iters)
        ops = top_ops(totals, args.iters)
        print(f"device-limited: {units / (dev_ms / 1e3):,.0f} units/s "
              f"({dev_ms:.3f} ms device vs {wall * 1e3 / args.iters:.3f} ms "
              "wall)")
        results.append({
            "tag": tag, "units_per_iter": units,
            "wall_ms_per_iter": wall * 1e3 / args.iters,
            "device_ms_per_iter": dev_ms,
            "device_limited_units_per_sec": units / (dev_ms / 1e3),
            "stages": stages, "top_ops": ops,
        })

    if args.mode == "headline":
        one("headline_bandcrop_stride3",
            build_headline((800.0, 6000.0), args.batch, args.resident,
                           args.stride))
    elif args.mode == "fullband":
        one("fullband", build_headline(None, args.batch, args.resident,
                                       args.stride))
    elif args.mode == "config3":
        one("config3_4mic_overlap",
            build_config3(min(args.batch, 2048), args.resident))
    elif args.mode == "config3_lanes":
        one("config3_4mic_overlap_lanes",
            build_config3_lanes(min(args.batch, 2048), args.resident))
    elif args.mode == "config4":
        one("config4_8mic_srp",
            build_config4(min(args.batch, 8192), args.resident))
    elif args.mode == "config4_tuned":
        one("config4_8mic_srp_tuned",
            build_config4(min(args.batch, 8192), args.resident,
                          tuned=True, sub_tiles=args.sub_tiles))
    elif args.mode == "config5b":
        one("config5b_64mic", build_config5b(min(args.batch, 256)))
    elif args.mode == "streaming":
        for n in args.streams:
            one(f"streaming_{n}", build_streaming(n))
    elif args.mode == "tracked":
        for n in args.streams:
            one(f"tracked_{n}", build_tracked(n))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
