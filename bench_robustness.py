#!/usr/bin/env python3
"""Robustness benchmark: localization error of each estimator variant on
adverse scenes — reverberant (image-source shoebox room) and noisy
anechoic — quantifying what the GCC weighting family, band-limited /
partial PHAT, and phase-slope TDOA buy.

Prints one JSON line per (condition, method) and writes
BENCH_ROBUSTNESS.json.
"""

import json

import numpy as np


METHODS = {
    "plain": {},
    "phat": {"phat": True},
    "phat_band": {"phat": True, "band_hz": (800.0, 6000.0)},
    "phat_beta05": {"phat": True, "phat_beta": 0.5},
    "scot": {"weighting": "scot"},
    "roth": {"weighting": "roth"},
    "ml": {"weighting": "ml"},
    "phase": {"subsample_method": "phase"},
    # round-4 hands-free configs: per-event coherence-driven band
    # weighting and the coherence-gated phase-slope dispatch — the same
    # rows BENCH_ACCURACY carries, here under reverb/noise instead of SNR
    "band_auto": {"phat": True, "band_hz": "auto"},
    "auto_hybrid": {"phat": True, "band_hz": "auto",
                    "subsample_method": "hybrid"},
}


def main():
    import jax.numpy as jnp

    from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
    from audio_triangulation_tpu.utils import room as room_mod
    from audio_triangulation_tpu.utils import synth

    mics = geometry.square_array(0.3)
    h = 1.2
    rng = np.random.default_rng(11)
    n_scenes = 64
    planes = rng.uniform(-1.0, 1.0, (n_scenes, 2))
    sources = np.stack([
        np.array([x, y, h]) * (h / np.linalg.norm([x, y, h]))
        for x, y in planes])

    conditions = {}

    # anechoic + 10 dB SNR white noise
    noise = 0.8 / (10 ** (10 / 20.0)) / np.sqrt(2)
    conditions["anechoic_10db"] = synth.synth_scene(
        sources, mics, noise_rms=noise, seed=1).astype(np.float32)

    # reverberant shoebox (RT60 ~ 0.25 s), array at room center, mild noise
    size = (6.0, 5.0, 3.0)
    alpha = room_mod.absorption_for_rt60(size, 0.25)
    r = room_mod.ShoeboxRoom(size=size, absorption=alpha, max_order=5)
    shift = np.array([3.0, 2.5, 0.8])
    mics3 = np.concatenate([mics, np.zeros((mics.shape[0], 1))], -1) + shift
    frames_rev = np.asarray(room_mod.simulate_batch(
        jnp.asarray(sources + shift, jnp.float32), mics3, r))
    frames_rev = frames_rev + rng.normal(
        0, 0.01, frames_rev.shape).astype(np.float32)
    conditions["reverb_rt60_0.25"] = frames_rev.astype(np.float32)

    results = []
    for method, kw in METHODS.items():
        loc = Localizer.create(mics, PipelineConfig(**kw))
        for cond, frames in conditions.items():
            out = loc(jnp.asarray(frames))
            xy = np.asarray(out["xy"])
            err_cm = 100 * np.linalg.norm(xy - planes, axis=-1)
            row = {
                "condition": cond,
                "method": method,
                "xy_err_median_cm": round(float(np.median(err_cm)), 2),
                "xy_err_p90_cm": round(float(np.percentile(err_cm, 90)), 2),
                "hit_rate_lt_10cm": round(float((err_cm < 10).mean()), 3),
                "scenes": n_scenes,
            }
            results.append(row)
            print(json.dumps(row))

    with open("BENCH_ROBUSTNESS.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
