#!/usr/bin/env python3
"""Accuracy benchmark: TDOA and position error vs SNR, against geometric
ground truth (the BASELINE accuracy target is < 0.1-sample TDOA error).

Prints one JSON line per SNR point and writes BENCH_ACCURACY.json.
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
    from audio_triangulation_tpu.ops import solver as solver_ops
    from audio_triangulation_tpu.utils import synth

    mics = geometry.square_array(0.3)
    pairs = geometry.mic_pairs(4)
    mic3 = jnp.zeros((4, 3), jnp.float32).at[:, :2].set(jnp.asarray(mics))
    h = 1.2
    rng = np.random.default_rng(7)

    n_scenes = 256
    planes = rng.uniform(-1.2, 1.2, (n_scenes, 2))
    sources = np.stack([
        np.array([x, y, h]) * (h / np.linalg.norm([x, y, h]))
        for x, y in planes])
    true_tau = np.asarray(jax.vmap(
        lambda q: solver_ops.predicted_tdoas(
            q, mic3, jnp.asarray(pairs), 343.0, h, True)
    )(jnp.asarray(planes, jnp.float32))) * 50_000.0

    results = []
    # signal amplitude is 0.8; noise_rms sweeps SNR
    for snr_db in (40, 30, 20, 10, 6, 0):
        noise = 0.8 / (10 ** (snr_db / 20.0)) / np.sqrt(2)
        frames = synth.synth_scene(
            sources, mics, noise_rms=noise, seed=snr_db)
        # 'band_crop' = the headline bench config (PHAT band-limited to the
        # chirp source's 800-6000 Hz, cropped spectra); 'band_auto' is its
        # hands-free form (per-event coherence-selected band, no constant
        # matched to the source); 'auto_hybrid' adds the coherence-gated
        # phase-slope sub-sample dispatch (the accuracy-flagship config)
        for method in ("plain", "phat", "band_crop", "band_auto",
                       "auto_hybrid"):
            extra = {}
            if method == "phat":
                extra = dict(phat=True)
            elif method == "band_crop":
                extra = dict(phat=True, band_hz=(800.0, 6000.0),
                             band_crop=True)
            elif method == "band_auto":
                extra = dict(phat=True, band_hz="auto")
            elif method == "auto_hybrid":
                extra = dict(phat=True, band_hz="auto",
                             subsample_method="hybrid")
            # stride 3 = the coarse init grid bench.py runs with (the GN
            # solver refines; this record proves accuracy is unchanged)
            for stride in (1, 3):
                loc = Localizer.create(
                    mics, PipelineConfig(fft_pad_mode="circular", **extra),
                    init_grid_stride=stride)
                out = loc(jnp.asarray(frames, jnp.float32))
                est_tau = np.asarray(out["tdoa_samples"])
                xy = np.asarray(out["xy"])
                tdoa_err = np.abs(est_tau - true_tau)
                xy_err = np.linalg.norm(xy - planes, axis=-1)
                rec = {
                    "snr_db": snr_db,
                    "method": method,
                    "init_grid_stride": stride,
                    "tdoa_err_median_samples": round(
                        float(np.median(tdoa_err)), 4),
                    "tdoa_err_p90_samples": round(
                        float(np.percentile(tdoa_err, 90)), 4),
                    "xy_err_median_cm": round(
                        float(np.median(xy_err)) * 100, 2),
                    "xy_err_p90_cm": round(
                        float(np.percentile(xy_err, 90)) * 100, 2),
                    "scenes": n_scenes,
                }
                results.append(rec)
                print(json.dumps(rec))

    # --- 8-bit ADC front end (the firmware's input format) ---
    frames = synth.synth_scene(sources, mics, noise_rms=0.01, seed=99)
    u8 = synth.to_adc_u8(frames)
    loc = Localizer.create(
        mics, PipelineConfig(fft_pad_mode="circular"))
    out = loc(jnp.asarray(u8, jnp.float32))
    tdoa_err = np.abs(np.asarray(out["tdoa_samples"]) - true_tau)
    xy_err = np.linalg.norm(np.asarray(out["xy"]) - planes, axis=-1)
    rec = {
        "snr_db": "8bit_adc",
        "phat": False,
        "tdoa_err_median_samples": round(float(np.median(tdoa_err)), 4),
        "tdoa_err_p90_samples": round(
            float(np.percentile(tdoa_err, 90)), 4),
        "xy_err_median_cm": round(float(np.median(xy_err)) * 100, 2),
        "xy_err_p90_cm": round(float(np.percentile(xy_err, 90)) * 100, 2),
        "scenes": n_scenes,
    }
    results.append(rec)
    print(json.dumps(rec))

    with open("BENCH_ACCURACY.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
