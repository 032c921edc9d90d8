#!/usr/bin/env python3
"""Accuracy bound for an int8-quantized DFT stage of the fused GCC kernel
(config 4: 8-mic circular, PHAT, parabolic sub-sample).

The hypothetical int8 mode: conditioned samples (x - mean, naturally
within +-128 for 8-bit ADC input) rounded to int8, windowed-DFT matrices
quantized per-output-bin to int8 (symmetric, scale = max|col|/127),
matmul accumulated in int32 (exact), dequantized to f32 before the
cross-power/PHAT/synthesis stages (which stay f32 — Mosaic cannot express
elementwise i8 anyway; see docs/PERFORMANCE.md).  This script measures the
TDOA error that quantization alone would add, against the same scenes'
float32 reference — the accuracy half of the adopt/reject decision
(the speed half is tools/int8_microbench.py at the config-4 shapes).

Run on CPU; numerics are backend-independent.  Prints one JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from audio_triangulation_tpu import PipelineConfig, geometry  # noqa: E402
from audio_triangulation_tpu.models.localizer import (  # noqa: E402
    condition_frames,
)
from audio_triangulation_tpu.ops import (  # noqa: E402
    mxu_fft, solver as solver_ops, window as window_ops, xcorr,
)
from audio_triangulation_tpu.utils import synth  # noqa: E402


def main():
    mics = geometry.circular_array(8, 0.15)
    pairs = geometry.mic_pairs(8)
    cfg = PipelineConfig(phat=True, fft_pad_mode="circular",
                     band_hz=(800.0, 6000.0))
    h = 1.2
    rng = np.random.default_rng(7)
    planes = rng.uniform(-1.2, 1.2, (64, 2))
    sources = np.stack([
        np.array([x, y, h]) * (h / np.linalg.norm([x, y, h]))
        for x, y in planes])
    mic3 = jnp.zeros((8, 3), jnp.float32).at[:, :2].set(jnp.asarray(mics))
    true_tau = np.asarray(jax.vmap(
        lambda q: solver_ops.predicted_tdoas(
            q, mic3, jnp.asarray(pairs), 343.0, h, True)
    )(jnp.asarray(planes, jnp.float32))) * cfg.sample_rate_hz

    noise = 0.8 / (10 ** (40 / 20.0)) / np.sqrt(2)  # 40 dB SNR
    scene = synth.synth_scene(sources, mics, noise_rms=noise, seed=30)
    # ADC-scale 8-bit input, the native regime of the int8 idea
    adc = np.clip(np.round(np.asarray(scene) * 100 + 128), 0, 255)

    win = np.asarray(window_ops.window_for(cfg), np.float64)
    n, f_len = cfg.frame_size, cfg.fft_length
    cos, msin = mxu_fft.dft_matrices(n, f_len, "float32")
    wcos = win[:, None] * cos.astype(np.float64)
    wsin = win[:, None] * msin.astype(np.float64)

    def tdoa_err(re, im):
        spectra = jnp.asarray(re) + 1j * jnp.asarray(im)
        r = xcorr.cross_power(spectra, jnp.asarray(pairs), phat=True,
                              phat_eps=cfg.phat_eps)
        mask = xcorr.band_mask(cfg)
        if mask is not None:
            r = r * mask
        corr = xcorr.correlogram_from_cross_power(
            r, f_len, cfg.max_shift)
        tdoa, _ = xcorr.subsample_peak(corr, cfg.max_shift)
        return np.abs(np.asarray(tdoa) - true_tau)

    # float32 reference (the shipping path: conditioning gain <<8 is a
    # scalar; PHAT makes overall scale irrelevant)
    x = adc - adc.mean(axis=-1, keepdims=True)  # [B, M, N]
    re_f = (x @ wcos).astype(np.float32)
    im_f = (x @ wsin).astype(np.float32)
    e_f32 = tdoa_err(re_f, im_f)

    # int8 path: x -> int8 (clip +-127), per-bin-quantized int8 matrices,
    # exact int32 accumulation, per-bin dequant
    x8 = np.clip(np.round(x), -127, 127).astype(np.int8)
    def quant_cols(m):
        s = np.abs(m).max(axis=0) / 127.0
        s = np.where(s == 0, 1.0, s)
        q = np.clip(np.round(m / s), -127, 127).astype(np.int8)
        return q, s
    qc, sc = quant_cols(wcos)
    qs, ss = quant_cols(wsin)
    re_i = (x8.astype(np.int32) @ qc.astype(np.int32)) * sc
    im_i = (x8.astype(np.int32) @ qs.astype(np.int32)) * ss
    e_i8 = tdoa_err(re_i.astype(np.float32), im_i.astype(np.float32))

    out = {
        "metric": "int8_dft_tdoa_error_config4",
        "scenes": int(e_f32.shape[0]),
        "snr_db": 40, "band_hz": [800, 6000],
        "f32_median": round(float(np.median(e_f32)), 5),
        "f32_p90": round(float(np.percentile(e_f32, 90)), 5),
        "int8_median": round(float(np.median(e_i8)), 5),
        "int8_p90": round(float(np.percentile(e_i8, 90)), 5),
        "int8_minus_f32_median": round(
            float(np.median(e_i8) - np.median(e_f32)), 5),
        "unit": "samples",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
