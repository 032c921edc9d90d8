"""MXU matmul-DFT GCC engine vs the XLA-FFT reference implementation."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.ops import mxu_fft, xcorr
from audio_triangulation_tpu.utils import synth

PAIRS = jnp.asarray([[0, 1], [0, 2], [1, 2]], dtype=jnp.int32)


def _frames(rng, b=2, m=3, n=1024):
    return jnp.asarray(rng.normal(size=(b, m, n)).astype(np.float32))


def test_mxu_matches_fft_f32(rng):
    cfg = PipelineConfig(xcorr_mode="mxu")
    frames = _frames(rng)
    ours = np.asarray(mxu_fft.xcorr_mxu(frames, PAIRS, cfg))
    ref = np.asarray(xcorr.xcorr_fft(frames, PAIRS, cfg))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours / scale, ref / scale, atol=3e-5)


def test_mxu_matches_fft_bf16(rng):
    cfg = PipelineConfig()
    frames = _frames(rng)
    ours = np.asarray(
        mxu_fft.xcorr_mxu(frames, PAIRS, cfg, matmul_dtype="bfloat16"))
    ref = np.asarray(xcorr.xcorr_fft(frames, PAIRS, cfg))
    scale = np.abs(ref).max()
    # bf16 matmul with f32 accumulation: ~1e-2 relative worst case
    np.testing.assert_allclose(ours / scale, ref / scale, atol=3e-2)


def test_mxu_phat_matches_fft_phat(rng):
    cfg = PipelineConfig(phat=True, phat_eps=1e-9)
    sig = synth.chirp_burst(1024, 50_000.0)
    b = synth.fractional_delay(sig, np.float64(11.0))
    c = synth.fractional_delay(sig, np.float64(-6.0))
    frames = jnp.asarray(np.stack([sig, b, c])[None].astype(np.float32))
    ours = np.asarray(mxu_fft.xcorr_mxu(frames, PAIRS, cfg))
    ref = np.asarray(xcorr.xcorr_fft(frames, PAIRS, cfg))
    # eps enters differently (rsqrt(m^2+eps) vs m+eps); compare loosely and
    # require identical peaks
    assert np.argmax(ours[0, 0]) == np.argmax(ref[0, 0])
    assert np.argmax(ours[0, 1]) == np.argmax(ref[0, 1])
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_mxu_subsample_accuracy_bf16(rng):
    """bf16 matmuls must not degrade sub-sample TDOA accuracy below the
    <0.1-sample target."""
    cfg = PipelineConfig()
    sig = synth.chirp_burst(1024, 50_000.0)
    for d in (-12.3, 2.75, 33.5):
        b = synth.fractional_delay(sig, np.float64(d))
        frames = jnp.asarray(np.stack([sig, b])[None].astype(np.float32))
        corr = mxu_fft.xcorr_mxu(
            frames, jnp.asarray([[0, 1]], jnp.int32), cfg,
            matmul_dtype="bfloat16")
        tdoa, _ = xcorr.subsample_peak(corr, cfg.max_shift)
        assert abs(float(tdoa[0, 0]) - d) < 0.1


def test_circular_mode_consistent(rng):
    cfg = PipelineConfig(fft_pad_mode="circular")
    assert cfg.fft_length == 1024
    frames = _frames(rng, b=1)
    ours = np.asarray(mxu_fft.xcorr_mxu(frames, PAIRS, cfg))
    ref = np.asarray(xcorr.xcorr_fft(frames, PAIRS, cfg))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours / scale, ref / scale, atol=3e-5)


def test_pairblocked_matches_full(rng):
    from audio_triangulation_tpu.core import geometry

    cfg = PipelineConfig(fft_pad_mode="circular", phat=True)
    frames = jnp.asarray(rng.normal(size=(2, 8, 512)).astype(np.float32))
    pairs = jnp.asarray(geometry.mic_pairs(8))  # 28 pairs
    full = np.asarray(mxu_fft.xcorr_mxu(frames, pairs, cfg))
    blocked = np.asarray(mxu_fft.xcorr_mxu_pairblocked(
        frames, pairs, cfg, pair_chunk=5))  # uneven chunking + padding
    np.testing.assert_allclose(blocked, full, atol=1e-5)
