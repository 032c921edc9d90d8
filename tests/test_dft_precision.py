"""dft_precision knob: exact-f32 DFT/synthesis contractions.

TPU's default f32 matmul runs bf16-class passes; PHAT whitening amplifies
that rounding on weak bins (measured 0.13-sample TDOA error vs float64
truth on ADC-scale frames, 1.9e-6 at 'highest').  On CPU both settings
are exact, so these tests check routing and equality; the hardware effect
is guarded by tools/tpu_smoke.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.ops import mxu_fft
from audio_triangulation_tpu.utils import synth

MICS = geometry.square_array(0.3)
PAIRS = jnp.asarray(geometry.mic_pairs(4))


def test_validate():
    with pytest.raises(ValueError):
        PipelineConfig(dft_precision="exact")


def test_fused_kernel_supports_highest():
    """The fused kernel honors dft_precision (Mosaic takes the precision
    hint), so 'highest' stays on the fast path; gcc_large does not and
    falls to the XLA pair-blocked path."""
    from audio_triangulation_tpu.models.localizer import _fused_tile
    from audio_triangulation_tpu.ops.pallas import gcc_kernel
    from audio_triangulation_tpu.ops.window import window_for

    cfg = PipelineConfig(dft_precision="highest", fused_kernel="on")
    assert _fused_tile(cfg, 4, 1024) == cfg.fused_tile_b

    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frames = jnp.asarray(
        synth.synth_scene(src, MICS, noise_rms=0.01, seed=0), jnp.float32)
    win = jnp.asarray(np.asarray(window_for(cfg), np.float32))
    got = gcc_kernel.fused_gcc(
        frames, win, np.asarray(PAIRS), cfg, tile_b=1, interpret=True)
    from audio_triangulation_tpu.models.localizer import condition_frames
    ref = mxu_fft.xcorr_mxu(condition_frames(frames, win, cfg), PAIRS, cfg)
    l = ref.shape[-1]
    np.testing.assert_allclose(
        np.asarray(got)[..., :l], np.asarray(ref), rtol=2e-3,
        atol=2e-4 * float(jnp.abs(ref).max()))


def test_equal_on_cpu_and_e2e():
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frames = jnp.asarray(
        synth.synth_scene(src, MICS, noise_rms=0.01, seed=0), jnp.float32)
    c_def = np.asarray(mxu_fft.xcorr_mxu(
        frames, PAIRS, PipelineConfig(phat=True)))
    c_hi = np.asarray(mxu_fft.xcorr_mxu(
        frames, PAIRS, PipelineConfig(phat=True, dft_precision="highest")))
    np.testing.assert_allclose(c_hi, c_def, rtol=1e-6, atol=1e-7)

    loc = Localizer.create(
        MICS, PipelineConfig(phat=True, dft_precision="highest"))
    xy = np.asarray(loc(frames)["xy"])[0]
    assert np.linalg.norm(xy - [0.5, 0.4]) < 0.02, xy
