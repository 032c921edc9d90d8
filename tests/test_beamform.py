"""Beamformed source-audio extraction: delay-and-sum SNR gain and MVDR
interference suppression at a localized position (ops/beamform.py)."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import PipelineConfig, geometry
from audio_triangulation_tpu.ops import beamform
from audio_triangulation_tpu.utils import synth

MICS = geometry.circular_array(6, 0.25)
CFG = PipelineConfig()
HEIGHT = 1.2


def _place(x, y):
    p = np.array([x, y, HEIGHT])
    return p * (HEIGHT / np.linalg.norm(p))


def _corr(a, b):
    """Alignment-free similarity: normalized cross-correlation peak."""
    a = a - a.mean()
    b = b - b.mean()
    c = np.correlate(a, b, mode="full")
    return np.max(np.abs(c)) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)


def _das(frames, delays):
    return np.asarray(beamform.extract_das(
        jnp.asarray(frames, jnp.float32), delays, CFG))


def test_delays_roundtrip_with_synth():
    """source_delays matches the synthetic scene's geometry: aligning with
    the true delays reproduces the emitted burst nearly perfectly, and
    beats an unaligned (zero-delay) sum."""
    sig = synth.chirp_burst(1024, CFG.sample_rate_hz)
    pos = _place(0.4, -0.5)
    frames = np.asarray(synth.synth_scene(
        pos, MICS, signal=sig, noise_rms=0.0, seed=21))[0]
    delays = beamform.source_delays(
        jnp.asarray(pos), MICS, CFG)
    y = _das(frames, delays)
    # 0.98: synth applies delays as CIRCULAR frame-length FFT shifts while
    # the extractor aligns linearly (2x zero-pad), so frame edges differ
    assert _corr(y, sig) > 0.98, _corr(y, sig)
    y0 = _das(frames, jnp.zeros_like(delays))
    assert np.var(y) > 1.1 * np.var(y0)


def test_das_snr_gain_over_single_mic():
    """Delay-and-sum at the true position averages down uncorrelated noise:
    ~1/M residual noise power, better clean-signal correlation than any
    single mic."""
    rng = np.random.default_rng(11)
    sig = synth.chirp_burst(1024, CFG.sample_rate_hz)
    pos = _place(0.6, 0.3)
    clean = np.asarray(synth.synth_scene(
        pos, MICS, signal=sig, noise_rms=0.0, seed=11))[0]  # [M, N]
    noisy = clean + rng.normal(0, 0.2, clean.shape)

    delays = beamform.source_delays(
        jnp.asarray(pos), MICS, CFG)
    y = _das(noisy, delays)
    c_beam = _corr(y, sig)
    c_single = max(_corr(noisy[m], sig) for m in range(len(MICS)))
    assert c_beam > c_single + 0.03, (c_beam, c_single)
    # residual noise power shrinks roughly like 1/M (7.8 dB ideal for M=6)
    noise_out = y - _das(clean, delays)
    gain_db = 10 * np.log10(
        np.var(noisy[0] - clean[0]) / max(np.var(noise_out), 1e-12))
    assert gain_db > 4.0, gain_db


def test_das_steers_away_from_interferer():
    """Two simultaneous sources: extraction at A's position favors A's
    waveform over B's, and vice versa."""
    sig_a = synth.chirp_burst(1024, CFG.sample_rate_hz)
    sig_b = synth.colored_burst(1024, CFG.sample_rate_hz, seed=5)
    pa, pb = _place(0.7, 0.2), _place(-0.5, -0.6)
    fa = np.asarray(synth.synth_scene(
        pa, MICS, signal=sig_a, noise_rms=0.0, seed=1))[0]
    fb = np.asarray(synth.synth_scene(
        pb, MICS, signal=sig_b, noise_rms=0.0, seed=2))[0]
    mix = fa + fb

    for pos, want, other in ((pa, sig_a, sig_b), (pb, sig_b, sig_a)):
        delays = beamform.source_delays(
            jnp.asarray(pos), MICS, CFG)
        y = _das(mix, delays)
        assert _corr(y, want) > _corr(y, other), pos


def test_mvdr_suppresses_interferer_more_than_das():
    """MVDR places an adaptive null on the directional interferer; the
    interference residual must be well below delay-and-sum's."""
    rng = np.random.default_rng(13)
    sig_a = synth.chirp_burst(1024, CFG.sample_rate_hz)
    sig_b = synth.colored_burst(1024, CFG.sample_rate_hz, seed=7)
    pa, pb = _place(0.7, 0.2), _place(-0.5, -0.6)
    fa = np.asarray(synth.synth_scene(
        pa, MICS, signal=sig_a, noise_rms=0.0, seed=3))[0]
    fb = np.asarray(synth.synth_scene(
        pb, MICS, signal=sig_b, noise_rms=0.0, seed=4))[0]
    noise = rng.normal(0, 0.01, fa.shape)
    mix = fa + 3.0 * fb + noise

    delays = beamform.source_delays(
        jnp.asarray(pa), MICS, CFG)
    mv = np.asarray(beamform.extract_mvdr(
        jnp.asarray(mix, jnp.float32), delays, CFG))
    das = _das(mix, delays)
    # under a 3x interferer the adaptive null is what recovers fidelity
    assert _corr(mv, sig_a) > 0.6, _corr(mv, sig_a)
    assert _corr(mv, sig_a) > _corr(das, sig_a) + 0.15
    # and on the clean target alone MVDR is distortionless
    mv_clean = np.asarray(beamform.extract_mvdr(
        jnp.asarray(fa, jnp.float32), delays, CFG))
    assert _corr(mv_clean, sig_a) > 0.98, _corr(mv_clean, sig_a)

    # residual after projecting out the target component (the beamformer's
    # own clean-target response is the distortionless reference)
    ref = _das(fa, delays)

    def resid(y):
        r = y - ref * (np.dot(y, ref) / np.dot(ref, ref))
        return float(np.var(r))

    assert resid(mv) < 0.6 * resid(das), (resid(mv), resid(das))


def test_localizer_extract_end_to_end():
    """Localizer.extract: localize THEN extract at the estimated position
    (sphere-consistent lift) recovers the emitted waveform."""
    from audio_triangulation_tpu import Localizer

    sig = synth.chirp_burst(1024, CFG.sample_rate_hz)
    pos = _place(0.5, 0.4)
    frames = jnp.asarray(synth.synth_scene(
        pos, MICS, signal=sig, noise_rms=0.02, seed=31), jnp.float32)
    loc = Localizer.create(MICS, CFG)
    y = np.asarray(loc.extract(frames))[0]  # xy estimated internally
    assert _corr(y, sig) > 0.95, _corr(y, sig)
    y2 = np.asarray(loc.extract(frames, method="mvdr"))[0]
    assert _corr(y2, sig) > 0.9, _corr(y2, sig)
