"""Per-event automatic band selection (band_hz='auto') and the hybrid
sub-sample dispatch.

The reference correlator has no spectral processing at all
(src/components/correlations.c:4-24); the static band_hz generalized it, but
its value had to be hand-matched to the source.  'auto' reads the usable
band off each event's pair coherence (ops/xcorr.auto_band_weight), and
'hybrid' dispatches the phase-slope sub-sample refinement per pair where
coherence says it wins.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.models.localizer import condition_frames
from audio_triangulation_tpu.ops import solver as solver_ops, xcorr
from audio_triangulation_tpu.ops import window as window_ops
from audio_triangulation_tpu.utils import synth

MICS = geometry.square_array(0.3)
PAIRS = geometry.mic_pairs(4)
H = 1.2


def _scenes(n_scenes, seed=7):
    rng = np.random.default_rng(seed)
    planes = rng.uniform(-1.2, 1.2, (n_scenes, 2))
    sources = np.stack([
        np.array([x, y, H]) * (H / np.linalg.norm([x, y, H]))
        for x, y in planes])
    mic3 = jnp.zeros((4, 3), jnp.float32).at[:, :2].set(jnp.asarray(MICS))
    true_tau = np.asarray(jax.vmap(
        lambda q: solver_ops.predicted_tdoas(
            q, mic3, jnp.asarray(PAIRS), 343.0, H, True)
    )(jnp.asarray(planes, jnp.float32))) * 50_000.0
    return planes, sources, true_tau


def _tdoa_err(frames, true_tau, **cfg_kwargs):
    loc = Localizer.create(
        MICS, PipelineConfig(fft_pad_mode="circular", **cfg_kwargs))
    out = loc(jnp.asarray(frames, jnp.float32))
    return np.abs(np.asarray(out["tdoa_samples"]) - true_tau)


def test_auto_band_weight_discovers_chirp_band():
    """On the 800-6000 Hz chirp the selected bins must live inside (a
    slightly padded) chirp band and cover a reasonable chunk of it."""
    _, sources, _ = _scenes(1)
    frames = synth.synth_scene(sources, MICS, noise_rms=0.03, seed=1)
    cfg = PipelineConfig(fft_pad_mode="circular", phat=True, band_hz="auto")
    win = jnp.asarray(window_ops.window_for(cfg))
    x = condition_frames(jnp.asarray(frames, jnp.float32), win, cfg)
    spectra = xcorr.rfft_frames(x, cfg.fft_length)
    w = np.asarray(xcorr.auto_band_weight(
        spectra, jnp.asarray(PAIRS), cfg))[0]
    assert w.shape == (cfg.fft_length // 2 + 1,)
    assert set(np.unique(w)) <= {0.0, 1.0}
    freqs = np.arange(w.size) * (50_000.0 / cfg.fft_length)
    sel = freqs[w > 0]
    assert sel.size >= 32  # a real band, not a handful of bins
    assert sel.min() >= 500.0 and sel.max() <= 7000.0
    # DC and Nyquist always excluded
    assert w[0] == 0.0 and w[-1] == 0.0


def test_auto_band_weight_full_band_fallback():
    """Noise-only frames (flat coherence, nothing clears the floor widely)
    must not zero the correlogram: weight keeps >= min_bins bins."""
    rng = np.random.default_rng(0)
    frames = rng.normal(0.0, 0.1, (2, 4, 1024))
    cfg = PipelineConfig(fft_pad_mode="circular", band_hz="auto")
    win = jnp.asarray(window_ops.window_for(cfg))
    x = condition_frames(jnp.asarray(frames, jnp.float32), win, cfg)
    spectra = xcorr.rfft_frames(x, cfg.fft_length)
    w = np.asarray(xcorr.auto_band_weight(spectra, jnp.asarray(PAIRS), cfg))
    assert (w.sum(-1) >= cfg.auto_band_min_bins).all()


def test_auto_matches_hand_tuned_band_on_chirp():
    """The headline criterion: 'auto' within noise of the hand-tuned
    (800, 6000) band on chirp scenes, and far better than full-band PHAT
    (its documented failure mode on band-limited sources)."""
    _, sources, true_tau = _scenes(32)
    noise = 0.8 / (10 ** (30 / 20.0)) / np.sqrt(2)  # 30 dB SNR
    frames = synth.synth_scene(sources, MICS, noise_rms=noise, seed=30)
    e_hand = _tdoa_err(frames, true_tau, phat=True, band_hz=(800.0, 6000.0))
    e_auto = _tdoa_err(frames, true_tau, phat=True, band_hz="auto")
    e_full = _tdoa_err(frames, true_tau, phat=True)
    assert np.median(e_auto) <= 1.5 * np.median(e_hand) + 0.01
    assert np.median(e_auto) < 0.35 * np.median(e_full)


def test_auto_no_regression_on_broadband():
    """On a white (full-band) source the auto mask must not hurt: within
    noise of full-band PHAT."""
    _, sources, true_tau = _scenes(32, seed=11)
    rng = np.random.default_rng(3)
    n = 1024
    t = np.arange(n)
    sig = rng.normal(0, 1, n) * np.exp(-0.5 * ((t - n / 2) / (n / 8)) ** 2)
    sig /= np.abs(sig).max()
    noise = 0.8 / (10 ** (30 / 20.0)) / np.sqrt(2)
    frames = synth.synth_scene(
        sources, MICS, signal=sig, noise_rms=noise, seed=31)
    e_auto = _tdoa_err(frames, true_tau, phat=True, band_hz="auto")
    e_full = _tdoa_err(frames, true_tau, phat=True)
    assert np.median(e_auto) <= 1.2 * np.median(e_full) + 0.01


def test_hybrid_beats_parabolic_on_coherent_chirp():
    """subsample_method='hybrid' routes coherent pairs to phase-slope:
    on a high-SNR chirp with the auto band it must clearly beat the
    parabolic estimate AND meet the <0.1-sample target at p90."""
    _, sources, true_tau = _scenes(32, seed=5)
    noise = 0.8 / (10 ** (40 / 20.0)) / np.sqrt(2)
    frames = synth.synth_scene(sources, MICS, noise_rms=noise, seed=40)
    e_par = _tdoa_err(frames, true_tau, phat=True, band_hz="auto")
    e_hyb = _tdoa_err(frames, true_tau, phat=True, band_hz="auto",
                      subsample_method="hybrid")
    assert np.median(e_hyb) < 0.5 * np.median(e_par)
    assert np.percentile(e_hyb, 90) < 0.1


def test_hybrid_falls_back_to_parabolic_at_low_coherence():
    """With the gate set impossibly high, hybrid == parabolic exactly."""
    _, sources, true_tau = _scenes(8, seed=9)
    frames = synth.synth_scene(sources, MICS, noise_rms=0.05, seed=9)
    e_par = _tdoa_err(frames, true_tau, phat=True)
    e_hyb = _tdoa_err(frames, true_tau, phat=True,
                      subsample_method="hybrid", hybrid_coherence_min=1.0)
    np.testing.assert_allclose(e_hyb, e_par, atol=1e-6)


def test_streaming_band_auto_localizes():
    """The streaming path (correlate_frames routes 'auto' to the FFT
    engine) still detects and localizes with band_hz='auto'."""
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    src = np.array([0.5, 0.4, H]) * (H / np.linalg.norm([0.5, 0.4, H]))
    frame = synth.synth_scene(src, MICS, noise_rms=0.01, seed=2)[0]
    t_total = 4096 * 3
    stream = np.zeros((4, t_total))
    stream[:, 2048:2048 + 1024] = frame * 0.9
    stream = (stream * 100 + 128)  # ADC-ish scale for the detector

    sl = StreamingLocalizer.create(
        MICS, PipelineConfig(phat=True, band_hz="auto"),
        stream=StreamConfig(chunk_size=2048))
    state, outs = sl.run(stream)
    assert any(bool(o["event"]) for o in outs)
    ev = [o for o in outs if bool(o["event"])][-1]
    assert np.linalg.norm(np.asarray(ev["xy"]) - src[:2]) < 0.2


def test_config_validation():
    with pytest.raises(ValueError, match="band_crop"):
        PipelineConfig(band_hz="auto", band_crop=True)
    with pytest.raises(ValueError, match="only string value"):
        PipelineConfig(band_hz="wide")
    with pytest.raises(ValueError, match="time-domain"):
        PipelineConfig(band_hz="auto", xcorr_mode="time")
    with pytest.raises(ValueError, match="auto_band_rel"):
        PipelineConfig(band_hz="auto", auto_band_rel=0.0)
    with pytest.raises(ValueError, match="hybrid_coherence_min"):
        PipelineConfig(hybrid_coherence_min=1.5)
    with pytest.raises(ValueError, match="static bin set"):
        xcorr.restrict_bins_to_band(
            np.arange(10), PipelineConfig(band_hz="auto"))
    assert PipelineConfig(band_hz="auto").band_auto
    assert not PipelineConfig(band_hz=(800.0, 6000.0)).band_auto


def test_auto_band_fused_kernel_dispatch():
    """band_hz='auto' and phase/hybrid sub-sampling run IN-KERNEL since r5
    (gcc_kernel spectral-stats mode): _fused_tile must return a tile for
    them, and still gate off the configurations the kernel cannot express
    (band-crop's reindexed bins, smoothed scot/roth/ml weightings)."""
    from audio_triangulation_tpu.models.localizer import _fused_tile

    cfg = PipelineConfig(phat=True, band_hz="auto", fused_kernel="on")
    assert _fused_tile(cfg, 4, 1024) is not None
    cfg_h = PipelineConfig(phat=True, subsample_method="hybrid",
                           fused_kernel="on")
    assert _fused_tile(cfg_h, 4, 1024) is not None
    cfg_crop = PipelineConfig(phat=True, band_hz=(800.0, 6000.0),
                              band_crop=True, subsample_method="hybrid",
                              fused_kernel="on")
    assert _fused_tile(cfg_crop, 4, 1024) is None
    cfg_ml = PipelineConfig(weighting="ml", band_hz="auto",
                            fused_kernel="on")
    assert _fused_tile(cfg_ml, 4, 1024) is None


def test_streaming_hybrid_refines_event_tdoa():
    """subsample_method='hybrid'/'phase' now reaches the STREAMING path:
    on an accepted-event step the TDOAs are phase-slope-refined from the
    captured frame's spectra (the batch dispatch, anchored on the
    smoothed integer peak); non-event steps keep the parabolic estimate
    of the carried EMA state."""
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    _, sources, true_tau = _scenes(1, seed=21)
    noise = 0.8 / (10 ** (40 / 20.0)) / np.sqrt(2)
    frame = synth.synth_scene(sources, MICS, noise_rms=noise, seed=41)[0]
    stream = np.zeros((4, 4096 * 3))
    stream[:, 2048:2048 + 1024] = frame * 0.9
    stream = stream * 100 + 128  # ADC-ish scale for the detector

    def event_tdoa(**kw):
        sl = StreamingLocalizer.create(
            MICS, PipelineConfig(fft_pad_mode="circular", phat=True,
                                 band_hz="auto", **kw),
            stream=StreamConfig(chunk_size=2048))
        _, outs = sl.run(stream)
        ev = [o for o in outs if bool(o["event"])]
        assert ev
        return np.asarray(ev[0]["tdoa_samples"])

    e_par = np.abs(event_tdoa() - true_tau[0])
    e_hyb = np.abs(event_tdoa(subsample_method="hybrid") - true_tau[0])
    assert np.median(e_hyb) <= np.median(e_par) + 1e-6, (e_hyb, e_par)
    assert np.percentile(e_hyb, 90) < 0.1, e_hyb
