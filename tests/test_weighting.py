"""Generalized cross-correlation weighting family (Knapp & Carter 1976):
SCOT / Roth / Hannan-Thomson ML alongside PHAT.

New capability — the reference has no whitening at all (its correlator is
the plain time-domain sum, src/components/correlations.c:9-18); these are
the standard robustness weightings a GCC-based toolkit is expected to
offer.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.ops import xcorr
from audio_triangulation_tpu.utils import synth


def _pair():
    return jnp.asarray(np.array([[0, 1]], np.int32))


def _delayed_frames(n=1024, delay=7.0, seed=0, noise=0.01):
    rng = np.random.default_rng(seed)
    sig = synth.colored_burst(n, 50_000.0, seed=seed)
    a = sig + rng.normal(0, noise, n)
    b = synth.fractional_delay(sig, np.array(delay)) + rng.normal(0, noise, n)
    return jnp.asarray(np.stack([a, b])[None], jnp.float32)  # [1, 2, N]


def test_freq_smooth_matches_numpy_box():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 65)).astype(np.float32)
    w = 5
    got = np.asarray(xcorr.freq_smooth(jnp.asarray(x), w))
    want = np.empty_like(x)
    for i in range(65):
        lo, hi = max(0, i - w), min(65, i + w + 1)
        want[:, i] = x[:, lo:hi].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_scot_unsmoothed_equals_phat():
    """With raw per-frame periodograms (no smoothing), |Gab| = sqrt(Gaa Gbb)
    so the SCOT weight IS the PHAT weight."""
    frames = _delayed_frames()
    cfg_p = PipelineConfig(phat=True)
    cfg_s = PipelineConfig(weighting="scot", coherence_bins=0)
    cp = np.asarray(xcorr.xcorr_fft(frames, _pair(), cfg_p))
    cs = np.asarray(xcorr.xcorr_fft(frames, _pair(), cfg_s))
    np.testing.assert_allclose(cs, cp, rtol=2e-3, atol=2e-4)


def test_roth_matches_numpy_golden():
    frames = _delayed_frames()
    cfg = PipelineConfig(weighting="roth", coherence_bins=8)
    got = np.asarray(xcorr.xcorr_fft(frames, _pair(), cfg))[0, 0]

    x = np.asarray(frames[0], np.float64)
    f = cfg.fft_length
    sa, sb = (np.fft.rfft(x[i], n=f) for i in (0, 1))
    gaa = np.abs(sa) ** 2
    w = cfg.coherence_bins
    gaa_s = np.array([gaa[max(0, i - w):i + w + 1].mean()
                      for i in range(gaa.size)])
    r = np.conj(sa) * sb / (gaa_s + cfg.phat_eps)
    c = np.fft.irfft(r, n=f)
    k = cfg.max_shift
    want = np.concatenate([c[f - k:], c[: k + 1]])
    # float32 JAX path vs float64 golden: tolerance scaled to the
    # correlogram's magnitude (whitened irfft sums accumulate ~1e-4 abs)
    np.testing.assert_allclose(got, want, rtol=5e-3,
                               atol=3e-4 * np.abs(want).max())


@pytest.mark.parametrize("weighting",
                         ["none", "phat", "scot", "roth", "ml"])
def test_all_weightings_recover_integer_delay(weighting):
    frames = _delayed_frames(delay=7.0)
    cfg = PipelineConfig(weighting=weighting) if weighting != "phat" \
        else PipelineConfig(phat=True)
    corr = xcorr.xcorr_fft(frames, _pair(), cfg)
    lag = int(np.asarray(xcorr.best_lag(corr, cfg.max_shift))[0, 0])
    assert lag == 7, (weighting, lag)


def test_ml_coherence_bounded_and_finite():
    frames = _delayed_frames(noise=0.2)
    cfg = PipelineConfig(weighting="ml", coherence_bins=12)
    spectra = xcorr.rfft_frames(frames, cfg.fft_length)
    psi = np.asarray(xcorr.gcc_weight(spectra, _pair(), "ml",
                                      half_width=12))
    assert np.isfinite(psi).all()
    assert (psi >= 0).all()


def test_ml_beats_plain_under_incoherent_band_noise():
    """Narrowband source + strong UNCORRELATED high-band noise per mic:
    ML's coherence weighting down-weights the incoherent band, recovering
    the true delay where the unweighted (and PHAT/SCOT) correlators are
    pulled off-peak by the noise floor."""
    rng = np.random.default_rng(3)
    n, fs = 1024, 50_000.0
    src = synth.colored_burst(n, fs, cutoff_hz=800.0, seed=3)
    # incoherent band-limited noise: independent white noise high-passed by
    # simple differencing, per mic
    na = np.diff(rng.normal(0, 1.0, n + 1))
    nb = np.diff(rng.normal(0, 1.0, n + 1))
    delay = 9.0
    a = src + 0.5 * na
    b = synth.fractional_delay(src, np.array(delay)) + 0.5 * nb
    frames = jnp.asarray(np.stack([a, b])[None], jnp.float32)

    def lag_of(weighting):
        cfg = PipelineConfig(weighting=weighting, coherence_bins=16)
        corr = xcorr.xcorr_fft(frames, _pair(), cfg)
        return int(np.asarray(xcorr.best_lag(corr, cfg.max_shift))[0, 0])

    assert lag_of("ml") == 9, lag_of("ml")
    assert lag_of("none") != 9  # plain correlation is off-peak here


def test_localizer_weighting_e2e():
    """Full pipeline with SCOT and ML weightings localizes a synthetic
    scene to cm-level (and routes through the XLA-FFT path on any
    backend)."""
    mics = geometry.square_array(0.3)
    # solver coords are pre-projection plane coords (vga_heatmap.h:57-60)
    plane = np.array([0.5, 0.4])
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frame = synth.synth_scene(src, mics, noise_rms=0.01, seed=0)
    frames = jnp.asarray(frame, jnp.float32)
    for weighting in ("scot", "ml"):
        loc = Localizer.create(mics, PipelineConfig(weighting=weighting))
        out = loc(frames)
        xy = np.asarray(out["xy"])[0]
        assert np.linalg.norm(xy - plane) < 0.05, (weighting, xy)


def test_weighting_disables_fused_path():
    from audio_triangulation_tpu.models.localizer import _fused_tile

    cfg = PipelineConfig(weighting="ml", fused_kernel="on")
    assert _fused_tile(cfg, 4, 1024) is None
    cfg2 = PipelineConfig(phat=True, fused_kernel="on")
    assert _fused_tile(cfg2, 4, 1024) == cfg2.fused_tile_b


def test_streaming_with_weighting():
    """The streaming path picks up the weighting through
    correlate_frames."""
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    mics = geometry.square_array(0.3)
    cfg = PipelineConfig(weighting="scot")
    sl = StreamingLocalizer.create(mics, cfg)
    plane = np.array([0.5, 0.4])
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frame = synth.synth_scene(src, mics, noise_rms=0.0, seed=1)[0]  # [M, N]
    # ADC-scale stream (the detector thresholds assume uint8 counts)
    rng = np.random.default_rng(1)
    streams = rng.integers(127, 130, size=(4, 20_000)).astype(np.float64)
    streams[:, 6_000: 6_000 + 1024] += 110.0 * frame
    streams = np.clip(np.round(streams), 0, 255)
    _, outs = sl.run(streams)
    got = [np.asarray(o["xy"]) for o in outs if bool(o["event"])]
    assert got, "no event detected"
    assert np.linalg.norm(got[0] - plane) < 0.08, got[0]


def test_weighting_phat_normalizes_flag():
    """weighting='phat' must whiten on EVERY engine — it normalizes the
    phat flag at construction so the MXU/fused/gcc_large paths (which key
    on cfg.phat) agree with the FFT path (which keys on
    effective_weighting)."""
    assert PipelineConfig(weighting="phat").phat is True
    # an explicit non-phat weighting overrides a stray phat=True
    assert PipelineConfig(phat=True, weighting="none").phat is False
    assert PipelineConfig(phat=True, weighting="ml").phat is False
    # 'auto' keeps the flag
    assert PipelineConfig(phat=True).phat is True
    assert PipelineConfig().phat is False


def test_weighting_phat_equals_phat_flag_e2e():
    mics = geometry.square_array(0.3)
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    frames = jnp.asarray(
        synth.synth_scene(src, mics, noise_rms=0.01, seed=0), jnp.float32)
    out_a = Localizer.create(mics, PipelineConfig(weighting="phat"))(frames)
    out_b = Localizer.create(mics, PipelineConfig(phat=True))(frames)
    np.testing.assert_allclose(np.asarray(out_a["xy"]),
                               np.asarray(out_b["xy"]), atol=1e-5)


def test_large_array_gate_excludes_smoothed_weightings():
    """The gcc_large fast path implements none/phat only; the dispatch
    gate must route smoothed weightings to the XLA-FFT path."""
    import inspect

    from audio_triangulation_tpu.models import localizer as loc_mod

    # the gate lives in the shared _use_gcc_large helper (r3 refactor)
    src = inspect.getsource(loc_mod._use_gcc_large)
    assert 'effective_weighting in ("none", "phat")' in src
    # behavioral check: a smoothed weighting must not report the gate open
    cfg = PipelineConfig(weighting="scot")
    pairs = tuple((i, j) for i in range(30) for j in range(i + 1, 30))[:300]
    assert not loc_mod._use_gcc_large(cfg, pairs, 64)
