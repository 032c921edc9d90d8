"""Delay-Doppler cross-ambiguity (ops.caf): moving sources time-scale each
mic's signal; the CAF scans resampling-matrix scale hypotheses, de-smears
the TDOA, and yields an instantaneous velocity estimate from one frame.
New capability beyond the reference's static correlator
(src/components/correlations.c:9-18)."""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu import PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.ops import caf as caf_ops
from audio_triangulation_tpu.ops import window as window_ops

FS = 50_000.0
C = 343.0
N = 1024
F0, F1, TB = 800.0, 9000.0, 0.018  # burst band / duration (s)

# Doppler-SENSITIVE test signal: a linear chirp is the classic
# Doppler-TOLERANT waveform (its ambiguity function is a delay-Doppler
# ridge, so a wrong scale masquerades as a shifted delay); a random
# multi-sine burst has a thumbtack ambiguity, which is what the CAF needs
# to discriminate scale.  Components are fixed (seeded) so every test sees
# the same source signal, evaluable at arbitrary (scaled) times.
_rng = np.random.default_rng(1234)
_N_TONES = 120
_FREQS = _rng.uniform(F0, F1, _N_TONES)
_PHASES = _rng.uniform(0.0, 2 * np.pi, _N_TONES)
_AMPS = _rng.uniform(0.5, 1.0, _N_TONES) / np.sqrt(_N_TONES)


def _burst_at(t):
    """Hann-enveloped random multi-sine evaluated at arbitrary times (s)."""
    tt = np.clip(t, 0.0, TB)
    env = np.where((t >= 0) & (t <= TB),
                   0.5 - 0.5 * np.cos(2 * np.pi * tt / TB), 0.0)
    sig = np.sum(
        _AMPS[:, None] * np.sin(2 * np.pi * _FREQS[:, None] * tt[None]
                                + _PHASES[:, None]), axis=0)
    return env * sig


def _moving_frames(mics, x0, v, noise=0.002, seed=0, t_offset=0.0008):
    """Physically exact moving-source synthesis: r_i(t) = s(t - d_i(t)/c)
    with d_i(t) = |x0 + v t - m_i| linearized (d_i0 + rdot_i t)."""
    rng = np.random.default_rng(seed)
    t = np.arange(N) / FS
    m = np.asarray(mics, np.float64)
    x0 = np.asarray(x0, np.float64)
    rows = []
    for mi in m:
        d0 = np.linalg.norm(x0 - mi)
        u = (x0 - mi) / d0
        rdot = float(u @ np.asarray(v, np.float64))  # d|x-m|/dt at t=0
        rows.append(_burst_at(t * (1.0 - rdot / C) - d0 / C + t_offset))
    out = np.stack(rows) + rng.normal(0.0, noise, (m.shape[0], N))
    return jnp.asarray(out, jnp.float32)[None]


def _cfg(mics):
    return PipelineConfig(
        phat=True, window_enabled=False, band_hz=(700.0, 9500.0),
        max_shift_samples=geometry.max_lag_for_array(
            mics, PipelineConfig()))


def test_resample_matrix_scales_a_tone():
    """y @ R_s^T reproduces direct evaluation of a band-limited tone at
    the scaled positions (frame-center referenced)."""
    a = 1.002
    r = caf_ops.resample_matrices(N, [a])[0]
    t = np.arange(N, dtype=np.float64)
    f = 3000.0 / FS
    y = np.sin(2 * np.pi * f * t)
    got = y @ r.T.astype(np.float64)
    t0 = (N - 1) / 2.0
    want = np.sin(2 * np.pi * f * ((t - t0) * a + t0))
    core = slice(64, N - 64)  # kernel support clipped at the edges
    assert np.max(np.abs(got[core] - want[core])) < 1e-3


def test_static_source_alpha_is_one():
    """A static scene peaks at the alpha = 1 hypothesis with TDOAs matching
    the geometry."""
    mics = geometry.reference_array()
    cfg = _cfg(mics)
    pairs = geometry.mic_pairs(mics.shape[0])
    src = np.array([0.5, 0.4])
    frames = _moving_frames(mics, src, np.zeros(2), seed=1)
    out = caf_ops.estimate_delay_doppler(
        frames, jnp.asarray(window_ops.window_for(cfg)), pairs, cfg,
        v_max=8.0, n_scales=9)
    assert np.max(np.abs(np.asarray(out["pair_rel_speed"]))) < 0.5
    m = np.asarray(mics, np.float64)
    d = np.linalg.norm(src - m, axis=1)
    want = (d[pairs[:, 1]] - d[pairs[:, 0]]) / C * FS
    got = np.asarray(out["tdoa_samples"][0])
    assert np.max(np.abs(got - want)) < 0.35, (got, want)


def test_moving_source_velocity_recovered():
    """Near-field moving source: per-pair Doppler -> LS velocity vector."""
    mics = geometry.reference_array()
    cfg = _cfg(mics)
    pairs = geometry.mic_pairs(mics.shape[0])
    src = np.array([0.45, 0.30])
    v = np.array([4.0, -2.5])  # m/s
    frames = _moving_frames(mics, src, v, seed=2)
    out = caf_ops.estimate_delay_doppler(
        frames, jnp.asarray(window_ops.window_for(cfg)), pairs, cfg,
        v_max=8.0, n_scales=17)

    # ground-truth pair relative speeds from the synthesis model
    m = np.asarray(mics, np.float64)
    d0 = np.linalg.norm(src - m, axis=1)
    u = (src - m) / d0[:, None]
    rdot = u @ v  # [M] = d|x-m|/dt
    want_rel = rdot[pairs[:, 1]] - rdot[pairs[:, 0]]
    got_rel = np.asarray(out["pair_rel_speed"][0])
    assert np.max(np.abs(got_rel - want_rel)) < 1.0, (got_rel, want_rel)

    vel = caf_ops.solve_velocity(
        jnp.asarray(src, jnp.float32)[None],
        out["pair_rel_speed"], jnp.asarray(mics), jnp.asarray(pairs))
    assert np.linalg.norm(np.asarray(vel[0]) - v) < 1.5, np.asarray(vel)


def test_caf_desmears_fast_mover_tdoa():
    """At high pair relative speed the static GCC's peak smears and biases;
    the CAF's best-scale TDOA stays tight."""
    mics = geometry.reference_array()
    cfg = _cfg(mics)
    pairs = geometry.mic_pairs(mics.shape[0])
    src = np.array([0.45, 0.30])
    v = np.array([6.0, -4.0])
    frames = _moving_frames(mics, src, v, noise=0.001, seed=3)
    win = jnp.asarray(window_ops.window_for(cfg))
    out = caf_ops.estimate_delay_doppler(
        frames, win, pairs, cfg, v_max=8.0, n_scales=17)

    # static-GCC TDOA = the alpha=1 slice of the same CAF (index S//2)
    k = cfg.max_shift
    from audio_triangulation_tpu.ops import xcorr
    static = out["caf"][..., 17 // 2, :]
    tdoa_static, _ = xcorr.subsample_peak(static, k)

    # expected mid-frame TDOA (delays evaluated at the frame center)
    m = np.asarray(mics, np.float64)
    d0 = np.linalg.norm(src - m, axis=1)
    u = (src - m) / d0[:, None]
    rdot = u @ v
    t_mid = (N - 1) / 2.0 / FS
    d_mid = d0 + rdot * t_mid
    want = (d_mid[pairs[:, 1]] - d_mid[pairs[:, 0]]) / C * FS
    err_caf = np.abs(np.asarray(out["tdoa_samples"][0]) - want)
    err_static = np.abs(np.asarray(tdoa_static[0]) - want)
    assert err_caf.max() < 0.5, (err_caf, err_static)
    # the moving peak must be materially stronger than the static slice
    static_peak = jnp.max(static, axis=-1)
    assert float(jnp.min(out["peak"][0] / static_peak[0])) > 1.02


def test_localizer_localize_moving_e2e():
    """Localizer.localize_moving: standard position + CAF velocity in one
    call (coplanar array -> in-plane [., 2] velocity)."""
    from audio_triangulation_tpu.models.localizer import Localizer

    # a wider aperture than the 0.15 m reference triangle: with the source
    # 1.2 m above a planar array, each u_i tilts ~65 deg out of plane and
    # the in-plane Doppler rows shrink ~2.5x (classic DOP); 6 mics at
    # 0.35 m keep the velocity solve well-conditioned
    mics = geometry.circular_array(6, 0.35)
    cfg = _cfg(mics)
    src = np.array([0.45, 0.30])
    v = np.array([3.0, -2.0])
    # the planar pipeline's scene model: source at grid height
    from audio_triangulation_tpu.core.config import GridConfig
    h = GridConfig().height_m
    src3 = np.array([src[0], src[1], h])
    m3 = np.zeros((mics.shape[0], 3))
    m3[:, :2] = np.asarray(mics)
    frames = _moving_frames(m3, src3, np.array([v[0], v[1], 0.0]), seed=5)

    loc = Localizer.create(mics, cfg)
    out = loc.localize_moving(frames, v_max=8.0, n_scales=33)
    assert np.linalg.norm(np.asarray(out["xy"][0]) - src) < 0.06
    vel = np.asarray(out["velocity"][0])
    assert vel.shape == (2,)
    assert np.linalg.norm(vel - v) < 1.2, vel


def test_moving_chain_localize_track_with_velocity():
    """Full moving-source chain: frames -> localize_moving -> tracker with
    the delay-Doppler velocity as a measurement (z_vel).  The track carries
    a usable velocity from the FIRST event (spawn copies z_vel)."""
    from audio_triangulation_tpu.models.localizer import Localizer
    from audio_triangulation_tpu.models.tracking import (
        Tracker, TrackerConfig)
    from audio_triangulation_tpu.core.config import GridConfig

    mics = geometry.circular_array(6, 0.35)
    cfg = _cfg(mics)
    h = GridConfig().height_m
    v = np.array([2.5, -1.5])
    x0 = np.array([0.3, 0.2])
    loc = Localizer.create(mics, cfg)
    tr = Tracker(TrackerConfig(velocity_noise=0.6))
    st = tr.init()
    m3 = np.zeros((6, 3))
    m3[:, :2] = np.asarray(mics)

    out = k = None
    for i, t in enumerate((0.0, 0.4)):
        pos = x0 + v * t
        frames = _moving_frames(
            m3, np.array([pos[0], pos[1], h]),
            np.array([v[0], v[1], 0.0]), seed=10 + i)
        est = loc.localize_moving(frames, v_max=8.0, n_scales=33)
        st, out = tr.step(st, np.asarray(est["xy"][0]), t, True,
                          z_cov=np.asarray(est["xy_cov"][0]),
                          z_vel=np.asarray(est["velocity"][0]))
        if i == 0:
            k = int(np.argmax(np.asarray(out["track_active"])))
            first_v = np.asarray(out["track_vel"])[k]
            assert np.linalg.norm(first_v - v) < 1.2, first_v
    assert bool(np.asarray(out["track_confirmed"])[k])
    assert np.linalg.norm(np.asarray(out["track_vel"])[k] - v) < 0.8


@pytest.mark.slow
def test_streaming_solve_velocity():
    """StreamConfig.solve_velocity: the live path emits a per-event
    instantaneous velocity (delay-Doppler CAF on the captured frame),
    sized for Tracker.step(z_vel=...)."""
    from audio_triangulation_tpu.core.config import GridConfig, StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer
    from audio_triangulation_tpu.utils import synth

    mics = geometry.circular_array(6, 0.35)
    cfg = _cfg(mics)
    h = GridConfig().height_m
    src = np.array([0.45, 0.30, h])
    v = np.array([2.5, -1.5, 0.0])

    rng = np.random.default_rng(21)
    streams = rng.integers(127, 130, size=(6, 20_000)).astype(np.float64)
    for at in (6_000, 15_000):
        fr = synth.synth_moving_scene(src, v, mics, seed=int(at))[0]
        streams[:, at: at + 1024] += 110.0 * fr
    streams = np.clip(np.round(streams), 0, 255)

    # chunk 2048 (10 steps instead of 39): every step runs the 33-scale
    # CAF, so step count IS the test's wall clock (25.9 -> ~8 s)
    sl = StreamingLocalizer.create(
        mics, cfg,
        stream=StreamConfig(chunk_size=2048, solve_velocity=True,
                            velocity_n_scales=33),
        with_solver=True)
    state = sl.init_state()
    got = None
    for i in range(0, 20_000 - 20_000 % 2048, 2048):
        state, out = sl(state, jnp.asarray(streams[:, i: i + 2048]))
        if bool(out["event"]):
            got = np.asarray(out["velocity"])
    assert got is not None, "no events detected"
    assert got.shape == (2,)
    assert np.linalg.norm(got - v[:2]) < 1.2, (got, v)


def test_spectral_resample_fold_matches_time_domain():
    """precompute_resample(cfg=band-cropping) folds the resampling into
    the band DFT; the CAF must match the time-domain path bit-closely."""
    import dataclasses

    mics = geometry.reference_array()
    cfg = dataclasses.replace(_cfg(mics), band_crop=True)
    pairs = geometry.mic_pairs(3)
    frames = _moving_frames(mics, np.array([0.45, 0.30]),
                            np.array([3.0, -2.0]), seed=6)
    win = jnp.asarray(window_ops.window_for(cfg))
    op = caf_ops.precompute_resample(1024, 8.0, 9, 343.0, cfg=cfg)
    assert isinstance(op, tuple)
    a = caf_ops.estimate_delay_doppler(frames, win, pairs, cfg,
                                       v_max=8.0, n_scales=9, resample=op)
    b = caf_ops.estimate_delay_doppler(frames, win, pairs, cfg,
                                       v_max=8.0, n_scales=9)
    scale = float(jnp.max(jnp.abs(b["caf"])))
    assert float(jnp.max(jnp.abs(a["caf"] - b["caf"]))) < 2e-3 * scale
    np.testing.assert_allclose(np.asarray(a["tdoa_samples"]),
                               np.asarray(b["tdoa_samples"]), atol=0.02)
    np.testing.assert_allclose(np.asarray(a["alpha"]),
                               np.asarray(b["alpha"]), atol=1e-4)


def test_streaming_velocity_planar_mics_given_as_3d():
    """Regression: a PLANAR array supplied as [M, 3] (constant z) must take
    the in-plane velocity path — the 3-D LS is rank-deficient there and
    used to return a [3] velocity with a junk v_z, breaking the
    StreamConfig contract ('in-plane [2] for planar arrays')."""
    from audio_triangulation_tpu.core.config import GridConfig, StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer
    from audio_triangulation_tpu.utils import synth

    mics2 = geometry.circular_array(6, 0.35)
    mics3 = np.concatenate(
        [np.asarray(mics2), np.full((6, 1), 1.0, np.float32)], axis=1)
    cfg = _cfg(mics3)
    h = GridConfig().height_m
    src = np.array([0.45, 0.30, h])
    v = np.array([2.5, -1.5, 0.0])

    rng = np.random.default_rng(7)
    streams = rng.integers(127, 130, size=(6, 6_144)).astype(np.float64)
    fr = synth.synth_moving_scene(src + [0, 0, 1.0], v, mics3, seed=4)[0]
    streams[:, 2_500: 2_500 + 1024] += 110.0 * fr
    streams = np.clip(np.round(streams), 0, 255)

    sl = StreamingLocalizer.create(
        mics3, cfg,
        stream=StreamConfig(chunk_size=2048, solve_velocity=True,
                            velocity_n_scales=9),
        with_solver=True)
    state = sl.init_state()
    got = None
    for i in range(0, 6_144, 2048):
        state, out = sl(state, jnp.asarray(streams[:, i: i + 2048]))
        if bool(out["event"]):
            got = np.asarray(out["velocity"])
    assert got is not None, "no events detected"
    assert got.shape == (2,), got


def _hf_noise(shape_mn, rng, lo_hz=11_000.0, rms=0.08):
    """Independent per-mic noise strictly ABOVE the burst band (800-9000):
    energy the whitened full-band CAF up-weights but band selection should
    exclude."""
    m, n = shape_mn
    w = rng.normal(0.0, 1.0, (m, n))
    spec = np.fft.rfft(w, axis=-1)
    spec[:, np.fft.rfftfreq(n, 1.0 / FS) < lo_hz] = 0.0
    x = np.fft.irfft(spec, n=n, axis=-1)
    return x * (rms / (x.std(axis=-1, keepdims=True) + 1e-12))


def test_caf_band_auto_suppresses_out_of_band_noise():
    """band_hz='auto' must reach the CAF path too: the per-event coherence
    weight is applied to the cross-power before lag synthesis
    (ops/caf.caf_correlograms), so with strong out-of-band interference
    the auto CAF tracks the hand-tuned band and clearly beats the
    full-band whitened CAF."""
    mics = geometry.reference_array()
    pairs = geometry.mic_pairs(mics.shape[0])
    src = np.array([0.5, 0.4])
    rng = np.random.default_rng(17)
    frames = np.asarray(_moving_frames(mics, src, np.zeros(2), seed=4))[0]
    frames = jnp.asarray(frames + _hf_noise(frames.shape, rng),
                         jnp.float32)[None]

    m = np.asarray(mics, np.float64)
    d = np.linalg.norm(src - m, axis=1)
    want = (d[pairs[:, 1]] - d[pairs[:, 0]]) / C * FS

    def err(**kw):
        cfg = PipelineConfig(
            phat=True, window_enabled=False,
            max_shift_samples=geometry.max_lag_for_array(
                mics, PipelineConfig()), **kw)
        out = caf_ops.estimate_delay_doppler(
            frames, jnp.asarray(window_ops.window_for(cfg)), pairs, cfg,
            v_max=8.0, n_scales=9)
        return np.max(np.abs(np.asarray(out["tdoa_samples"][0]) - want))

    e_hand = err(band_hz=(700.0, 9500.0))
    e_auto = err(band_hz="auto")
    e_full = err()
    assert e_auto < 2.0 * e_hand + 0.1, (e_auto, e_hand)
    assert e_auto < 0.6 * e_full, (e_auto, e_full)
