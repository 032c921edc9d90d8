"""Frequency-domain SRP steering: consistency with lag-domain scoring and
sub-cell accuracy beyond integer-lag quantization."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import GridConfig, PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.ops import srp_freq
from audio_triangulation_tpu import Localizer
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()
H = 1.2


def _place(x, y, h=H):
    p = np.array([x, y, h], np.float64)
    return np.array([x, y]), p * (h / np.linalg.norm(p))


def test_freq_srp_peaks_at_source():
    grid = GridConfig()
    cfg = PipelineConfig(phat=True)
    plane, source = _place(0.7, 0.4)
    frames = jnp.asarray(
        synth.synth_scene(source, MICS, noise_rms=0.01, seed=81), jnp.float32)
    out = srp_freq.localize_freq(frames, MICS, grid, cfg, bin_stride=2)
    xy = np.asarray(out["xy_grid"])[0]
    # 3-mic SRP surfaces peak within ~2 cells of the source (the lag-domain
    # scorer peaks in the same cell — see the consistency test); the GN
    # solver is what closes the remaining gap in the full pipeline
    assert np.linalg.norm(xy - plane) < 0.15, (xy, plane)


def test_freq_srp_agrees_with_lag_srp_argmax():
    """Both scorers put the peak in (nearly) the same cell on a clean scene."""
    grid = GridConfig()
    cfg = PipelineConfig(phat=True)
    loc = Localizer.create(MICS, cfg, grid)
    _, source = _place(-0.5, 0.8)
    frames = jnp.asarray(
        synth.synth_scene(source, MICS, noise_rms=0.01, seed=82), jnp.float32)
    lag_out = loc(frames)
    frq_out = srp_freq.localize_freq(frames, MICS, grid, cfg, bin_stride=2)
    cell_lag = int(np.argmax(np.asarray(lag_out["scores"])[0]))
    cell_frq = int(np.argmax(np.asarray(frq_out["scores"])[0]))
    ry, rx = divmod(cell_lag, grid.width)
    fy, fx = divmod(cell_frq, grid.width)
    assert abs(ry - fy) <= 1 and abs(rx - fx) <= 1


def test_freq_srp_resolves_range_better_than_lag():
    """On a larger-aperture array the integer-lag grid aliases cells along
    the source ray; frequency steering keeps range information."""
    mics = geometry.circular_array(8, 0.4)
    cfg = PipelineConfig(
        max_shift_samples=geometry.max_lag_for_array(mics, PipelineConfig()))
    grid = GridConfig(half_cells_x=24, half_cells_y=24, cells_per_m=24.0,
                      projection="plane", height_m=0.8)
    sources = []
    planes = []
    rng = np.random.default_rng(83)
    for x, y in rng.uniform(-0.7, 0.7, (6, 2)):
        planes.append([x, y])
        sources.append([x, y, 0.8])
    frames = jnp.asarray(
        synth.synth_scene(np.asarray(sources), mics, noise_rms=0.005,
                          seed=84), jnp.float32)

    loc = Localizer.create(mics, cfg, grid, with_solver=False)
    lag_xy = np.asarray(loc(frames)["xy_grid"])
    frq_xy = np.asarray(srp_freq.localize_freq(
        frames, mics, grid, cfg, bin_stride=4)["xy_grid"])
    planes = np.asarray(planes)
    lag_err = np.linalg.norm(lag_xy - planes, axis=-1).mean()
    frq_err = np.linalg.norm(frq_xy - planes, axis=-1).mean()
    assert frq_err <= lag_err + 1e-6, (lag_err, frq_err)
    assert frq_err < 0.05


# ----------------------------------------------------------------------
# MVDR (Capon) adaptive beamforming (new capability)


def _snapshots(sources, mics, n_snap=12, n=1024, seed=0, noise=0.02):
    """[S, M, N] snapshot frames from one or more simultaneous sources."""
    rng = np.random.default_rng(seed)
    frames = []
    for s in range(n_snap):
        acc = None
        for k, src in enumerate(sources):
            f = synth.synth_scene(
                src, mics, n=n, noise_rms=0.0, seed=seed + 97 * s + k)[0]
            acc = f if acc is None else acc + f
        acc = acc + rng.normal(0, noise, acc.shape)
        frames.append(acc)
    return jnp.asarray(np.stack(frames), jnp.float32)

MICS8 = geometry.circular_array(8, 0.25)
# 61x61 grid: every property below holds with wide margin (fracs 2.7e-4 vs
# 4.8e-3 at halfmax; xy err 2e-5 m) at ~half the 81x81 compile+run cost
GRID8 = GridConfig(half_cells_x=30, half_cells_y=30, cells_per_m=20.0)
CFG8 = PipelineConfig()
_MEMO = {}


def _single_source_case():
    """Shared single-source snapshot scene + MVDR/MUSIC/SRP spectra.

    Five tests below score the SAME scene; computing each spectrum once
    (lazily) removes ~2 redundant localize_mvdr and 1 localize_music runs
    (~20 s of the suite on a 1-CPU box)."""
    if "frames" not in _MEMO:
        plane, source = _place(0.6, 0.3)
        _MEMO["plane"] = plane
        _MEMO["frames"] = _snapshots([source], MICS8)
    return _MEMO["plane"], _MEMO["frames"]


def _single_source_spectrum(kind):
    if kind not in _MEMO:
        _, frames = _single_source_case()
        if kind == "mvdr":
            _MEMO[kind] = srp_freq.localize_mvdr(
                frames, MICS8, GRID8, CFG8, bin_stride=8)
        elif kind == "music":
            _MEMO[kind] = srp_freq.localize_music(
                frames, MICS8, GRID8, CFG8, bin_stride=8, n_sources=1)
        elif kind == "srp":
            _MEMO[kind] = srp_freq.localize_freq(
                frames[:1], MICS8, GRID8, CFG8, bin_stride=8)
    return _MEMO[kind]



def test_mvdr_peaks_at_source():
    plane, _ = _single_source_case()
    out = _single_source_spectrum("mvdr")
    xy = np.asarray(out["xy_grid"])
    assert np.linalg.norm(xy - plane) < 0.12, (xy, plane)
    assert np.all(np.isfinite(np.asarray(out["scores"])))


def test_mvdr_sharper_than_srp():
    """The Capon spectrum's mainlobe occupies a smaller fraction of the grid
    than delay-and-sum SRP (the classic adaptive-beamforming property)."""
    out_mvdr = _single_source_spectrum("mvdr")
    out_srp = _single_source_spectrum("srp")

    def halfmax_fraction(scores):
        s = np.asarray(scores).reshape(-1).astype(np.float64)
        s = s - s.min()
        return float((s >= 0.5 * s.max()).mean())

    frac_mvdr = halfmax_fraction(out_mvdr["scores"])
    frac_srp = halfmax_fraction(out_srp["scores"][0])
    assert frac_mvdr < 0.5 * frac_srp, (frac_mvdr, frac_srp)


def test_mvdr_resolves_two_sources():
    """Two simultaneous sources appear as two local maxima in the Capon
    spectrum at their true positions."""
    mics8, grid, cfg = MICS8, GRID8, CFG8
    plane_a, src_a = _place(0.6, 0.3)
    plane_b, src_b = _place(-0.5, -0.4)
    frames = _snapshots([src_a, src_b], mics8, n_snap=16, seed=5)
    out = srp_freq.localize_mvdr(frames, mics8, grid, cfg, bin_stride=8)
    scores = np.asarray(out["scores"]).reshape(grid.height, grid.width)

    # top-2 well-separated local maxima
    flat = scores.reshape(-1).copy()
    found = []
    for _ in range(2):
        i = int(np.argmax(flat))
        r, c = divmod(i, grid.width)
        x = (c - grid.half_cells_x) / grid.cells_per_m
        y = (grid.half_cells_y - r) / grid.cells_per_m
        found.append(np.array([x, y]))
        # suppress a neighborhood around the peak
        rr, cc = np.meshgrid(np.arange(grid.height), np.arange(grid.width),
                             indexing="ij")
        mask = (np.abs(rr - r) < 8) & (np.abs(cc - c) < 8)
        flat[mask.reshape(-1)] = -np.inf
    d_aa = min(np.linalg.norm(f - plane_a) for f in found)
    d_bb = min(np.linalg.norm(f - plane_b) for f in found)
    assert d_aa < 0.15 and d_bb < 0.15, (found, plane_a, plane_b)


# ----------------------------------------------------------------------
# MUSIC subspace localization (new capability)


def test_complex_eigh_matches_numpy():
    """Real-block-embedding eigh reconstructs complex Hermitian spectra."""
    from audio_triangulation_tpu.ops import linalg as cxlinalg

    rng = np.random.default_rng(7)
    for m in (3, 4, 8):
        x = rng.normal(size=(2 * m, m)) + 1j * rng.normal(size=(2 * m, m))
        r = (x.conj().T @ x) / x.shape[0]
        w, v = cxlinalg.complex_eigh(jnp.asarray(r, jnp.complex64))
        w = np.asarray(w)
        v = np.asarray(v)
        w_ref = np.linalg.eigvalsh(r)
        assert np.allclose(np.sort(w), np.sort(w_ref), atol=1e-4), (w, w_ref)
        # each returned column is a genuine eigenvector of R
        for k in range(m):
            resid = r @ v[:, k] - w[k] * v[:, k]
            assert np.linalg.norm(resid) < 1e-4
            assert abs(np.linalg.norm(v[:, k]) - 1.0) < 1e-4


def test_music_peaks_at_source():
    plane, _ = _single_source_case()
    out = _single_source_spectrum("music")
    xy = np.asarray(out["xy_grid"])
    assert np.linalg.norm(xy - plane) < 0.12, (xy, plane)
    assert np.all(np.isfinite(np.asarray(out["scores"])))


def test_music_sharper_than_mvdr():
    """The MUSIC pseudo-spectrum's mainlobe occupies a smaller grid fraction
    than the Capon spectrum (the classic subspace super-resolution
    property)."""
    out_music = _single_source_spectrum("music")
    out_mvdr = _single_source_spectrum("mvdr")

    def halfmax_fraction(scores):
        s = np.asarray(scores).reshape(-1).astype(np.float64)
        s = s - s.min()
        return float((s >= 0.5 * s.max()).mean())

    frac_music = halfmax_fraction(out_music["scores"])
    frac_mvdr = halfmax_fraction(out_mvdr["scores"])
    assert frac_music <= frac_mvdr, (frac_music, frac_mvdr)


def test_music_resolves_two_sources():
    """n_sources=2 MUSIC shows two local maxima at the true positions."""
    mics8, grid, cfg = MICS8, GRID8, CFG8
    plane_a, src_a = _place(0.6, 0.3)
    plane_b, src_b = _place(-0.5, -0.4)
    frames = _snapshots([src_a, src_b], mics8, n_snap=16, seed=5)
    out = srp_freq.localize_music(frames, mics8, grid, cfg, bin_stride=8,
                                  n_sources=2)
    scores = np.asarray(out["scores"]).reshape(grid.height, grid.width)

    flat = scores.reshape(-1).copy()
    found = []
    for _ in range(2):
        i = int(np.argmax(flat))
        r, c = divmod(i, grid.width)
        x = (c - grid.half_cells_x) / grid.cells_per_m
        y = (grid.half_cells_y - r) / grid.cells_per_m
        found.append(np.array([x, y]))
        rr, cc = np.meshgrid(np.arange(grid.height), np.arange(grid.width),
                             indexing="ij")
        mask = (np.abs(rr - r) < 8) & (np.abs(cc - c) < 8)
        flat[mask.reshape(-1)] = -np.inf
    d_aa = min(np.linalg.norm(f - plane_a) for f in found)
    d_bb = min(np.linalg.norm(f - plane_b) for f in found)
    assert d_aa < 0.15 and d_bb < 0.15, (found, plane_a, plane_b)


def test_music_rejects_bad_model_order():
    mics8 = geometry.circular_array(8, 0.25)
    grid = GridConfig(half_cells_x=8, half_cells_y=8, cells_per_m=8.0)
    cfg = PipelineConfig()
    _, source = _place(0.3, 0.2)
    frames = _snapshots([source], mics8, n_snap=4)
    import pytest

    with pytest.raises(ValueError):
        srp_freq.localize_music(frames, mics8, grid, cfg, n_sources=8)


def _coherent_pair_snapshots(p_a, p_b, mics, n_snap=16, n=1024, seed=11,
                             noise=0.01, delay=7, gain_b=0.8):
    """Source B radiates a DELAYED COPY of source A's signal (a specular
    reflection): fully correlated at every frequency bin."""
    rng = np.random.default_rng(seed)
    frames = []
    for s in range(n_snap):
        sig = synth.colored_burst(n, 50_000.0, seed=seed + 31 * s)
        sig_b = gain_b * np.roll(sig, delay)
        fa = synth.synth_scene(p_a, mics, n=n, signal=sig,
                               noise_rms=0.0, seed=0)[0]
        fb = synth.synth_scene(p_b, mics, n=n, signal=sig_b,
                               noise_rms=0.0, seed=0)[0]
        frames.append(fa + fb + rng.normal(0, noise, fa.shape))
    return jnp.asarray(np.stack(frames), jnp.float32)


def _top2_errors(scores, grid, plane_a, plane_b):
    flat = np.asarray(scores).reshape(-1).copy()
    found = []
    for _ in range(2):
        i = int(np.argmax(flat))
        r, c = divmod(i, grid.width)
        x = (c - grid.half_cells_x) / grid.cells_per_m
        y = (grid.half_cells_y - r) / grid.cells_per_m
        found.append(np.array([x, y]))
        rr, cc = np.meshgrid(np.arange(grid.height), np.arange(grid.width),
                             indexing="ij")
        mask = (np.abs(rr - r) < 8) & (np.abs(cc - c) < 8)
        flat[mask.reshape(-1)] = -np.inf
    d_a = min(np.linalg.norm(f - plane_a) for f in found)
    d_b = min(np.linalg.norm(f - plane_b) for f in found)
    return d_a, d_b


# CSSM needs a moderate fractional bandwidth (one unitary focusing per bin
# cannot span 48 Hz-25 kHz — see the music_spectrum_coherent docstring;
# full-band coherent runs measured peaking at the ANTIPODE on this
# centro-symmetric circular array).
CFG8_BAND = dataclasses.replace(CFG8, band_hz=(800.0, 6000.0))


def test_cssm_matches_incoherent_on_single_source():
    """Focusing must not break the ordinary case: one source, CSSM peaks
    where incoherent MUSIC peaks."""
    plane, _ = _single_source_case()
    frames = _MEMO["frames"]
    out = srp_freq.localize_music(frames, MICS8, GRID8, CFG8_BAND,
                                  bin_stride=8, n_sources=1, coherent=True)
    xy = np.asarray(out["xy_grid"])
    assert np.linalg.norm(xy - plane) < 0.06, (xy, plane)
    assert np.all(np.isfinite(np.asarray(out["scores"])))


def test_cssm_resolves_coherent_sources():
    """A source plus its delayed copy (specular reflection) is rank-1 at
    every bin — incoherent MUSIC cannot build a 2-dim signal subspace, but
    CSSM's focused frequency averaging decorrelates the pair."""
    mics8, grid = MICS8, GRID8
    plane_a, src_a = _place(0.6, 0.3)
    plane_b, src_b = _place(-0.5, -0.4)
    frames = _coherent_pair_snapshots(src_a, src_b, mics8)

    out_c = srp_freq.localize_music(frames, mics8, grid, CFG8_BAND,
                                    bin_stride=8, n_sources=2, coherent=True)
    da_c, db_c = _top2_errors(out_c["scores"], grid, plane_a, plane_b)
    assert da_c < 0.15 and db_c < 0.15, (da_c, db_c)

    out_i = srp_freq.localize_music(frames, mics8, grid, CFG8_BAND,
                                    bin_stride=8, n_sources=2)
    da_i, db_i = _top2_errors(out_i["scores"], grid, plane_a, plane_b)
    # the incoherent spectrum's weaker-source recovery must be clearly
    # worse than CSSM's on the same coherent scene
    assert max(da_c, db_c) < max(da_i, db_i), (
        (da_c, db_c), (da_i, db_i))
