"""End-to-end: synthetic source at known (x, y) -> full jitted pipeline ->
recovered position within tolerance (SURVEY.md §4 test plan item c).

Coordinate convention: the pipeline reports PLANE coordinates (the heatmap's
cell coordinates, vga_heatmap.h:52-54); the physical source sits at the
radial projection of (x, y, height) onto the radius-``height`` sphere — the
reference's equidistant model.  ``_place(x, y)`` returns both.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.ops import solver as solver_ops
from audio_triangulation_tpu.utils import synth

pytestmark = pytest.mark.smoke  # end-to-end pipeline


MICS = geometry.reference_array()
H = 1.2


def _place(x, y, h=H):
    """plane coords -> (plane_xy [2], physical source xyz [3])."""
    p = np.array([x, y, h], np.float64)
    return np.array([x, y]), p * (h / np.linalg.norm(p))


def test_three_mic_reference_scene_localizes():
    loc = Localizer.create(MICS, with_heatmap=True)
    planes, sources = zip(*[
        _place(0.9, 0.4), _place(-0.6, -0.8), _place(0.2, 1.0)])
    frames = synth.synth_scene(np.stack(sources), MICS, noise_rms=0.01, seed=3)
    out = loc(jnp.asarray(frames, jnp.float32))
    xy = np.asarray(out["xy"])
    for i, plane in enumerate(planes):
        err = np.linalg.norm(xy[i] - plane)
        # grid cell is 1/24 m ~= 4.2 cm; expect solver-refined accuracy
        assert err < 0.10, (i, xy[i], plane, err)
    # heat levels: argmax cell must be white (level 4)
    levels = np.asarray(out["heat_levels"])
    scores = np.asarray(out["scores"])
    assert all(levels[i, scores[i].argmax()] == 4 for i in range(3))


def test_four_mic_square_array_batch():
    mics = geometry.square_array(0.3)
    loc = Localizer.create(mics, PipelineConfig(phat=True))
    planes, sources = zip(*[
        _place(0.5, 0.5), _place(-0.9, 0.3), _place(0.0, -1.0),
        _place(1.2, -0.7)])
    frames = synth.synth_scene(np.stack(sources), mics, noise_rms=0.02, seed=4)
    out = loc(jnp.asarray(frames, jnp.float32))
    xy = np.asarray(out["xy"])
    err = np.linalg.norm(xy - np.stack(planes), axis=-1)
    assert np.all(err < 0.12), err


def test_tdoa_accuracy_vs_geometry():
    """Sub-sample TDOA estimates match geometric truth to < 0.1 samples
    (the BASELINE.md accuracy target)."""
    loc = Localizer.create(MICS)
    plane, source = _place(0.7, -0.5)
    frames = synth.synth_scene(source, MICS, noise_rms=0.0, seed=5)
    out = loc(jnp.asarray(frames, jnp.float32))

    pairs = geometry.mic_pairs(3)
    true_tau = np.asarray(solver_ops.predicted_tdoas(
        jnp.asarray(plane, jnp.float32),
        jnp.zeros((3, 3), jnp.float32).at[:, :2].set(jnp.asarray(MICS)),
        jnp.asarray(pairs), 343.0, H, True,
    )) * 50_000.0  # samples
    est = np.asarray(out["tdoa_samples"])[0]
    assert np.all(np.abs(est - true_tau) < 0.1), (est, true_tau)


def test_uint8_adc_frames_work():
    """8-bit ADC-quantized input (the firmware's front end) still localizes."""
    loc = Localizer.create(MICS)
    plane, source = _place(-0.8, 0.6)
    frames = synth.synth_scene(source, MICS, noise_rms=0.005, seed=6)
    u8 = synth.to_adc_u8(frames)
    out = loc(jnp.asarray(u8, jnp.float32))
    err = np.linalg.norm(np.asarray(out["xy"])[0] - plane)
    assert err < 0.15, err


def test_gather_form_matches_matmul_form():
    loc_mm = Localizer.create(MICS, srp_form="matmul")
    loc_g = Localizer.create(MICS, srp_form="gather")
    _, source = _place(0.4, 0.9)
    frames = jnp.asarray(
        synth.synth_scene(source, MICS, noise_rms=0.01, seed=7), jnp.float32)
    s_mm = np.asarray(loc_mm(frames)["scores"])
    s_g = np.asarray(loc_g(frames)["scores"])
    np.testing.assert_allclose(s_mm, s_g, rtol=1e-4, atol=1e-2)


def test_time_domain_mode_matches_fft_mode():
    loc_f = Localizer.create(MICS, PipelineConfig(xcorr_mode="fft"))
    loc_t = Localizer.create(MICS, PipelineConfig(xcorr_mode="time"))
    _, source = _place(0.3, -0.7)
    frames = jnp.asarray(
        synth.synth_scene(source, MICS, noise_rms=0.0, seed=8), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(loc_f(frames)["tdoa_samples"]),
        np.asarray(loc_t(frames)["tdoa_samples"]),
        atol=1e-3,
    )


def test_bf16_srp_scoring_accuracy():
    """bf16 SRP scoring: same argmax cell, xy within tolerance."""
    loc32 = Localizer.create(MICS, PipelineConfig(phat=True))
    loc16 = Localizer.create(
        MICS, PipelineConfig(phat=True, srp_dtype="bfloat16"))
    planes, sources = zip(*[
        _place(0.9, 0.4), _place(-0.6, -0.8), _place(0.2, 1.0)])
    frames = jnp.asarray(
        synth.synth_scene(np.stack(sources), MICS, noise_rms=0.01, seed=3),
        jnp.float32)
    o32, o16 = loc32(frames), loc16(frames)
    cells32 = np.argmax(np.asarray(o32["scores"]), -1)
    cells16 = np.argmax(np.asarray(o16["scores"]), -1)
    np.testing.assert_array_equal(cells32, cells16)
    np.testing.assert_allclose(
        np.asarray(o16["xy"]), np.asarray(o32["xy"]), atol=5e-3)


def test_nan_guard_contains_bad_input():
    loc = Localizer.create(MICS, PipelineConfig(nan_guard=True))
    plane, source = _place(0.5, 0.5)
    frames = synth.synth_scene(source, MICS, noise_rms=0.01, seed=9)
    frames[0, 1, 100:130] = np.nan  # a corrupted channel segment
    out = loc(jnp.asarray(frames, jnp.float32))
    assert np.isfinite(np.asarray(out["xy"])).all()
    # and still roughly localizes (30 bad samples of 1024)
    assert np.linalg.norm(np.asarray(out["xy"])[0] - plane) < 0.3


def test_localize_stream_one_shot():
    """Device-side stream -> events -> positions in one program."""
    from audio_triangulation_tpu.models.localizer import localize_stream

    rng = np.random.default_rng(71)
    loc = Localizer.create(MICS)
    stream = rng.integers(127, 130, size=(3, 20000)).astype(np.float64)
    planes = []
    for i, at in enumerate((3000, 9000, 15000)):
        plane, source = _place(0.4 - 0.3 * i, 0.5)
        planes.append(plane)
        fr = synth.synth_scene(source, MICS, noise_rms=0.0, seed=70 + i)[0]
        stream[:, at: at + 1024] += 110.0 * fr
    stream = np.clip(np.round(stream), 0, 255)

    out = localize_stream(loc, jnp.asarray(stream), max_events=8)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 3
    xy = np.asarray(out["xy"])[valid]
    idxs = np.asarray(out["trigger_idx"])[valid]
    assert (np.diff(idxs) >= 1024).all()
    for i, plane in enumerate(planes):
        assert np.linalg.norm(xy[i] - plane) < 0.25, (i, xy[i], plane)


def test_confidence_separates_signal_from_noise():
    rng = np.random.default_rng(91)
    loc = Localizer.create(MICS, PipelineConfig(phat=True))
    _, source = _place(0.5, 0.5)
    good = synth.synth_scene(source, MICS, noise_rms=0.01, seed=92)
    noise = rng.normal(0, 0.1, (1, 3, 1024))
    out_g = loc(jnp.asarray(good, jnp.float32))
    out_n = loc(jnp.asarray(noise, jnp.float32))
    cg = float(out_g["confidence"][0])
    cn = float(out_n["confidence"][0])
    # whitened correlograms have elevated sidelobes, so the PSR scale is
    # compressed; ~1.0 = noise, >1.3 = detection
    assert cg > 1.3 > cn, (cg, cn)


def test_init_grid_stride_solver_equivalent():
    """A 3x-coarsened init grid must not change the GN-refined position on
    clean scenes (the solver supersedes the grid; bench.py runs stride 3)."""
    from audio_triangulation_tpu.utils import synth

    mics = geometry.square_array(0.3)
    # plane coordinates (the solver's output convention); the 3-D source is
    # their projection onto the 1.2 m sphere (vga_heatmap.h:57-60 semantics)
    plane = np.array([0.4, -0.3])
    src = np.array([*plane, 1.2])
    src = src / np.linalg.norm(src) * 1.2
    frames = jnp.asarray(
        synth.synth_scene(src, mics, noise_rms=0.01, seed=3), jnp.float32)
    cfg = PipelineConfig(fft_pad_mode="circular")
    loc1 = Localizer.create(mics, cfg)
    loc3 = Localizer.create(mics, cfg, init_grid_stride=3)
    xy1 = np.asarray(loc1(frames)["xy"])[0]
    xy3 = np.asarray(loc3(frames)["xy"])[0]
    np.testing.assert_allclose(xy1, xy3, atol=1e-4)
    assert np.linalg.norm(xy1 - plane) < 0.02
    # coarse grid outputs really are coarse (33x33 for the reference grid)
    assert loc3(frames)["scores"].shape[-1] == 33 * 33


def test_init_grid_stride_guards():
    mics = geometry.square_array(0.3)
    with pytest.raises(ValueError):
        Localizer.create(mics, with_heatmap=True, init_grid_stride=3)
    with pytest.raises(ValueError):
        Localizer.create(mics, with_solver=False, init_grid_stride=3)


def test_localizer_save_load_roundtrip(tmp_path):
    """Localizer.save -> .load reconstructs a numerically identical
    pipeline from the small JSON config blob."""
    import jax.numpy as jnp

    from audio_triangulation_tpu import Localizer, PipelineConfig
    from audio_triangulation_tpu.core.config import GridConfig
    from audio_triangulation_tpu.core import geometry as geo
    from audio_triangulation_tpu.utils import synth as synth_mod

    mics = geo.square_array(0.3)
    loc = Localizer.create(
        mics, PipelineConfig(phat=True, fft_pad_mode="circular"),
        GridConfig(half_cells_x=30, half_cells_y=30), init_grid_stride=3)
    path = loc.save(str(tmp_path / "loc"))

    loc2 = Localizer.load(path)
    assert loc2.pipeline == loc.pipeline
    assert loc2.grid == loc.grid          # stride already folded in
    assert loc2.srp_form == loc.srp_form

    src = np.array([0.4, 0.3, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    fr = jnp.asarray(
        synth_mod.synth_scene(src, mics, noise_rms=0.01, seed=0),
        jnp.float32)
    a = loc(fr)
    b = loc2(fr)
    np.testing.assert_array_equal(np.asarray(a["xy"]), np.asarray(b["xy"]))
    np.testing.assert_array_equal(
        np.asarray(a["scores"]), np.asarray(b["scores"]))


def test_localizer_load_rejects_foreign_json(tmp_path):
    import json

    import pytest as _pytest

    from audio_triangulation_tpu import Localizer

    p = tmp_path / "other.json"
    p.write_text(json.dumps({"format": "something-else"}))
    with _pytest.raises(ValueError):
        Localizer.load(str(p))
