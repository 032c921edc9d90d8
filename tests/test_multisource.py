"""Simultaneous multi-source localization: windowed TDOA disambiguation,
batch localize_multi, streaming multi_* outputs, and JPDA tracker wiring.

The reference pipeline is single-source by construction (one heatmap argmax,
vga_heatmap.h:99-108; peak taper around one peak, correlations.c:26-33);
this is a new capability on the same SRP machinery.
"""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.core.config import (
    PipelineConfig, StreamConfig,
)
from audio_triangulation_tpu.models.streaming import StreamingLocalizer
from audio_triangulation_tpu.models.tracking import Tracker, TrackerConfig
from audio_triangulation_tpu.ops import multisource, xcorr
from audio_triangulation_tpu.utils import synth

MICS8 = geometry.circular_array(8, 0.15)
H = 1.2


def _place(x, y):
    p = np.array([x, y, H])
    return p * (H / np.linalg.norm(p))


def _two_source_frames(xy1, xy2, seed=1):
    """One frame with two simultaneous, spectrally-distinct bursts."""
    f1 = synth.synth_scene(_place(*xy1), MICS8, seed=seed)
    sig2 = synth.chirp_burst(1024, 50_000.0, f0=2000, f1=9000, center=0.45)
    f2 = synth.synth_scene(_place(*xy2), MICS8, signal=sig2, seed=seed + 1)
    return np.asarray(f1 + f2)


# ----------------------------------------------------------------------
# windowed_subsample_peak


def test_windowed_peak_matches_global_when_centered():
    """With the gate centered on the global peak, the windowed measurement
    equals the global sub-sample peak."""
    rng = np.random.default_rng(3)
    corr = rng.normal(0.0, 0.05, (4, 93)).astype(np.float32)
    corr[:, 60] += 3.0
    corr[:, 59] += 1.4
    corr[:, 61] += 1.2
    c = jnp.asarray(corr)
    glob, _ = xcorr.subsample_peak(c, 46)
    pred = jnp.full((4,), 60 - 46, jnp.float32)
    got, val = multisource.windowed_subsample_peak(c, 46, pred, 3.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(glob), atol=1e-6)


def test_windowed_peak_selects_local_peak():
    """A gate near the SECONDARY peak measures that peak, not the global."""
    corr = np.zeros((1, 93), np.float32)
    corr[0, 60] = 3.0  # global
    corr[0, 20] = 1.5  # secondary
    c = jnp.asarray(corr)
    pred = jnp.asarray([[21.0 - 46.0]], jnp.float32)[0]
    got, val = multisource.windowed_subsample_peak(c, 46, pred, 3.0)
    assert abs(float(got[0]) - (20 - 46)) <= 0.5
    assert abs(float(val[0]) - 1.5) < 1e-6


def test_cell_centers_match_grid_peak_xy():
    """cell_centers_xy agrees with grid_peak_xy's cell->meters mapping."""
    from audio_triangulation_tpu.core.config import GridConfig
    from audio_triangulation_tpu.ops import srp

    grid = GridConfig(half_cells_x=7, half_cells_y=5, cells_per_m=10.0)
    cells = multisource.cell_centers_xy(grid)  # [G, 2]
    g = grid.num_cells
    for flat in (0, 37, g - 1):
        scores = np.zeros((1, g), np.float32)
        scores[0, flat] = 1.0
        xy = srp.grid_peak_xy(
            jnp.asarray(scores), (grid.height, grid.width),
            (grid.half_cells_x, grid.half_cells_y), grid.cells_per_m,
            refine=False)[0]
        np.testing.assert_allclose(np.asarray(xy), cells[flat], atol=1e-6)


# ----------------------------------------------------------------------
# batch localize_multi


def test_localize_multi_two_sources_cm_level():
    loc = Localizer.create(MICS8, PipelineConfig(phat=True))
    frames = jnp.asarray(_two_source_frames((0.9, 0.3), (-0.7, -0.6)))
    out = loc.localize_multi(frames, 2)
    xy = np.asarray(out["xy"])[0]
    assert xy.shape == (2, 2)
    for target in ([0.9, 0.3], [-0.7, -0.6]):
        err = min(np.linalg.norm(xy - np.asarray(target), axis=-1))
        assert err < 0.06, (xy, target, err)
    # strongest-first ordering and per-source covariance shape
    s = np.asarray(out["source_score"])[0]
    assert s[0] >= s[1]
    assert out["xy_cov"].shape == (1, 2, 2, 2)
    assert np.all(np.isfinite(np.asarray(out["xy_cov"])))


def test_localize_multi_single_source_agrees_with_flagship():
    """On a one-source scene, slot 0 matches the single-source pipeline's
    solve to millimeters (same TDOAs up to taper), and dominates slot 1."""
    loc = Localizer.create(MICS8, PipelineConfig(phat=True))
    frames = jnp.asarray(
        synth.synth_scene(_place(0.6, -0.4), MICS8, noise_rms=0.005, seed=7))
    single = np.asarray(loc(frames)["xy"])[0]
    out = loc.localize_multi(frames, 2)
    xy = np.asarray(out["xy"])[0]
    assert np.linalg.norm(xy[0] - single) < 0.01, (xy[0], single)
    s = np.asarray(out["source_score"])[0]
    assert s[0] > 1.2 * s[1]


def test_localize_multi_batched_leading_dims():
    loc = Localizer.create(MICS8, PipelineConfig(phat=True))
    f1 = _two_source_frames((0.9, 0.3), (-0.7, -0.6), seed=1)
    f2 = _two_source_frames((-0.5, 0.8), (0.4, -0.9), seed=5)
    frames = jnp.asarray(np.concatenate([f1, f2], axis=0))
    out = loc.localize_multi(frames, 3)
    assert out["xy"].shape == (2, 3, 2)
    assert out["source_score"].shape == (2, 3)
    assert out["tdoa_samples"].shape == (2, 3, MICS8.shape[0] * 7 // 2)


# ----------------------------------------------------------------------
# streaming multi-source + JPDA tracking


def _two_source_stream(xy1, xy2, t_len=12000, bursts=(3000, 7000)):
    stream = np.zeros((8, t_len))
    for i, at in enumerate(bursts):
        stream[:, at: at + 1024] += _two_source_frames(
            xy1, xy2, seed=10 + 3 * i)[0]
    return stream * 0.9


_XY1, _XY2 = (0.9, 0.3), (-0.7, -0.6)
_STREAM_RUN = None


def _shared_multisource_run():
    """One StreamingLocalizer(n_sources=2) run shared by the two streaming
    tests below (identical config + stream; the run was 2x20 s of the
    suite when each test repeated it)."""
    global _STREAM_RUN
    if _STREAM_RUN is None:
        sl = StreamingLocalizer.create(
            MICS8, PipelineConfig(phat=True),
            stream=StreamConfig(chunk_size=512, n_sources=2))
        _STREAM_RUN = sl.run(_two_source_stream(_XY1, _XY2))
    return _STREAM_RUN


def test_streaming_multisource_outputs():
    xy1, xy2 = _XY1, _XY2
    state, outs = _shared_multisource_run()
    ev = [o for o in outs if bool(np.asarray(o["events"]).any())]
    assert len(ev) >= 2
    for o in ev:
        assert o["multi_xy"].shape == (1, 2, 2)
        assert o["multi_valid"].shape == (1, 2)
        assert bool(np.asarray(o["multi_valid"]).all())
        xs = np.asarray(o["multi_xy"])[0]
        for target in (xy1, xy2):
            err = min(np.linalg.norm(xs - np.asarray(target), axis=-1))
            assert err < 0.1, (xs, target)


def test_streaming_multisource_feeds_jpda_tracker():
    """multi_* outputs drive Tracker.step_multi into two confirmed tracks
    near the true sources (identity kept across events)."""
    xy1, xy2 = _XY1, _XY2
    tr = Tracker(TrackerConfig(max_tracks=4, confirm_hits=2))
    tstate = tr.init()
    state, outs = _shared_multisource_run()
    t = 0.0
    tout = None
    for o in outs:
        t += 512 / 50_000.0
        if not bool(np.asarray(o["events"]).any()):
            continue
        tstate, tout = tr.step_multi(
            tstate, o["multi_xy"][0], t, o["multi_valid"][0],
            z_covs=o["multi_xy_cov"][0])
    assert tout is not None
    confirmed = np.asarray(tout["track_confirmed"])
    assert confirmed.sum() == 2, confirmed
    txy = np.asarray(tout["track_xy"])[confirmed]
    for target in (xy1, xy2):
        err = min(np.linalg.norm(txy - np.asarray(target), axis=-1))
        assert err < 0.1, (txy, target)


def test_moving_sources_exact_jpda_e2e():
    """Raw-audio end-to-end: ONE stream carrying two simultaneous MOVING
    sources -> stream_step(n_sources=2) multi_* outputs ->
    Tracker.step_multi(joint_association='exact') -> two confirmed tracks
    with persistent identities and bounded RMS against the true
    trajectories (VERDICT r2 item 6: the integrated proof)."""
    # two sources on crossing-free linear paths, one burst every 2,000
    # samples (40 ms) -> 7 events over the stream
    bursts = list(range(2500, 16500, 2000))
    t_len = 18000

    def traj1(k):
        return (0.9 - 0.04 * k, 0.3 + 0.05 * k)

    def traj2(k):
        return (-0.7 + 0.05 * k, -0.6 - 0.03 * k)

    stream = np.zeros((8, t_len))
    for k, at in enumerate(bursts):
        stream[:, at: at + 1024] += _two_source_frames(
            traj1(k), traj2(k), seed=40 + 3 * k)[0]
    stream *= 0.9

    sl = StreamingLocalizer.create(
        MICS8, PipelineConfig(phat=True),
        stream=StreamConfig(chunk_size=512, n_sources=2))
    tr = Tracker(TrackerConfig(max_tracks=4, confirm_hits=2,
                               joint_association="exact",
                               measurement_noise=0.03))
    tstate = tr.init()
    state, outs = sl.run(stream)

    t = 0.0
    ev_k = 0
    id_history = []  # (event_k, confirmed track ids sorted by x)
    errs = []
    tout = None
    for o in outs:
        t += 512 / 50_000.0
        if not bool(np.asarray(o["events"]).any()):
            continue
        tstate, tout = tr.step_multi(
            tstate, o["multi_xy"][0], t, o["multi_valid"][0],
            z_covs=o["multi_xy_cov"][0])
        confirmed = np.asarray(tout["track_confirmed"])
        if confirmed.sum() == 2:
            txy = np.asarray(tout["track_xy"])[confirmed]
            ids = np.asarray(tout["track_id"])[confirmed]
            # match each confirmed track to its nearest true source at
            # this event; identities must not swap between events
            order = np.argsort(txy[:, 0])  # source 2 has smaller x
            id_history.append(tuple(ids[order]))
            for true, est in zip((traj2(ev_k), traj1(ev_k)), txy[order]):
                errs.append(np.linalg.norm(est - np.asarray(true)))
        ev_k += 1

    assert ev_k >= 6, f"only {ev_k} events detected"
    assert tout is not None
    confirmed = np.asarray(tout["track_confirmed"])
    assert confirmed.sum() == 2, confirmed
    # persistent identity: the (low-x, high-x) id pair never changes
    assert len(id_history) >= 4, id_history
    assert len(set(id_history)) == 1, id_history
    # tracked-position RMS against the true (moving) trajectories
    rms = float(np.sqrt(np.mean(np.square(errs))))
    assert rms < 0.15, (rms, errs)
