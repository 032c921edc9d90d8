"""One-dispatch tracked streaming (models/tracked.py): the fused
localize+associate+update step must equal the two-dispatch composition it
replaces (StreamingLocalizer followed by a host-driven Tracker), and must
vmap/batch like the untracked path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_triangulation_tpu import (
    GridConfig, PipelineConfig, StreamConfig, geometry,
)
from audio_triangulation_tpu.models.streaming import StreamingLocalizer
from audio_triangulation_tpu.models.tracked import (
    TrackedStreamingLocalizer, TrackedStreamState,
)
from audio_triangulation_tpu.models.tracking import Tracker, TrackerConfig
from audio_triangulation_tpu.utils import synth

MICS = geometry.square_array(0.3)
H = 1.2
FS = 50_000.0
CHUNK = 2048


def _event_stream(positions, t_len=None, seed=0, amp=110.0):
    """ADC-scale [4, T] stream with one chirp event per given position,
    events every 12k samples starting at 3k."""
    n_ev = len(positions)
    t_len = t_len or (3000 + 12000 * n_ev + 2048)
    rng = np.random.default_rng(seed)
    stream = rng.integers(127, 130, size=(4, t_len)).astype(np.float64)
    for e, pl in enumerate(positions):
        src = np.array([pl[0], pl[1], H]) * (
            H / np.linalg.norm([pl[0], pl[1], H]))
        fr = synth.synth_scene(src, MICS, noise_rms=0.01, seed=seed + e)[0]
        at = 3000 + e * 12000
        stream[:, at: at + 1024] += amp * fr
    return np.clip(np.round(stream), 0, 255).astype(np.float64)


def _mk(stream_cfg=None, tracker_cfg=None, **kw):
    return TrackedStreamingLocalizer.create(
        MICS, PipelineConfig(phat=True),
        stream=stream_cfg or StreamConfig(chunk_size=CHUNK),
        tracker_cfg=tracker_cfg, **kw)


def test_fused_matches_two_dispatch_composition():
    """The fused step's localization outputs equal StreamingLocalizer's
    bit-for-bit, and its tracker state equals hand-feeding each event
    chunk's measurement through Tracker.step."""
    positions = [(0.5, 0.4), (0.52, 0.42), (0.54, 0.44)]
    stream = _event_stream(positions)

    tsl = _mk()
    sl = StreamingLocalizer.create(
        MICS, PipelineConfig(phat=True),
        stream=StreamConfig(chunk_size=CHUNK))
    trk = Tracker(tsl.tracker.cfg)

    f_state = tsl.init_state()
    s_state = sl.init_state()
    t_state = trk.init()
    n_events = 0
    for i in range(0, stream.shape[1] - stream.shape[1] % CHUNK, CHUNK):
        chunk = jnp.asarray(stream[:, i: i + CHUNK])
        f_state, f_out = tsl(f_state, chunk)
        s_state, s_out = sl(s_state, chunk)
        # localization half identical
        for key in ("event", "xy", "xy_grid", "tdoa_samples",
                    "best_shift", "event_count"):
            np.testing.assert_array_equal(
                np.asarray(f_out[key]), np.asarray(s_out[key]), err_msg=key)
        # tracker half: replicate the fused rule by hand at event chunks
        if bool(s_out["event"]):
            n_events += 1
            t_state, t_out = trk.step(
                t_state, np.asarray(s_out["xy"], np.float32),
                float(np.asarray(s_state.last_event_s)), True,
                z_cov=np.asarray(s_out["xy_cov"], np.float32))
            assert int(np.asarray(f_out["assigned"])) == int(
                np.asarray(t_out["assigned"]))
        else:
            assert int(np.asarray(f_out["assigned"])) == -1
    assert n_events >= 2
    for leaf_f, leaf_m in zip(jax.tree.leaves(f_state.track),
                              jax.tree.leaves(t_state)):
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_m), atol=1e-5)
    # the three near-identical positions formed ONE confirmed track
    active = np.asarray(f_state.track.active)
    assert active.sum() == 1
    k = int(np.argmax(active))
    xy = np.asarray(f_state.track.x)[k, :2]
    assert np.linalg.norm(xy - [0.52, 0.42]) < 0.15


def test_no_event_chunks_leave_tracker_untouched():
    tsl = _mk()
    state = tsl.init_state()
    rng = np.random.default_rng(1)
    quiet = rng.integers(127, 130, size=(4, CHUNK)).astype(np.float64)
    before = jax.tree.map(np.asarray, state.track)
    state, out = tsl(state, jnp.asarray(quiet))
    assert not bool(out["event"])
    assert int(out["assigned"]) == -1
    after = jax.tree.map(np.asarray, state.track)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_no_event_outputs_equal_carried_state():
    """On silent chunks the REPORTED tracker outputs must equal what the
    carried (reverted) state implies — pins the dt=0 invariant the
    output passthrough relies on (models/tracked.py: t is pinned to the
    previous event time on no-event chunks, so the speculative update is
    an identity on active tracks)."""
    tsl = _mk(tracker_cfg=TrackerConfig(confirm_hits=2))
    stream = _event_stream([(0.5, 0.4), (0.5, 0.4), (0.5, 0.4)])
    state, outs = tsl.run(stream)
    assert any(bool(o["event"]) for o in outs)
    # drive several silent chunks against the settled state
    rng = np.random.default_rng(5)
    cfg = tsl.tracker.cfg
    for _ in range(3):
        quiet = rng.integers(127, 130, size=(4, CHUNK)).astype(np.float64)
        carried = jax.tree.map(np.asarray, state.track)
        state, out = tsl(state, jnp.asarray(quiet))
        assert not bool(out["event"])
        np.testing.assert_array_equal(
            np.asarray(out["track_xy"]), carried.x[:, :cfg.dim])
        np.testing.assert_array_equal(
            np.asarray(out["track_vel"]), carried.x[:, cfg.dim:])
        np.testing.assert_array_equal(
            np.asarray(out["track_active"]), carried.active)
        np.testing.assert_array_equal(
            np.asarray(out["track_confirmed"]),
            carried.active & (carried.hits >= cfg.confirm_hits))
        np.testing.assert_array_equal(
            np.asarray(out["track_id"]), carried.track_id)
        assert int(out["assigned"]) == -1


def test_jpda_second_event_slot_feeds_tracker():
    """With max_events_per_chunk > 1 and n_sources > 1, sources resolved
    in LATER event slots must reach step_multi (r4 advisor finding: they
    were silently dropped).  Two bursts land in ONE chunk; both must
    produce tracker hits in that single fused step."""
    tsl = TrackedStreamingLocalizer.create(
        MICS, PipelineConfig(phat=True),
        stream=StreamConfig(chunk_size=8192, max_events_per_chunk=2,
                            n_sources=2),
        tracker_cfg=TrackerConfig(max_tracks=4, confirm_hits=1))
    rng = np.random.default_rng(2)
    stream = rng.integers(127, 130, size=(4, 8192)).astype(np.float64)
    for e, (x, y) in enumerate([(0.5, 0.4), (0.5, 0.4)]):
        src = np.array([x, y, H]) * (H / np.linalg.norm([x, y, H]))
        fr = synth.synth_scene(src, MICS, noise_rms=0.01, seed=2 + e)[0]
        at = 1500 + e * 3000  # both events inside the one chunk
        stream[:, at: at + 1024] += 110.0 * np.asarray(fr)
    state = tsl.init_state()
    state, out = tsl(state, jnp.asarray(stream))
    assert int(np.asarray(out["events"]).sum()) == 2
    # both accepted events' slot-0 sources carry a valid measurement into
    # the JPDA update: the (single) spatial track accumulates 2 hits
    hits = np.asarray(state.track.hits)
    assert hits.max() == 2, hits


def test_step_many_matches_single_stream_calls():
    """Batched fused serving == per-stream fused calls (same pure step)."""
    s1 = _event_stream([(0.5, 0.4)], seed=3)
    s2 = _event_stream([(-0.6, 0.2)], seed=4, t_len=s1.shape[1])
    tsl = _mk()

    # batched
    states = tsl.init_states(2)
    outs_b = []
    for i in range(0, s1.shape[1] - s1.shape[1] % CHUNK, CHUNK):
        chunks = jnp.stack([
            jnp.asarray(s1[:, i: i + CHUNK]),
            jnp.asarray(s2[:, i: i + CHUNK])])
        states, out = tsl.step_many(states, chunks)
        outs_b.append(jax.tree.map(np.asarray, out))

    # single
    for si, s in enumerate((s1, s2)):
        st = tsl.init_state()
        for ci, i in enumerate(
                range(0, s.shape[1] - s.shape[1] % CHUNK, CHUNK)):
            st, out = tsl(st, jnp.asarray(s[:, i: i + CHUNK]))
            np.testing.assert_allclose(
                np.asarray(out["xy"]), outs_b[ci]["xy"][si], atol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(out["assigned"]),
                outs_b[ci]["assigned"][si])
        for a, b in zip(jax.tree.leaves(st.track),
                        jax.tree.leaves(
                            jax.tree.map(lambda x: x[si], states.track))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_imm_fused_reports_mode_probabilities():
    tsl = _mk(tracker_cfg=TrackerConfig(imm_q=(0.05, 8.0)))
    stream = _event_stream([(0.5, 0.4), (0.5, 0.4)])
    state, outs = tsl.run(stream)
    ev = [o for o in outs if bool(o["event"])]
    assert len(ev) >= 2
    assert "model_prob" in ev[-1]
    mp = ev[-1]["model_prob"]
    assert mp.shape[-1] == 2
    assert np.all(mp >= 0) and np.all(mp <= 1)
    assert np.asarray(state.track.active).sum() == 1


def test_jpda_fused_tracks_two_sources():
    """n_sources=2 chunks update via step_multi: two simultaneous
    spectrally-distinct sources (the test_multisource scene, 8-mic array)
    produce two confirmed tracks in one fused dispatch per chunk."""
    mics8 = geometry.circular_array(8, 0.15)
    pos_a, pos_b = (0.9, 0.3), (-0.7, -0.6)

    def place(x, y):
        return np.array([x, y, H]) * (H / np.linalg.norm([x, y, H]))

    stream = np.zeros((8, 12000))
    for i, at in enumerate((3000, 7000)):
        f1 = synth.synth_scene(place(*pos_a), mics8, seed=10 + 3 * i)
        sig2 = synth.chirp_burst(1024, 50_000.0, f0=2000, f1=9000,
                                 center=0.45)
        f2 = synth.synth_scene(place(*pos_b), mics8, signal=sig2,
                               seed=11 + 3 * i)
        stream[:, at: at + 1024] += np.asarray(f1 + f2)[0]
    stream *= 0.9

    tsl = TrackedStreamingLocalizer.create(
        mics8, PipelineConfig(phat=True),
        stream=StreamConfig(chunk_size=512, n_sources=2),
        tracker_cfg=TrackerConfig(max_tracks=4, confirm_hits=2))
    state, outs = tsl.run(stream)
    ev = [o for o in outs if bool(np.asarray(o["events"]).any())]
    assert len(ev) >= 2
    confirmed = np.asarray(ev[-1]["track_confirmed"])
    assert confirmed.sum() == 2, confirmed
    txy = np.asarray(ev[-1]["track_xy"])[confirmed]
    for target in (pos_a, pos_b):
        err = min(np.linalg.norm(txy - np.asarray(target), axis=-1))
        assert err < 0.1, (txy, target)


def test_create_validation():
    with pytest.raises(ValueError, match="dim must be 3"):
        TrackedStreamingLocalizer.create(
            geometry.tetrahedral_array(0.3), PipelineConfig(),
            stream=StreamConfig(solve_xyz=True),
            tracker_cfg=TrackerConfig(dim=2))
    with pytest.raises(ValueError, match="IMM"):
        TrackedStreamingLocalizer.create(
            MICS, PipelineConfig(),
            stream=StreamConfig(n_sources=2),
            tracker_cfg=TrackerConfig(imm_q=(0.1, 4.0)))
    with pytest.raises(ValueError, match="solve_velocity"):
        TrackedStreamingLocalizer.create(
            MICS, PipelineConfig(), fuse_velocity=True)
    # JPDA multi-source chunks have no velocity-measurement path: the
    # combination must be rejected, not silently dropped
    with pytest.raises(ValueError, match="n_sources"):
        TrackedStreamingLocalizer.create(
            MICS, PipelineConfig(),
            stream=StreamConfig(n_sources=2, solve_velocity=True),
            fuse_velocity=True)


def test_solve_xyz_fused_three_dim_tracks():
    mics = geometry.tetrahedral_array(0.3)
    src = np.array([0.5, 0.4, 1.1])
    rng = np.random.default_rng(5)
    t_len = 3000 + 12000 * 2 + 2048
    stream = rng.integers(127, 130, size=(4, t_len)).astype(np.float64)
    from audio_triangulation_tpu.core.config import SolverConfig

    for e in range(2):
        fr = synth.synth_scene(src, mics, noise_rms=0.01, seed=5 + e)[0]
        at = 3000 + e * 12000
        stream[:, at: at + 1024] += 110.0 * fr
    stream = np.clip(np.round(stream), 0, 255)

    tsl = TrackedStreamingLocalizer.create(
        mics,
        PipelineConfig(phat=True, band_hz=(700.0, 7000.0),
                       window_enabled=False,
                       max_shift_samples=geometry.max_lag_for_array(
                           mics, PipelineConfig())),
        stream=StreamConfig(chunk_size=CHUNK, solve_xyz=True))
    assert tsl.tracker.cfg.dim == 3
    state, outs = tsl.run(stream)
    active = np.asarray(state.track.active)
    assert active.sum() == 1
    k = int(np.argmax(active))
    xyz = np.asarray(state.track.x)[k, :3]
    assert np.linalg.norm(xyz - src) < 0.3, xyz


def test_step_many_scan_matches_sequential_steps():
    """K chunk-steps fused into one dispatch (step_many_scan) must equal
    K sequential step_many calls — states and stacked outputs."""
    s1 = _event_stream([(0.5, 0.4)], seed=6)
    s2 = _event_stream([(-0.6, 0.2)], seed=7, t_len=s1.shape[1])
    tsl = _mk()
    k = 4
    chunks = np.stack([
        np.stack([s[:, i * CHUNK:(i + 1) * CHUNK] for i in range(k)])
        for s in (s1, s2)])  # [S, K, M, C]

    st_seq = tsl.init_states(2)
    outs_seq = []
    for i in range(k):
        st_seq, o = tsl.step_many(st_seq, jnp.asarray(chunks[:, i]))
        outs_seq.append(jax.tree.map(np.asarray, o))

    st_scan, outs = tsl.step_many_scan(
        tsl.init_states(2), jnp.asarray(chunks))
    for a, b in zip(jax.tree.leaves(st_seq), jax.tree.leaves(st_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    for i in range(k):
        for key in ("xy", "event", "track_xy", "assigned"):
            np.testing.assert_allclose(
                np.asarray(outs[key])[i], outs_seq[i][key], atol=1e-5,
                err_msg=f"step {i} {key}")
