"""Kalman tracking layer: moving sources, lifecycle, vmapped streams.

The state-space generalization of the reference's correlogram EMA
(src/components/correlations.c:38-49).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu.models import tracking
from audio_triangulation_tpu.models.tracking import Tracker, TrackerConfig


def _run_track(tr, events):
    st = tr.init()
    outs = []
    for (t, z, valid) in events:
        st, out = tr.step(st, z, t, valid)
        outs.append(jax.tree.map(np.asarray, out))
    return st, outs


def test_moving_source_tracked_with_rms_bound():
    """Constant-velocity source sampled at irregular event times with noisy
    measurements: one confirmed track, RMS position error bounded, velocity
    recovered."""
    rng = np.random.default_rng(0)
    p0 = np.array([0.2, -0.4])
    v = np.array([0.35, 0.2])  # m/s
    times = np.cumsum(rng.uniform(0.06, 0.14, size=40))
    noise = 0.02
    # the synthetic source is truly constant-velocity; match the model
    tr = Tracker(TrackerConfig(measurement_noise=noise, process_noise=0.1))

    st = tr.init()
    errs = []
    for t in times:
        truth = p0 + v * t
        z = truth + rng.normal(0, noise, 2)
        st, out = tr.step(st, z, t)
        conf = np.asarray(out["track_confirmed"])
        if conf.any():
            k = int(np.argmax(conf))
            errs.append(np.linalg.norm(
                np.asarray(out["track_xy"])[k] - truth))
    assert int(np.asarray(st.active).sum()) == 1  # one track, no spawn spam
    errs = np.array(errs[5:])  # after convergence
    rms = np.sqrt((errs ** 2).mean())
    assert rms < 0.04, rms  # ~2x measurement noise
    k = int(np.argmax(np.asarray(st.active)))
    vel = np.asarray(st.x)[k, 2:]
    assert np.linalg.norm(vel - v) < 0.15, vel


def test_two_sources_two_tracks():
    rng = np.random.default_rng(1)
    tr = Tracker(TrackerConfig(max_tracks=4, measurement_noise=0.02))
    st = tr.init()
    a = np.array([0.5, 0.5])
    b = np.array([-0.6, -0.3])
    t = 0.0
    for i in range(20):
        t += 0.1
        src = a if i % 2 == 0 else b
        st, out = tr.step(st, src + rng.normal(0, 0.02, 2), t)
    ids = np.asarray(st.track_id)[np.asarray(st.active)]
    assert len(ids) == 2 and len(set(ids.tolist())) == 2
    xys = np.asarray(st.x)[np.asarray(st.active), :2]
    d = {tuple(np.round(x, 1)) for x in xys}
    assert any(np.linalg.norm(x - a) < 0.1 for x in xys), (xys, d)
    assert any(np.linalg.norm(x - b) < 0.1 for x in xys)


def test_track_lifecycle_confirm_and_drop():
    tr = Tracker(TrackerConfig(confirm_hits=3, max_coast_s=0.5))
    st = tr.init()
    z = np.array([0.1, 0.1])
    # tentative until 3 hits
    st, out = tr.step(st, z, 0.1)
    assert not np.asarray(out["track_confirmed"]).any()
    st, out = tr.step(st, z, 0.2)
    st, out = tr.step(st, z, 0.3)
    assert np.asarray(out["track_confirmed"]).any()
    # silence beyond the coast window drops it (the next event is far away
    # and spawns a new track)
    st, out = tr.step(st, np.array([2.0, 2.0]), 2.0)
    assert int(np.asarray(st.dropped)) == 1
    active_ids = np.asarray(st.track_id)[np.asarray(st.active)]
    assert active_ids.tolist() == [2]  # fresh track id, old one gone


def test_invalid_measurements_are_ignored():
    tr = Tracker()
    st = tr.init()
    st, out = tr.step(st, np.array([5.0, 5.0]), 1.0, valid=False)
    assert not np.asarray(st.active).any()
    assert int(np.asarray(out["assigned"])) == -1


def test_unassigned_counter_when_bank_full():
    tr = Tracker(TrackerConfig(max_tracks=2, gate_maha2=1e-6))
    st = tr.init()
    pts = [np.array([0.0, 0.0]), np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    for i, z in enumerate(pts):
        st, _ = tr.step(st, z, 0.1 * (i + 1))
    assert int(np.asarray(st.unassigned)) == 1


def test_vmapped_multistream_matches_single():
    rng = np.random.default_rng(3)
    tr = Tracker()
    n = 3
    targets = rng.uniform(-1, 1, size=(n, 2))
    times = np.cumsum(rng.uniform(0.05, 0.15, size=(12, n)), axis=0)
    zs = targets[None] + rng.normal(0, 0.02, size=(12, n, 2))
    valids = rng.uniform(size=(12, n)) > 0.2

    states = tr.init_many(n)
    for i in range(12):
        states, outs = tr.step_many(states, zs[i], times[i], valids[i])

    for s in range(n):
        st = tr.init()
        for i in range(12):
            st, _ = tr.step(st, zs[i, s], times[i, s], valids[i, s])
        np.testing.assert_allclose(
            np.asarray(states.x)[s], np.asarray(st.x), rtol=1e-5, atol=1e-6)
        assert (np.asarray(states.active)[s]
                == np.asarray(st.active)).all()


def test_streaming_pipeline_feeds_tracker():
    """End to end: streaming localizer events drive the tracker."""
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer
    from audio_triangulation_tpu.utils import synth

    mics = geometry.reference_array()
    src = np.array([0.5, 0.4, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    plane_xy = None

    rng = np.random.default_rng(7)
    streams = rng.integers(127, 130, size=(3, 40_000)).astype(np.float64)
    for at in (9_000, 22_000, 35_000):
        fr = synth.synth_scene(src, mics, noise_rms=0.0, seed=at)[0]
        streams[:, at: at + 1024] += 110.0 * fr
    streams = np.clip(np.round(streams), 0, 255)

    sl = StreamingLocalizer.create(
        mics, stream=StreamConfig(chunk_size=512), with_solver=True)
    tr = Tracker(TrackerConfig(measurement_noise=0.03))
    sstate, tstate = sl.init_state(), tr.init()
    fs = 50_000.0
    for i in range(0, streams.shape[1] - streams.shape[1] % 512, 512):
        sstate, out = sl(sstate, jnp.asarray(streams[:, i: i + 512]))
        tstate, tout = tr.step(
            tstate, out["xy"], i / fs, out["event"])
        if plane_xy is None and bool(out["event"]):
            plane_xy = np.asarray(out["xy"])
    assert int(np.asarray(tstate.active).sum()) == 1
    conf = np.asarray(tout["track_confirmed"])
    assert conf.any()
    k = int(np.argmax(conf))
    xy = np.asarray(tout["track_xy"])[k]
    # static source at the batch-path position
    assert np.linalg.norm(xy - plane_xy) < 0.05, (xy, plane_xy)


# ----------------------------------------------------------------------
# Soft (PDA/JPDA-style) association
# ----------------------------------------------------------------------

def test_soft_single_target_matches_hard():
    """With one clean target the association posterior saturates (b ~ 1),
    so the soft tracker reduces to the hard one."""
    rng = np.random.default_rng(3)
    base = dict(measurement_noise=0.02, process_noise=0.1)
    hard = Tracker(TrackerConfig(**base))
    soft = Tracker(TrackerConfig(association="soft", clutter_density=0.05,
                                 **base))
    sh, ss = hard.init(), soft.init()
    p0, v = np.array([0.1, 0.2]), np.array([0.3, -0.25])
    for t in np.cumsum(rng.uniform(0.08, 0.12, 30)):
        z = p0 + v * t + rng.normal(0, 0.02, 2)
        sh, oh = hard.step(sh, z, t)
        ss, os_ = soft.step(ss, z, t)
    assert int(np.asarray(ss.active).sum()) == 1
    kh = int(np.argmax(np.asarray(sh.active)))
    ks = int(np.argmax(np.asarray(ss.active)))
    np.testing.assert_allclose(np.asarray(ss.x)[ks], np.asarray(sh.x)[kh],
                               atol=0.02)


def test_soft_crossing_sources_keep_identities():
    """Two constant-velocity sources crossing paths: soft association keeps
    both tracks alive with their original identities through the crossing
    (no drop + respawn), and each ends on its own side."""
    rng = np.random.default_rng(4)
    cfg = TrackerConfig(association="soft", max_tracks=4,
                        measurement_noise=0.02, process_noise=0.05,
                        clutter_density=0.05, max_coast_s=3.0)
    tr = Tracker(cfg)
    st = tr.init()
    # cross at t=1 at the origin, approaching along +-x
    va, vb = np.array([0.5, 0.05]), np.array([-0.5, 0.05])
    pa, pb = -va, -vb  # so both are at (0, ~0.05) at t=1
    for t in np.arange(0.05, 2.0, 0.05):
        for (p, v) in ((pa, va), (pb, vb)):
            z = p + v * t + rng.normal(0, 0.02, 2)
            st, out = tr.step(st, z, t)
    ids = np.asarray(st.track_id)[np.asarray(st.active)]
    assert len(ids) == 2
    # no mid-run drop/respawn: only the two original ids were ever issued
    assert int(st.next_id) == 3, int(st.next_id)
    assert int(st.dropped) == 0
    # tracks ended on opposite sides with opposite x-velocities
    act = np.asarray(st.active)
    vx = np.asarray(st.x)[act, 2]
    assert (vx > 0.2).any() and (vx < -0.2).any(), vx


def test_soft_clutter_does_not_refresh_tracks():
    """A far-away (ungated) measurement must neither update the existing
    track nor refresh its coast timer, but spawns its own track."""
    cfg = TrackerConfig(association="soft", measurement_noise=0.02)
    tr = Tracker(cfg)
    st = tr.init()
    for t in (0.1, 0.2, 0.3):
        st, _ = tr.step(st, np.array([0.5, 0.5]), t)
    x_before = np.asarray(st.x).copy()
    st, out = tr.step(st, np.array([-1.5, -1.5]), 0.4)  # clutter/new source
    k = int(np.argmax(np.asarray(st.track_id) == 1))
    # original track coasted (predicted), not measurement-updated
    assert abs(np.asarray(st.last_t)[k] - 0.3) < 1e-6
    np.testing.assert_allclose(np.asarray(st.x)[k, :2], x_before[k, :2],
                               atol=0.01)
    # the unexplained measurement spawned a second track
    assert int(np.asarray(st.active).sum()) == 2


# ----------------------------------------------------------------------
# Joint multi-measurement JPDA (step_multi)
# ----------------------------------------------------------------------

def test_step_multi_n1_matches_soft_step():
    """Fitzgerald's normalization reduces to the PDA posterior at N=1, so
    step_multi([z]) must equal step(z) in soft mode, state for state."""
    rng = np.random.default_rng(7)
    cfg = TrackerConfig(association="soft", measurement_noise=0.02,
                        clutter_density=0.1)
    a, b = Tracker(cfg), Tracker(cfg)
    sa, sb = a.init(), b.init()
    p0, v = np.array([0.0, 0.1]), np.array([0.2, -0.1])
    for t in np.cumsum(rng.uniform(0.08, 0.12, 20)):
        z = p0 + v * t + rng.normal(0, 0.02, 2)
        sa, _ = a.step(sa, z, t)
        sb, _ = b.step_multi(sb, z[None, :], t)
    # identical math, different float op order (gain@yy@gain' vs
    # b(1-b)(Ky)(Ky)') -> tolerance, not bit equality
    np.testing.assert_allclose(np.asarray(sa.x), np.asarray(sb.x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sa.p), np.asarray(sb.p),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sa.hits), np.asarray(sb.hits))


def test_step_multi_two_sources_one_update_each():
    """Two simultaneous measurements near two established tracks update
    both tracks jointly without double-counting either."""
    rng = np.random.default_rng(8)
    cfg = TrackerConfig(association="soft", measurement_noise=0.02,
                        process_noise=0.05)
    tr = Tracker(cfg)
    st = tr.init()
    pa, pb = np.array([0.5, 0.5]), np.array([-0.5, -0.5])
    # establish both tracks (well separated -> unambiguous)
    for t in np.arange(0.1, 1.0, 0.1):
        for p in (pa, pb):
            st, _ = tr.step(st, p + rng.normal(0, 0.02, 2), t)
    assert int(np.asarray(st.active).sum()) == 2
    hits0 = np.asarray(st.hits).copy()
    st, out = tr.step_multi(
        st, np.stack([pa + rng.normal(0, 0.02, 2),
                      pb + rng.normal(0, 0.02, 2)]), 1.1)
    assigned = np.asarray(out["assigned"])
    assert set(assigned.tolist()) == {0, 1}  # one distinct track each
    # each track got exactly one hit, no spawns
    assert int(np.asarray(st.active).sum()) == 2
    np.testing.assert_array_equal(
        np.asarray(st.hits)[np.asarray(st.active)],
        hits0[np.asarray(st.active)] + 1)


def test_step_multi_spawns_multiple():
    """Two unexplained simultaneous measurements spawn two tracks in one
    call (distinct slots, distinct ids)."""
    tr = Tracker(TrackerConfig(association="soft"))
    st = tr.init()
    st, out = tr.step_multi(
        st, np.array([[0.4, 0.4], [-0.6, 0.2]]), 0.1)
    assert int(np.asarray(st.active).sum()) == 2
    ids = np.asarray(st.track_id)[np.asarray(st.active)]
    assert sorted(ids.tolist()) == [1, 2]
    xy = np.asarray(st.x)[np.asarray(st.active)][:, :2]
    got = {tuple(round(float(v), 1) for v in r) for r in xy}
    assert got == {(0.4, 0.4), (-0.6, 0.2)}, got


def _bruteforce_joint_beta(like, b_const):
    """Independent brute-force JPDA marginalization (pure Python/NumPy):
    enumerate injective partial assignments, weight = prod L * B^#clutter."""
    import itertools

    n, k = like.shape
    num = np.zeros((n, k))
    tot = 0.0
    for choice in itertools.product(range(-1, k), repeat=n):
        used = [c for c in choice if c >= 0]
        if len(used) != len(set(used)):
            continue
        w = 1.0
        for ni, c in enumerate(choice):
            w *= b_const if c < 0 else like[ni, c]
        tot += w
        for ni, c in enumerate(choice):
            if c >= 0:
                num[ni, c] += w
    return num / tot


def test_step_multi_exact_beta_matches_bruteforce():
    """The einsum-marginalized exact-JPDA posterior equals an independent
    itertools enumeration of the same joint-event weights."""
    rng = np.random.default_rng(11)
    cfg = TrackerConfig(association="soft", joint_association="exact",
                        measurement_noise=0.03, process_noise=0.02,
                        gate_maha2=1e9)  # no gating: every cell live
    tr = Tracker(cfg)
    st = tr.init()
    # establish 3 tracks
    pts = [np.array([0.3, 0.0]), np.array([-0.3, 0.0]), np.array([0.0, 0.4])]
    for t in np.arange(0.1, 1.0, 0.1):
        for p in pts:
            st, _ = tr.step(st, p + rng.normal(0, 0.02, 2), t)
    assert int(np.asarray(st.active).sum()) == 3

    # recompute the likelihood matrix the way step_multi does
    t1 = 1.05
    zs = np.array([[0.25, 0.05], [-0.05, 0.2]])
    active, _, xp, pp, s_cov, sinv, det = tracking._predict_all(
        st, jnp.float32(t1), cfg)
    innov = zs[:, None, :] - np.asarray(xp)[None, :, :2]
    sinv, det = np.asarray(sinv), np.asarray(det)
    maha2 = np.einsum("nki,kij,nkj->nk", innov, sinv, innov)
    like = np.where(np.asarray(active)[None, :],
                    np.exp(-0.5 * np.minimum(maha2, 80.0))
                    / (2 * np.pi * np.sqrt(det)), 0.0)
    want = _bruteforce_joint_beta(like,
                                  cfg.clutter_density / cfg.detect_prob)

    _, out = tr.step_multi(st, zs, t1)
    got = np.asarray(out["beta"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_step_multi_exact_n1_matches_cheap():
    """Both normalizations are the PDA posterior at N = 1, so exact and
    cheap step_multi must agree measurement-for-measurement."""
    rng = np.random.default_rng(12)
    mk = lambda ja: Tracker(TrackerConfig(
        association="soft", joint_association=ja, measurement_noise=0.02))
    a, b = mk("cheap"), mk("exact")
    sa, sb = a.init(), b.init()
    p0, v = np.array([0.1, -0.2]), np.array([0.15, 0.1])
    for t in np.cumsum(rng.uniform(0.08, 0.12, 15)):
        z = (p0 + v * t + rng.normal(0, 0.02, 2))[None, :]
        sa, oa = a.step_multi(sa, z, t)
        sb, ob = b.step_multi(sb, z, t)
        np.testing.assert_allclose(np.asarray(oa["beta"]),
                                   np.asarray(ob["beta"]),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sa.x), np.asarray(sb.x),
                               rtol=1e-4, atol=1e-5)


def test_step_multi_exact_enforces_exclusivity():
    """Two tracks, two measurements: m0 sits ON track A, m1 halfway between
    A and B.  Exact JPDA knows A is claimed by m0, so m1's posterior mass
    shifts toward B relative to the cheap normalization."""
    rng = np.random.default_rng(13)

    def run(ja):
        cfg = TrackerConfig(association="soft", joint_association=ja,
                            measurement_noise=0.04, process_noise=0.02)
        tr = Tracker(cfg)
        st = tr.init()
        pa, pb = np.array([0.12, 0.0]), np.array([-0.12, 0.0])
        for t in np.arange(0.1, 1.0, 0.1):
            for p in (pa, pb):
                st, _ = tr.step(st, p + rng.normal(0, 0.015, 2), t)
        assert int(np.asarray(st.active).sum()) == 2
        ia = int(np.argmin(np.abs(np.asarray(st.x)[:, 0] - 0.12)))
        ib = int(np.argmin(np.abs(np.asarray(st.x)[:, 0] + 0.12)))
        zs = np.array([[0.12, 0.0],    # on A
                       [0.0, 0.0]])    # ambiguous between A and B
        _, out = tr.step_multi(st, zs, 1.05)
        beta = np.asarray(out["beta"])
        return beta[1, ia], beta[1, ib]

    cheap_a, cheap_b = run("cheap")
    exact_a, exact_b = run("exact")
    # exact: the ambiguous measurement leans to B (A is taken by m0)
    assert exact_b > exact_a, (exact_a, exact_b)
    # and leans to B strictly more than the cheap approximation does
    assert exact_b - exact_a > (cheap_b - cheap_a) + 0.02, (
        (cheap_a, cheap_b), (exact_a, exact_b))


def test_joint_event_tables():
    onehot, nclut = tracking._joint_event_tables(4, 4)
    assert onehot.shape == (209, 4, 4)  # sum_m C(4,m) P(4,m)
    # each event: per-measurement at most one track; injective
    assert (onehot.sum(axis=2) <= 1).all()
    assert (onehot.sum(axis=1) <= 1).all()
    np.testing.assert_allclose(
        nclut, 4 - onehot.sum(axis=(1, 2)))
    # events are unique
    flat = onehot.reshape(209, -1)
    assert len({tuple(r) for r in flat.astype(int)}) == 209


def test_joint_event_tables_oversize_raises_fast():
    """The event-count guard must fire from the closed form BEFORE the
    (k+1)^n enumeration loop — N=K=8 is ~43M tuples, an effective hang if
    enumerated first."""
    import time

    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="cheap"):
        tracking._joint_event_tables(8, 8)
    assert time.perf_counter() - t0 < 1.0


def test_joint_event_tables_many_measurements_few_tracks():
    """N > K with a small event table must build fast: construction is
    O(E) over (subset, permutation) pairs, not O((K+1)^N) tuple filtering
    (N=12, K=3 is only 1,753 events but 16.7M tuples)."""
    import math
    import time

    t0 = time.perf_counter()
    onehot, nclut = tracking._joint_event_tables(12, 3)
    assert time.perf_counter() - t0 < 2.0
    e = sum(math.comb(12, m) * math.perm(3, m) for m in range(4))
    assert onehot.shape == (e, 12, 3)
    assert (onehot.sum(axis=2) <= 1).all()  # measurement -> <=1 track
    assert (onehot.sum(axis=1) <= 1).all()  # track -> <=1 measurement
    np.testing.assert_allclose(nclut, 12 - onehot.sum(axis=(1, 2)))
    flat = onehot.reshape(e, -1)
    assert len({tuple(r) for r in flat.astype(int)}) == e  # unique


def test_step_multi_shared_measurement_splits_weight():
    """One measurement between two nearby tracks: weight splits, neither
    track is fully captured (beta < 1 for both)."""
    rng = np.random.default_rng(9)
    cfg = TrackerConfig(association="soft", measurement_noise=0.03,
                        process_noise=0.02)
    tr = Tracker(cfg)
    st = tr.init()
    pa, pb = np.array([0.1, 0.0]), np.array([-0.1, 0.0])
    for t in np.arange(0.1, 1.0, 0.1):
        for p in (pa, pb):
            st, _ = tr.step(st, p + rng.normal(0, 0.02, 2), t)
    st, out = tr.step_multi(st, np.array([[0.0, 0.0]]), 1.05)
    beta = np.asarray(out["beta"])[0]
    act = np.asarray(st.active)
    assert act.sum() >= 2
    on = beta[act[: len(beta)]] if beta.shape[0] == act.shape[0] else beta
    top2 = np.sort(beta)[-2:]
    assert top2[0] > 0.1 and top2[1] < 0.9, beta


# ---------------------------------------------------------------------
# 3-D tracking (dim=3): pairs with the volumetric localizer's xyz
# ---------------------------------------------------------------------

def test_track_3d_constant_velocity():
    """dim=3 bank recovers position AND vertical velocity of a rising
    source (the axis 2-D tracking cannot represent)."""
    rng = np.random.default_rng(21)
    cfg = TrackerConfig(dim=3, measurement_noise=0.03, process_noise=0.1,
                        gate_maha2=11.34)
    tr = Tracker(cfg)
    st = tr.init()
    p0 = np.array([0.2, -0.3, 0.5])
    v = np.array([0.3, -0.1, 0.25])  # rising at 25 cm/s
    out = None
    for t in np.arange(0.1, 2.1, 0.1):
        z = p0 + v * t + rng.normal(0, 0.02, 3)
        st, out = tr.step(st, z, t)
    k = int(np.asarray(out["assigned"]))
    assert k >= 0 and bool(np.asarray(out["track_confirmed"])[k])
    xyz = np.asarray(out["track_xy"])[k]       # [3] (name kept; [dim])
    vel = np.asarray(out["track_vel"])[k]      # [3]
    assert np.linalg.norm(xyz - (p0 + v * 2.0)) < 0.06, xyz
    assert np.linalg.norm(vel - v) < 0.12, vel
    assert abs(vel[2] - 0.25) < 0.1, vel


def test_step_multi_3d_separates_heights():
    """Two sources sharing (x, y) at different heights: a dim=3 JPDA bank
    keeps two distinct confirmed tracks (a 2-D tracker would merge them)."""
    rng = np.random.default_rng(22)
    cfg = TrackerConfig(dim=3, association="soft", measurement_noise=0.03,
                        process_noise=0.05, gate_maha2=11.34,
                        joint_association="exact")
    tr = Tracker(cfg)
    st = tr.init()
    out = None
    for t in np.arange(0.1, 1.6, 0.1):
        zs = np.stack([
            np.array([0.4, 0.2, 0.6]) + rng.normal(0, 0.015, 3),
            np.array([0.4, 0.2, 1.8]) + rng.normal(0, 0.015, 3)])
        st, out = tr.step_multi(st, zs, t)
    conf = np.asarray(out["track_confirmed"])
    assert conf.sum() == 2, conf
    zvals = np.sort(np.asarray(out["track_xy"])[conf][:, 2])
    assert abs(zvals[0] - 0.6) < 0.1 and abs(zvals[1] - 1.8) < 0.1, zvals


def test_volume_localizer_feeds_3d_tracker():
    """End-to-end volumetric chain: raw frames of a moving source ->
    VolumeLocalizer xyz -> dim=3 tracker -> confirmed track with the
    injected 3-D velocity."""
    from audio_triangulation_tpu import PipelineConfig, VolumeConfig
    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.models.volume import VolumeLocalizer
    from audio_triangulation_tpu.utils import synth

    mics = geometry.tetrahedral_array(0.3)
    cfg = PipelineConfig(
        phat=True, band_hz=(700.0, 7000.0), window_enabled=False,
        max_shift_samples=geometry.max_lag_for_array(
            mics, PipelineConfig()))
    vol = VolumeConfig(half_cells_x=14, half_cells_y=14, cells_per_m=10.0,
                       z_min_m=0.3, z_max_m=2.1, z_cells=19)
    loc = VolumeLocalizer.create(mics, cfg, vol)

    p0 = np.array([0.3, -0.5, 0.6])
    v = np.array([0.2, 0.3, 0.35])
    times = np.arange(0.15, 1.66, 0.15)  # 11 events
    src = p0 + v * times[:, None]
    frames = jnp.asarray(
        synth.synth_scene(src, mics, noise_rms=0.004, seed=23), jnp.float32)
    xyz = np.asarray(loc(frames)["xyz"])  # [T, 3]

    # low process noise: the source is truly constant-velocity, and the
    # volumetric measurements have correlated errors along the weakly
    # observable range direction that a twitchy filter would chase
    tr = Tracker(TrackerConfig(dim=3, measurement_noise=0.04,
                               process_noise=0.1, gate_maha2=11.34))
    st = tr.init()
    out = None
    for t, z in zip(times, xyz):
        st, out = tr.step(st, z, float(t))
    k = int(np.asarray(out["assigned"]))
    assert k >= 0 and bool(np.asarray(out["track_confirmed"])[k])
    vel = np.asarray(out["track_vel"])[k]
    assert np.linalg.norm(vel - v) < 0.25, (vel, v)
    pos = np.asarray(out["track_xy"])[k]
    assert np.linalg.norm(pos - src[-1]) < 0.12, (pos, src[-1])
    # this trajectory contains one ~0.5 m range-direction outlier event:
    # the 3-dof gate must have isolated it (spawned, never confirmed)
    # instead of letting it pollute the confirmed track
    conf = np.asarray(out["track_confirmed"])
    act = np.asarray(out["track_active"])
    assert act.sum() >= 2 and conf.sum() == 1, (act, conf)


def test_velocity_measurement_spawn_and_update():
    """z_vel (e.g. localize_moving's delay-Doppler velocity): a spawned
    track carries the measured velocity from the FIRST event, and the
    sequential velocity update keeps the estimate tight between events."""
    tr = Tracker(TrackerConfig(confirm_hits=2, velocity_noise=0.4))
    state = tr.init()
    v = np.array([2.0, -1.5], np.float32)
    x0 = np.array([0.3, 0.2], np.float32)

    state, out = tr.step(state, x0, 0.0, True, z_vel=v)
    # a spawn is not an "assignment"; read the newly active slot
    k = int(np.argmax(np.asarray(out["track_active"])))
    assert bool(np.asarray(out["track_active"])[k])
    got_v = np.asarray(out["track_vel"])[k]
    assert np.linalg.norm(got_v - v) < 1e-5, got_v  # spawn copies z_vel

    # second event: position consistent with v; velocity stays tight
    state, out = tr.step(state, x0 + 0.5 * v, 0.5, True,
                         z_vel=v + np.array([0.3, -0.2], np.float32))
    k = int(out["assigned"])
    assert bool(np.asarray(out["track_confirmed"])[k])
    got_v = np.asarray(out["track_vel"])[k]
    assert np.linalg.norm(got_v - v) < 0.35, got_v


def test_velocity_measurement_beats_position_only():
    """After two events, a tracker fed velocity measurements has a lower
    velocity error than position-only (which needs several events for the
    CV filter to infer velocity through the position sequence)."""
    v = np.array([3.0, -2.0], np.float32)
    x0 = np.array([0.0, 0.0], np.float32)
    rng = np.random.default_rng(9)

    def run(with_vel):
        tr = Tracker(TrackerConfig(velocity_noise=0.5))
        st = tr.init()
        out = None
        for i in range(2):
            t = 0.4 * i
            z = x0 + v * t + rng.normal(0, 0.01, 2).astype(np.float32)
            zv = (v + rng.normal(0, 0.3, 2).astype(np.float32)
                  if with_vel else None)
            st, out = tr.step(st, z, t, True, z_vel=zv)
        k = int(out["assigned"])
        return np.linalg.norm(np.asarray(out["track_vel"])[k] - v)

    assert run(True) < run(False)


def test_v_cov_without_z_vel_raises():
    """Regression: v_cov qualifies a velocity MEASUREMENT — without z_vel
    it used to dispatch to the retrace path and be silently ignored (no
    velocity fusion at all).  Now it is a loud error."""
    tr = Tracker(TrackerConfig())
    state = tr.init()
    with pytest.raises(ValueError, match="z_vel"):
        tr.step(state, np.zeros(2, np.float32), 0.0, True,
                v_cov=0.1 * np.eye(2, dtype=np.float32))


def test_rts_smoother_beats_filter():
    """Offline RTS smoothing over a recorded track history: conditioning
    on the whole event sequence must cut both position and velocity error
    vs the causal filter, the last point must equal the filtered anchor,
    and the smoothed covariances must not exceed the filtered ones."""
    rng = np.random.default_rng(11)
    v = np.array([1.5, -1.0], np.float32)
    x0 = np.array([-0.5, 0.4], np.float32)
    noise = 0.05
    tr = Tracker(TrackerConfig(measurement_noise=noise, process_noise=0.05))
    state = tr.init()

    ts, xs_f, ps_f, truth = [], [], [], []
    for i in range(20):
        t = 0.15 * i
        pos = x0 + v * t
        z = pos + rng.normal(0, noise, 2).astype(np.float32)
        state, out = tr.step(state, z, t, True)
        k = int(np.argmax(np.asarray(out["track_active"])))
        ts.append(t)
        xs_f.append(np.asarray(state.x[k]))
        ps_f.append(np.asarray(state.p[k]))
        truth.append(pos)
    xs_f, ps_f, truth = map(np.stack, (xs_f, ps_f, truth))

    xs_s, ps_s = tr.smooth(xs_f, ps_f, np.asarray(ts))
    xs_s, ps_s = np.asarray(xs_s), np.asarray(ps_s)

    np.testing.assert_allclose(xs_s[-1], xs_f[-1], atol=1e-6)
    np.testing.assert_allclose(ps_s[-1], ps_f[-1], atol=1e-6)

    err_f = np.linalg.norm(xs_f[:, :2] - truth, axis=-1)
    err_s = np.linalg.norm(xs_s[:, :2] - truth, axis=-1)
    assert err_s.mean() < 0.8 * err_f.mean(), (err_s.mean(), err_f.mean())
    verr_f = np.linalg.norm(xs_f[2:, 2:] - v, axis=-1)
    verr_s = np.linalg.norm(xs_s[2:, 2:] - v, axis=-1)
    assert verr_s.mean() < verr_f.mean()
    # uncertainty shrinks (or holds) everywhere: tr(Ps) <= tr(Pf) + eps
    tr_f = np.trace(ps_f, axis1=-2, axis2=-1)
    tr_s = np.trace(ps_s, axis1=-2, axis2=-1)
    assert (tr_s <= tr_f + 1e-6).all()
    # the early points gain the most (the filter is still converging there)
    assert tr_s[0] < 0.7 * tr_f[0]


def test_rts_smoother_dim3():
    """The smoother is dimension-generic like the bank (dim=3 states)."""
    rng = np.random.default_rng(12)
    v = np.array([1.0, -0.8, 0.4], np.float32)
    x0 = np.array([0.2, 0.1, 1.0], np.float32)
    tr = Tracker(TrackerConfig(dim=3, gate_maha2=11.34,
                               measurement_noise=0.05, process_noise=0.05))
    state = tr.init()
    ts, xs_f, ps_f, truth = [], [], [], []
    for i in range(15):
        t = 0.2 * i
        pos = x0 + v * t
        z = pos + rng.normal(0, 0.05, 3).astype(np.float32)
        state, out = tr.step(state, z, t, True)
        k = int(np.argmax(np.asarray(out["track_active"])))
        ts.append(t)
        xs_f.append(np.asarray(state.x[k]))
        ps_f.append(np.asarray(state.p[k]))
        truth.append(pos)
    xs_f, ps_f, truth = map(np.stack, (xs_f, ps_f, truth))
    xs_s, _ = map(np.asarray, tr.smooth(xs_f, ps_f, np.asarray(ts)))
    err_f = np.linalg.norm(xs_f[:, :3] - truth, axis=-1)
    err_s = np.linalg.norm(xs_s[:, :3] - truth, axis=-1)
    assert err_s.mean() < 0.85 * err_f.mean(), (err_s.mean(), err_f.mean())


def test_unassigned_track_predicts_once_per_interval():
    """Regression: the stored state refers to state_t (the step's t), so an
    ACTIVE track that receives no measurements for several steps must not be
    re-predicted from its last ASSIGNMENT time each step (that compounded
    quadratically for per-chunk callers: position t0 + sum(k*dt)*v instead
    of t0 + (t - t0)*v)."""
    tr = Tracker(TrackerConfig(max_tracks=2, process_noise=0.01,
                               measurement_noise=0.02, max_coast_s=10.0))
    state = tr.init()
    # establish track A moving in +x
    state, _ = tr.step(state, np.array([0.0, 0.0], np.float32), 0.0, True)
    state, out = tr.step(state, np.array([0.1, 0.0], np.float32), 0.1, True)
    a = int(np.asarray(out["assigned"]))
    assert a >= 0
    x_a = float(np.asarray(state.x)[a, 0])   # posterior position at t=0.1
    v_a = float(np.asarray(state.x)[a, 2])   # posterior velocity
    # far-away track B takes every later measurement; A only coasts
    for t in (0.2, 0.3, 0.4, 0.5):
        state, out = tr.step(
            state, np.array([5.0, 5.0], np.float32), t, True)
        assigned = int(np.asarray(out["assigned"]))
        assert assigned != a  # -1 (spawn) or B's slot
    # A coasted under constant velocity: x(0.5) = x(0.1) + v * 0.4 exactly
    # (the double-predict bug lands at x(0.1) + v * (0.1+0.2+0.3+0.4))
    xa = float(np.asarray(out["track_xy"])[a, 0])
    np.testing.assert_allclose(xa, x_a + v_a * 0.4, atol=1e-5)
    # and the stored state is AT t (state_t), not stale
    np.testing.assert_allclose(float(np.asarray(state.state_t)[a]), 0.5)
