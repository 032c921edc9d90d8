"""IMM (interacting multiple model) tracker bank.

The single-model CV tracker forces one process noise to cover both
cruising and maneuvering; the IMM bank (TrackerConfig.imm_q) runs a
mode-matched filter per regime and switches by measurement likelihood.
These tests pin the headline property (beats any fixed q on a
maneuvering target), the single-mode degeneracy (R=1 IMM == plain CV),
vmapped multi-stream equality, lifecycle, and the unsupported-path
guards.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu.models import tracking


def _maneuver_scene(dt=0.1, t_end=8.0, turn_t=4.0, noise=0.03, seed=0):
    """Straight at (1,0) m/s, instant 90-degree turn at turn_t, straight
    at (0,1) m/s."""
    rng = np.random.default_rng(seed)
    ts = np.arange(0.0, t_end, dt)
    pos = np.zeros((len(ts), 2))
    p = np.array([-1.5, -1.0])
    v = np.array([1.0, 0.0])
    for i, t in enumerate(ts):
        pos[i] = p
        if abs(t - turn_t) < 1e-9:
            v = np.array([0.0, 1.0])
        p = p + v * dt
    return ts, pos, pos + rng.normal(0, noise, pos.shape)


def _run(cfg, ts, zs, truth):
    tr = tracking.Tracker(cfg)
    st = tr.init()
    est, mus = [], []
    for t, z in zip(ts, zs):
        st, out = tr.step(st, z, t)
        i = int(np.argmax(np.asarray(out["track_active"])))
        est.append(np.asarray(out["track_xy"])[i])
        if "model_prob" in out:
            mus.append(np.asarray(out["model_prob"])[i])
    err = np.linalg.norm(np.array(est) - truth, axis=1)
    return err, (np.array(mus) if mus else None)


def test_imm_beats_fixed_q_on_maneuver():
    """Measured (seed 0): low-q CV 1.40 m overall (diverges in the turn),
    high-q CV 0.035, IMM 0.028 — and IMM matches low-q CV on the straight
    leg where high-q jitters."""
    ts, pos, zs = _maneuver_scene()
    e_lo, _ = _run(tracking.TrackerConfig(process_noise=0.05), ts, zs, pos)
    e_hi, _ = _run(tracking.TrackerConfig(process_noise=8.0), ts, zs, pos)
    e_imm, mus = _run(
        tracking.TrackerConfig(imm_q=(0.05, 8.0)), ts, zs, pos)

    turn = (ts >= 4.0) & (ts <= 5.5)
    straight = (ts >= 1.0) & (ts < 4.0)
    # the turn breaks the low-q filter; IMM survives it
    assert e_lo[turn].mean() > 10 * e_imm[turn].mean()
    # on the straight leg IMM is not worse than the high-q filter
    assert e_imm[straight].mean() <= e_hi[straight].mean() + 0.005
    # overall IMM beats both fixed choices
    assert e_imm[5:].mean() < e_lo[5:].mean()
    assert e_imm[5:].mean() < e_hi[5:].mean() + 1e-4

    # mode beliefs: maneuver mode quiet on the straight, lit in the turn,
    # released afterwards
    m1 = mus[:, 1]
    assert m1[ts.searchsorted(3.5)] < 0.2
    assert m1[ts.searchsorted(4.3)] > 0.7
    assert m1[ts.searchsorted(7.5)] < 0.2


def test_single_mode_imm_equals_plain_cv():
    """R=1 IMM degenerates exactly: mixing is the identity and the
    likelihood reweight is a no-op, so the trajectory equals step()'s."""
    ts, pos, zs = _maneuver_scene(t_end=3.0)
    q = 0.8
    tr_cv = tracking.Tracker(tracking.TrackerConfig(process_noise=q))
    tr_imm = tracking.Tracker(
        tracking.TrackerConfig(process_noise=123.0,  # must be ignored
                               imm_q=(q,)))
    st_cv, st_imm = tr_cv.init(), tr_imm.init()
    for t, z in zip(ts, zs):
        st_cv, out_cv = tr_cv.step(st_cv, z, t)
        st_imm, out_imm = tr_imm.step(st_imm, z, t)
        np.testing.assert_allclose(np.asarray(out_imm["track_xy"]),
                                   np.asarray(out_cv["track_xy"]),
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_imm.xm[:, 0]),
                               np.asarray(st_cv.x), atol=1e-5)


def test_imm_step_many_matches_loop():
    ts, pos, zs = _maneuver_scene(t_end=2.0)
    cfg = tracking.TrackerConfig(imm_q=(0.1, 5.0))
    tr = tracking.Tracker(cfg)
    n = 3
    states = tr.init_many(n)
    # each stream sees a shifted copy of the measurements
    offsets = np.array([[0.0, 0.0], [1.0, -0.5], [-2.0, 0.7]])
    for t, z in zip(ts, zs):
        zn = jnp.asarray(z[None] + offsets, jnp.float32)
        states, outs = tr.step_many(
            states, zn, jnp.full((n,), t), jnp.ones((n,), bool))
    seq_states = [tr.init() for _ in range(n)]
    for t, z in zip(ts, zs):
        for i in range(n):
            seq_states[i], _ = tr.step(
                seq_states[i], jnp.asarray(z + offsets[i], jnp.float32), t)
    for i in range(n):
        np.testing.assert_allclose(np.asarray(states.xm[i]),
                                   np.asarray(seq_states[i].xm), atol=1e-4)
        np.testing.assert_allclose(np.asarray(states.mu[i]),
                                   np.asarray(seq_states[i].mu), atol=1e-5)


def test_imm_lifecycle_and_soft_association():
    cfg = tracking.TrackerConfig(imm_q=(0.1, 5.0), association="soft",
                                 max_coast_s=0.5)
    tr = tracking.Tracker(cfg)
    st = tr.init()
    st, out = tr.step(st, jnp.asarray([0.5, 0.2]), 0.0)
    assert bool(out["track_active"][0])
    st, out = tr.step(st, jnp.asarray([0.52, 0.21]), 0.1)
    assert bool(out["track_confirmed"][0])
    # long silence -> coast drop
    st, out = tr.step(st, jnp.asarray([5.0, 5.0]), 2.0)
    assert int(st.dropped) == 1
    # the far measurement spawned a fresh track with uniform mode beliefs
    k = int(np.argmax(np.asarray(out["track_active"])))
    np.testing.assert_allclose(np.asarray(st.mu[k]), [0.5, 0.5])


def test_imm_with_measurement_covariance():
    cfg = tracking.TrackerConfig(imm_q=(0.1, 5.0))
    tr = tracking.Tracker(cfg)
    st = tr.init()
    cov = jnp.asarray([[0.01, 0.0], [0.0, 0.04]])
    st, out = tr.step(st, jnp.asarray([0.1, 0.1]), 0.0, z_cov=cov)
    st, out = tr.step(st, jnp.asarray([0.12, 0.1]), 0.1, z_cov=cov)
    assert bool(out["track_confirmed"][0])
    assert np.isfinite(np.asarray(out["track_xy"])).all()


def test_imm_guards():
    tr = tracking.Tracker(tracking.TrackerConfig(imm_q=(0.1, 5.0)))
    with pytest.raises(ValueError, match="step_multi"):
        tr.step_multi(tr.init(), jnp.zeros((2, 2)), 0.0)
    with pytest.raises(ValueError, match="z_vel"):
        tr.step(tr.init(), jnp.zeros(2), 0.0, z_vel=jnp.ones(2))
    with pytest.raises(ValueError, match="imm_q"):
        tracking.init_state_imm(tracking.TrackerConfig())
