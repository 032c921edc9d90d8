"""Position-space multi-target tracking over per-event localizations.

The reference's only temporal smoothing is the correlogram EMA
(``src/components/correlations.c:38-49``) — a 0th-order filter in lag space.
This layer generalizes it to state space: a bank of constant-velocity Kalman
filters over the per-event ``xy`` estimates, with track lifecycle
(spawn -> tentative -> confirmed -> dropped), written TPU-first:

- the whole tracker state is a fixed-size pytree of arrays (``max_tracks``
  slots), every update is masked and branchless, so ``step`` jits once and
  ``jax.vmap`` serves thousands of independent streams in one program
  (exactly like ``models.streaming.step_many``);
- per-track predict uses each track's own elapsed time, so irregular
  event-driven updates (events arrive when sounds happen, not on a clock)
  are handled exactly.

Typical wiring: ``out = stream_step(...)`` -> ``tracker.step(tstate,
out["xy"], t, out["event"])``.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Constant-velocity Kalman tracker bank configuration."""

    max_tracks: int = 4
    # position dimension: 2 (xy, the default) or 3 (xyz — pair with the
    # volumetric localizer's 3-D positions).  State per track is
    # [pos(dim), vel(dim)]; measurements are [dim].
    dim: int = 2
    # continuous white-noise acceleration spectral density [(m/s^2)^2 * s]
    process_noise: float = 1.0
    # measurement noise std [m] on each position component
    measurement_noise: float = 0.03
    # association gate: Mahalanobis distance^2 (2 dof; 9.21 = 99%.
    # For dim=3 the 99% point is 11.34 — set it explicitly)
    gate_maha2: float = 9.21
    # initial velocity std [m/s] for a freshly spawned track
    init_vel_std: float = 1.0
    # velocity-measurement noise std [m/s] on each component, used when a
    # step provides ``z_vel`` (e.g. Localizer.localize_moving's
    # delay-Doppler velocity); per-measurement ``v_cov`` overrides it
    velocity_noise: float = 0.5
    # hits to confirm a track
    confirm_hits: int = 2
    # drop a track not updated for this long [s]
    max_coast_s: float = 2.0
    # 'nearest': hard nearest-neighbor gated assignment (default).
    # 'soft': PDA/JPDA-style probabilistic association — every gated track
    # is Kalman-updated with its posterior association weight, which keeps
    # crossing sources from stealing each other's tracks.
    association: str = "nearest"
    # soft association only: detection probability and clutter density
    # [false events / m^2 / event]; their ratio sets how readily a
    # measurement is explained as clutter vs an existing track
    detect_prob: float = 0.9
    clutter_density: float = 0.5
    # soft association only: spawn a new track when the no-association
    # posterior beta_0 exceeds this
    spawn_b0: float = 0.5
    # step_multi association weights:
    # 'cheap': Fitzgerald's normalization (O(N K), the default);
    # 'exact': true JPDA — enumerate every joint association event
    # (injective measurement->track mappings + clutter), weight each by
    # prod Pd L[n,k] * lambda^{#clutter}, and marginalize.  Exact mutual
    # exclusivity; cost grows combinatorially but the event table is a
    # static constant and the marginalization is one einsum, so it jits
    # and vmaps like everything else (fine for N, K <= ~6).
    joint_association: str = "cheap"
    # IMM (interacting multiple model): a tuple of process-noise densities
    # makes each track a bank of mode-matched CV filters — e.g.
    # (0.05, 8.0) = "cruising" vs "maneuvering" — mixed every step by a
    # Markov mode chain and re-weighted by each mode's measurement
    # likelihood.  One process_noise can't track both regimes: small q
    # lags hard turns, large q jitters on straight legs; the IMM switches
    # in a few events.  None (default) = the plain single-model tracker.
    # Supported on the single-measurement step path (hard + soft
    # association, z_cov); not with step_multi / z_vel / rts_smooth.
    imm_q: tuple | None = None
    # self-transition probability of the mode chain (off-diagonal mass is
    # split uniformly across the other modes)
    imm_stay: float = 0.95


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrackState:
    """Tracker bank state (a pytree; leading axis = track slot)."""

    x: jnp.ndarray        # [K, 2*dim] state: pos(dim), vel(dim)
    p: jnp.ndarray        # [K, 2*dim, 2*dim] covariance
    active: jnp.ndarray   # [K] bool
    hits: jnp.ndarray     # [K] int32
    last_t: jnp.ndarray   # [K] float32 time of last ASSIGNMENT (coasting)
    # time the stored (x, p) refer to: every step predicts active tracks
    # to its t and stores them, so the next prediction starts here — NOT
    # at last_t, which would double-advance unassigned tracks (a per-chunk
    # caller like TrackedStreamingLocalizer would compound that quadratically)
    state_t: jnp.ndarray  # [K] float32
    born_t: jnp.ndarray   # [K] float32 spawn time
    track_id: jnp.ndarray  # [K] int32 (monotonic; 0 = never used)
    next_id: jnp.ndarray  # scalar int32
    dropped: jnp.ndarray  # scalar int32 cumulative dropped tracks
    unassigned: jnp.ndarray  # scalar int32 measurements with no free slot


def init_state(cfg: TrackerConfig) -> TrackState:
    k = cfg.max_tracks
    sd = 2 * cfg.dim
    return TrackState(
        x=jnp.zeros((k, sd), jnp.float32),
        p=jnp.zeros((k, sd, sd), jnp.float32),
        active=jnp.zeros((k,), bool),
        hits=jnp.zeros((k,), jnp.int32),
        last_t=jnp.zeros((k,), jnp.float32),
        state_t=jnp.zeros((k,), jnp.float32),
        born_t=jnp.zeros((k,), jnp.float32),
        track_id=jnp.zeros((k,), jnp.int32),
        next_id=jnp.ones((), jnp.int32),
        dropped=jnp.zeros((), jnp.int32),
        unassigned=jnp.zeros((), jnp.int32),
    )


@functools.lru_cache(maxsize=32)
def _joint_event_tables(n: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Enumerate every joint association event for N measurements x K tracks.

    An event assigns each measurement to one track or to clutter, with each
    track taking at most one measurement (the mutual-exclusivity constraint
    the cheap normalization only approximates).  Returns

    - onehot [E, N, K] float32: onehot[e, n, k] = 1 iff event e assigns
      measurement n to track k;
    - n_clutter [E] float32: number of clutter-assigned measurements.

    E = sum_m C(N, m) * P(K, m); for the default N = K = 4 bank that's 209
    events — a static constant folded into the jitted program.
    """
    import itertools
    import math

    # Guard BEFORE enumeration: E = sum_m C(N,m)·P(K,m) in closed form, so
    # an oversize (n, k) raises immediately.  Construction below is O(E)
    # (subsets x permutations), NOT O((k+1)^n) tuple filtering — e.g.
    # N=12, K=3 has only 1,753 events and must not grind 4^12 tuples.
    e = sum(math.comb(n, m) * math.perm(k, m) for m in range(min(n, k) + 1))
    if e > 200_000:
        raise ValueError(
            f"exact JPDA event table has {e} events for N={n}, K={k}; "
            "use joint_association='cheap' at this scale")
    onehot = np.zeros((e, n, k), np.float32)
    n_clutter = np.zeros((e,), np.float32)
    ei = 0
    for m in range(min(n, k) + 1):
        for subset in itertools.combinations(range(n), m):
            for perm in itertools.permutations(range(k), m):
                for ni, ki in zip(subset, perm):
                    onehot[ei, ni, ki] = 1.0
                n_clutter[ei] = n - m
                ei += 1
    assert ei == e, (ei, e)
    return onehot, n_clutter


def _inv_det(s):
    """Batched closed-form inverse + determinant of tiny SPD innovation
    covariances (2x2 / 3x3 adjugate — no per-track LU custom calls)."""
    d = s.shape[-1]
    if d == 2:
        det = s[..., 0, 0] * s[..., 1, 1] - s[..., 0, 1] * s[..., 1, 0]
        det = jnp.maximum(det, 1e-12)
        inv = jnp.stack([
            jnp.stack([s[..., 1, 1], -s[..., 0, 1]], -1),
            jnp.stack([-s[..., 1, 0], s[..., 0, 0]], -1),
        ], -2) / det[..., None, None]
        return inv, det
    if d == 3:
        a, b, c = s[..., 0, 0], s[..., 0, 1], s[..., 0, 2]
        dd, e, f = s[..., 1, 0], s[..., 1, 1], s[..., 1, 2]
        g, h, i = s[..., 2, 0], s[..., 2, 1], s[..., 2, 2]
        co00 = e * i - f * h
        co01 = f * g - dd * i
        co02 = dd * h - e * g
        det = jnp.maximum(a * co00 + b * co01 + c * co02, 1e-15)
        adj = jnp.stack([
            jnp.stack([co00, c * h - b * i, b * f - c * e], -1),
            jnp.stack([co01, a * i - c * g, c * dd - a * f], -1),
            jnp.stack([co02, b * g - a * h, a * e - b * dd], -1),
        ], -2)
        return adj / det[..., None, None], det
    det = jnp.maximum(jnp.linalg.det(s), 1e-15)
    return jnp.linalg.inv(s), det


def _predict(x, p, dt, q, dim):
    """CV-model predict for one track: x [2*dim], p [2*dim, 2*dim]."""
    f = jnp.eye(2 * dim, dtype=x.dtype)
    f = f.at[jnp.arange(dim), dim + jnp.arange(dim)].set(dt)
    # white-noise-acceleration Q per axis
    d3 = dt * dt * dt / 3.0
    d2 = dt * dt / 2.0
    eye = jnp.eye(dim, dtype=x.dtype)
    qm = jnp.concatenate([
        jnp.concatenate([d3 * eye, d2 * eye], axis=1),
        jnp.concatenate([d2 * eye, dt * eye], axis=1)], axis=0)
    xn = f @ x
    pn = f @ p @ f.T + q * qm
    return xn, pn


def _predict_all(state: TrackState, t, cfg: TrackerConfig, r=None):
    """Coast-drop + predict every active track to time t; returns the
    predicted states and the innovation covariance S = HPH' + R [K, d, d]
    with its inverse/determinant, shared by the association variants.

    ``r`` [d, d] measurement-noise covariance; defaults to the isotropic
    cfg.measurement_noise**2 I."""
    dim = cfg.dim
    if r is None:
        r = cfg.measurement_noise ** 2 * jnp.eye(dim, dtype=jnp.float32)
    stale = state.active & ((t - state.last_t) > cfg.max_coast_s)
    active = state.active & ~stale
    dropped = state.dropped + jnp.sum(stale.astype(jnp.int32))

    # predict from the time the STORED state refers to (see TrackState.
    # state_t); last_t is the assignment clock and would double-predict
    dt = jnp.maximum(t - state.state_t, 0.0) * active  # [K]
    xp, pp = jax.vmap(
        functools.partial(_predict, q=cfg.process_noise, dim=dim)
    )(state.x, state.p, dt)
    s = pp[:, :dim, :dim] + r
    sinv, det = _inv_det(s)
    return active, dropped, xp, pp, s, sinv, det


def _spawn_cov(cfg: TrackerConfig, r=None, rv=None) -> jnp.ndarray:
    dim = cfg.dim
    if r is None:
        r = cfg.measurement_noise ** 2 * jnp.eye(dim, dtype=jnp.float32)
    if rv is None:
        rv = cfg.init_vel_std ** 2 * jnp.eye(dim, dtype=jnp.float32)
    z = jnp.zeros((dim, dim), jnp.float32)
    return jnp.concatenate([
        jnp.concatenate([r.astype(jnp.float32), z], axis=1),
        jnp.concatenate([z, rv.astype(jnp.float32)], axis=1),
    ], axis=0)


def _gain(pp, sinv, dim):
    """Kalman gain K = P H^T S^-1 (H = position selector), batched [K]."""
    pht = pp[:, :, :dim]  # [K, 2d, d]
    return jnp.einsum("kij,kjl->kil", pht, sinv)  # [K, 2d, d]


def step(
    state: TrackState,
    z: jnp.ndarray,        # [2] measured xy (meters)
    t: jnp.ndarray,        # scalar time (seconds)
    valid: jnp.ndarray,    # scalar bool: is this a real measurement?
    cfg: TrackerConfig,
    z_cov: jnp.ndarray | None = None,  # [2, 2] per-measurement noise
    z_vel: jnp.ndarray | None = None,  # [dim] measured velocity (m/s)
    v_cov: jnp.ndarray | None = None,  # [dim, dim] velocity-meas. noise
) -> tuple[TrackState, dict]:
    """One event-driven tracker update (pure; jit/vmap-able).

    ``z_cov`` (optional) is THIS measurement's noise covariance — e.g. the
    localizer's ``xy_cov`` output (sigma^2 (J^T J)^-1 at the GN solution) —
    replacing the global isotropic cfg.measurement_noise: events with weak
    geometry then pull their track less and gate wider, exactly as their
    actual uncertainty dictates.

    ``z_vel`` (optional) is a direct VELOCITY measurement (e.g.
    ``Localizer.localize_moving``'s delay-Doppler velocity), applied as a
    sequential Kalman update (H = velocity selector) after the position
    update — exact for block-diagonal measurement noise.  A spawned track
    initializes its velocity from ``z_vel`` instead of zero, so confirmed
    tracks carry a usable velocity from the FIRST event rather than after
    two.  ``v_cov`` overrides cfg.velocity_noise for this measurement.

    Returns (new_state, outputs) with outputs:
    - 'track_xy' [K, 2] predicted-at-t positions
    - 'track_vel' [K, 2] velocities
    - 'track_active'/'track_confirmed' [K] bool
    - 'track_id' [K] int32
    - 'assigned' scalar int32: slot updated by this measurement (-1 none)
    """
    k = cfg.max_tracks
    dim = cfg.dim
    z = z.astype(jnp.float32)
    t = jnp.asarray(t, jnp.float32)

    r = None if z_cov is None else z_cov.astype(jnp.float32)
    active, dropped, xp, pp, s_cov, sinv, det = _predict_all(
        state, t, cfg, r)

    # ---- associate: Mahalanobis distance to each predicted position -----
    innov = z[None, :] - xp[:, :dim]  # [K, d]
    maha2 = jnp.einsum("ki,kij,kj->k", innov, sinv, innov)
    maha2 = jnp.where(active, maha2, jnp.inf)
    best = jnp.argmin(maha2)
    gated = active & (maha2 <= cfg.gate_maha2)  # [K]

    # ---- association weights b [K] and no-association weight b0 ----------
    if cfg.association == "soft":
        # PDA/JPDA-style posterior over {track 1..K, clutter} for this
        # measurement: b_k ~ Pd N(innov_k; 0, S_k), b0 ~ clutter density.
        like = jnp.where(
            gated,
            jnp.exp(-0.5 * jnp.minimum(maha2, 80.0))
            / ((2.0 * jnp.pi) ** (dim / 2.0) * jnp.sqrt(det)),
            0.0)  # [K]
        denom = cfg.clutter_density + cfg.detect_prob * jnp.sum(like)
        b = valid * cfg.detect_prob * like / denom  # [K]
        b0 = jnp.where(valid, cfg.clutter_density / denom, 1.0)
        slot_sel = b > 0.5  # "assigned" semantics for hits / coast timer
        spawn = valid & (b0 > cfg.spawn_b0)
    else:
        # hard nearest-neighbor: b is the one-hot winner (b in {0, 1}
        # makes the weighted update below reduce to the plain KF update)
        can_assoc = valid & gated[best]
        slot_sel = (jnp.arange(k) == best) & can_assoc
        b = slot_sel.astype(jnp.float32)
        spawn = valid & ~can_assoc

    # ---- weighted Kalman update (every gated track, weight b_k) ----------
    gain = _gain(pp, sinv, dim)  # [K, 2d, d]
    ky = jnp.einsum("kij,kj->ki", gain, innov)    # [K, 2d] K @ innovation
    x_new = xp + b[:, None] * ky
    ksk = jnp.einsum("kij,kjl->kil", gain, pp[:, :dim, :])  # K S K^T
    # PDA covariance: P- - b KSK' + b(1-b) (Ky)(Ky)' (the spread-of-means
    # term; zero in hard mode where b is 0/1)
    spread = (b * (1.0 - b))[:, None, None] * (
        ky[:, :, None] * ky[:, None, :])
    p_new = pp - b[:, None, None] * ksk + spread

    rv = None
    if z_vel is not None:
        # sequential velocity-measurement update on the position-updated
        # state (exact for block-diagonal R); same association weights b
        zv = z_vel.astype(jnp.float32)
        rv = (cfg.velocity_noise ** 2 * jnp.eye(dim, dtype=jnp.float32)
              if v_cov is None else v_cov.astype(jnp.float32))
        sv = p_new[:, dim:, dim:] + rv
        svinv, _ = _inv_det(sv)
        kv = jnp.einsum("kij,kjl->kil", p_new[:, :, dim:], svinv)
        iv = zv[None, :] - x_new[:, dim:]
        kyv = jnp.einsum("kij,kj->ki", kv, iv)
        x_new = x_new + b[:, None] * kyv
        kskv = jnp.einsum("kij,kjl->kil", kv, p_new[:, dim:, :])
        spreadv = (b * (1.0 - b))[:, None, None] * (
            kyv[:, :, None] * kyv[:, None, :])
        p_new = p_new - b[:, None, None] * kskv + spreadv

    hits = state.hits + slot_sel.astype(jnp.int32)
    last_t = jnp.where(slot_sel, t, state.last_t)

    # ---- spawn: an unexplained measurement takes a free slot -------------
    free = ~active
    spawn_slot = jnp.argmax(free)  # first free slot
    have_free = jnp.any(free)
    do_spawn = spawn & have_free
    sm = (jnp.arange(k) == spawn_slot) & do_spawn
    x0 = jnp.concatenate(
        [z, z_vel.astype(jnp.float32) if z_vel is not None
         else jnp.zeros((dim,), jnp.float32)])
    p0 = _spawn_cov(cfg, r, rv)
    x_new = jnp.where(sm[:, None], x0[None, :], x_new)
    p_new = jnp.where(sm[:, None, None], p0[None], p_new)
    active = active | sm
    hits = jnp.where(sm, 1, hits)
    last_t = jnp.where(sm, t, last_t)
    born_t = jnp.where(sm, t, state.born_t)
    track_id = jnp.where(sm, state.next_id, state.track_id)
    next_id = state.next_id + do_spawn.astype(jnp.int32)
    unassigned = state.unassigned + (
        spawn & ~have_free).astype(jnp.int32)

    # keep inactive slots' stored time (prevents huge dt on reuse)
    new_state = TrackState(
        x=x_new, p=p_new, active=active, hits=hits, last_t=last_t,
        state_t=jnp.where(active, t, state.state_t),
        born_t=born_t, track_id=track_id, next_id=next_id, dropped=dropped,
        unassigned=unassigned)
    out = {
        "track_xy": x_new[:, :dim],
        "track_vel": x_new[:, dim:],
        "track_active": active,
        "track_confirmed": active & (hits >= cfg.confirm_hits),
        "track_id": track_id,
        # soft mode: the dominant-weight slot (b > 0.5), if any
        "assigned": jnp.where(jnp.any(slot_sel),
                              jnp.argmax(slot_sel), -1).astype(jnp.int32),
    }
    return new_state, out


# ----------------------------------------------------------------------
# IMM (interacting multiple model) bank
# ----------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ImmTrackState:
    """IMM tracker bank state: per-track per-mode filters + mode beliefs.

    Bookkeeping fields mirror :class:`TrackState`; the filter arrays gain
    a mode axis R = len(cfg.imm_q)."""

    xm: jnp.ndarray       # [K, R, 2*dim] per-mode state
    pm: jnp.ndarray       # [K, R, 2*dim, 2*dim] per-mode covariance
    mu: jnp.ndarray       # [K, R] mode probabilities
    active: jnp.ndarray   # [K] bool
    hits: jnp.ndarray     # [K] int32
    last_t: jnp.ndarray   # [K] float32 last-ASSIGNMENT time (coasting)
    state_t: jnp.ndarray  # [K] float32 time the stored filters refer to
    born_t: jnp.ndarray   # [K] float32
    track_id: jnp.ndarray  # [K] int32
    next_id: jnp.ndarray  # scalar int32
    dropped: jnp.ndarray  # scalar int32
    unassigned: jnp.ndarray  # scalar int32


def init_state_imm(cfg: TrackerConfig) -> ImmTrackState:
    if not cfg.imm_q:
        raise ValueError("init_state_imm needs cfg.imm_q (a tuple of "
                         "per-mode process-noise densities)")
    k, r, sd = cfg.max_tracks, len(cfg.imm_q), 2 * cfg.dim
    return ImmTrackState(
        xm=jnp.zeros((k, r, sd), jnp.float32),
        pm=jnp.zeros((k, r, sd, sd), jnp.float32),
        mu=jnp.full((k, r), 1.0 / r, jnp.float32),
        active=jnp.zeros((k,), bool),
        hits=jnp.zeros((k,), jnp.int32),
        last_t=jnp.zeros((k,), jnp.float32),
        state_t=jnp.zeros((k,), jnp.float32),
        born_t=jnp.zeros((k,), jnp.float32),
        track_id=jnp.zeros((k,), jnp.int32),
        next_id=jnp.ones((), jnp.int32),
        dropped=jnp.zeros((), jnp.int32),
        unassigned=jnp.zeros((), jnp.int32),
    )


def _imm_transition(cfg: TrackerConfig) -> np.ndarray:
    """Markov mode-transition matrix pi[i, j] = P(mode i -> mode j)."""
    r = len(cfg.imm_q)
    if r == 1:
        return np.ones((1, 1), np.float32)
    off = (1.0 - cfg.imm_stay) / (r - 1)
    pi = np.full((r, r), off, np.float32)
    np.fill_diagonal(pi, cfg.imm_stay)
    return pi


def step_imm(
    state: ImmTrackState,
    z: jnp.ndarray,        # [dim] measured position (meters)
    t: jnp.ndarray,        # scalar time (seconds)
    valid: jnp.ndarray,    # scalar bool
    cfg: TrackerConfig,
    z_cov: jnp.ndarray | None = None,  # [dim, dim] per-measurement noise
) -> tuple[ImmTrackState, dict]:
    """One event-driven IMM tracker update (Blom & Bar-Shalom 1988).

    Per active track: (1) mix the mode-conditioned estimates under the
    transition prior, (2) predict each mode with ITS process noise,
    (3) gate/associate on the moment-matched mixture (hard NN or soft
    PDA, exactly :func:`step`'s rules), (4) weighted Kalman update per
    mode, (5) reweight modes by their measurement likelihoods.  All mode
    math is einsum-batched over [K, R] — no per-mode Python branching.

    Outputs as :func:`step` plus ``model_prob`` [K, R] (posterior mode
    beliefs; watch the maneuver mode light up during turns)."""
    k, dim = cfg.max_tracks, cfg.dim
    qvec = jnp.asarray(cfg.imm_q, jnp.float32)      # [R]
    pi = jnp.asarray(_imm_transition(cfg))          # [R, R]
    z = z.astype(jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    r_meas = (cfg.measurement_noise ** 2 * jnp.eye(dim, dtype=jnp.float32)
              if z_cov is None else z_cov.astype(jnp.float32))

    stale = state.active & ((t - state.last_t) > cfg.max_coast_s)
    active = state.active & ~stale
    dropped = state.dropped + jnp.sum(stale.astype(jnp.int32))

    # ---- 1) interaction / mixing ----------------------------------------
    cbar = jnp.einsum("ki,ij->kj", state.mu, pi)        # [K, R] prior modes
    cbar_s = jnp.maximum(cbar, 1e-12)
    mucond = (state.mu[:, :, None] * pi[None]) / cbar_s[:, None, :]
    x0 = jnp.einsum("kij,kid->kjd", mucond, state.xm)   # [K, R, 2d]
    dx = state.xm[:, :, None, :] - x0[:, None, :, :]    # [K, i, j, 2d]
    p0 = (jnp.einsum("kij,kide->kjde", mucond, state.pm)
          + jnp.einsum("kij,kijd,kije->kjde", mucond, dx, dx))

    # ---- 2) per-mode predict (each mode its own q) -----------------------
    # from state_t, the stored filters' time (see TrackState.state_t)
    dt = jnp.maximum(t - state.state_t, 0.0) * active    # [K]

    def _predict_track(xk, pk, dtk):
        return jax.vmap(
            lambda xr, pr, qr: _predict(xr, pr, dtk, qr, dim)
        )(xk, pk, qvec)

    xp, pp = jax.vmap(_predict_track)(x0, p0, dt)       # [K, R, ...]
    s_m = pp[:, :, :dim, :dim] + r_meas                 # [K, R, d, d]
    sinv_m, det_m = _inv_det(s_m)

    # ---- 3) association on the moment-matched mixture --------------------
    xbar = jnp.einsum("kj,kjd->kd", cbar, xp)           # [K, 2d]
    dpos = xp[:, :, :dim] - xbar[:, None, :dim]         # [K, R, d]
    pbar_pos = (jnp.einsum("kj,kjde->kde", cbar, pp[:, :, :dim, :dim])
                + jnp.einsum("kj,kjd,kje->kde", cbar, dpos, dpos))
    s_bar = pbar_pos + r_meas
    sinv_bar, det_bar = _inv_det(s_bar)
    innov_bar = z[None, :] - xbar[:, :dim]              # [K, d]
    maha2 = jnp.einsum("ki,kij,kj->k", innov_bar, sinv_bar, innov_bar)
    maha2 = jnp.where(active, maha2, jnp.inf)
    best = jnp.argmin(maha2)
    gated = active & (maha2 <= cfg.gate_maha2)

    if cfg.association == "soft":
        like = jnp.where(
            gated,
            jnp.exp(-0.5 * jnp.minimum(maha2, 80.0))
            / ((2.0 * jnp.pi) ** (dim / 2.0) * jnp.sqrt(det_bar)),
            0.0)
        denom = cfg.clutter_density + cfg.detect_prob * jnp.sum(like)
        b = valid * cfg.detect_prob * like / denom
        b0 = jnp.where(valid, cfg.clutter_density / denom, 1.0)
        slot_sel = b > 0.5
        spawn = valid & (b0 > cfg.spawn_b0)
    else:
        can_assoc = valid & gated[best]
        slot_sel = (jnp.arange(k) == best) & can_assoc
        b = slot_sel.astype(jnp.float32)
        spawn = valid & ~can_assoc

    # ---- 4) weighted Kalman update per mode ------------------------------
    innov_m = z[None, None, :] - xp[:, :, :dim]         # [K, R, d]
    gain = jnp.einsum("krij,krjl->kril", pp[:, :, :, :dim], sinv_m)
    ky = jnp.einsum("krij,krj->kri", gain, innov_m)     # [K, R, 2d]
    bw = b[:, None]                                     # [K, 1]
    x_new = xp + bw[..., None] * ky
    ksk = jnp.einsum("krij,krjl->kril", gain, pp[:, :, :dim, :])
    spread = (bw * (1.0 - bw))[..., None, None] * (
        ky[..., :, None] * ky[..., None, :])
    p_new = pp - bw[..., None, None] * ksk + spread

    # ---- 5) mode-probability update --------------------------------------
    m2_m = jnp.einsum("kri,krij,krj->kr", innov_m, sinv_m, innov_m)
    lam = (jnp.exp(-0.5 * jnp.minimum(m2_m, 80.0))
           / ((2.0 * jnp.pi) ** (dim / 2.0) * jnp.sqrt(det_m)))  # [K, R]
    mu_meas = cbar * jnp.maximum(lam, 1e-30)
    mu_meas = mu_meas / jnp.maximum(
        jnp.sum(mu_meas, axis=-1, keepdims=True), 1e-30)
    # tracks that took the measurement reweight; others keep the prior mix
    mu_new = jnp.where(slot_sel[:, None], mu_meas, cbar)
    mu_new = mu_new / jnp.maximum(
        jnp.sum(mu_new, axis=-1, keepdims=True), 1e-30)

    hits = state.hits + slot_sel.astype(jnp.int32)
    last_t = jnp.where(slot_sel, t, state.last_t)

    # ---- spawn (all modes identical, uniform beliefs) ---------------------
    free = ~active
    spawn_slot = jnp.argmax(free)
    have_free = jnp.any(free)
    do_spawn = spawn & have_free
    sm = (jnp.arange(k) == spawn_slot) & do_spawn
    x0s = jnp.concatenate([z, jnp.zeros((dim,), jnp.float32)])
    p0s = _spawn_cov(cfg, r_meas if z_cov is not None else None)
    nmodes = qvec.shape[0]
    x_new = jnp.where(sm[:, None, None], x0s[None, None, :], x_new)
    p_new = jnp.where(sm[:, None, None, None], p0s[None, None], p_new)
    mu_new = jnp.where(sm[:, None], 1.0 / nmodes, mu_new)
    active = active | sm
    hits = jnp.where(sm, 1, hits)
    last_t = jnp.where(sm, t, last_t)
    born_t = jnp.where(sm, t, state.born_t)
    track_id = jnp.where(sm, state.next_id, state.track_id)
    next_id = state.next_id + do_spawn.astype(jnp.int32)
    unassigned = state.unassigned + (spawn & ~have_free).astype(jnp.int32)

    new_state = ImmTrackState(
        xm=x_new, pm=p_new, mu=mu_new, active=active, hits=hits,
        last_t=last_t, state_t=jnp.where(active, t, state.state_t),
        born_t=born_t, track_id=track_id, next_id=next_id,
        dropped=dropped, unassigned=unassigned)
    x_hat = jnp.einsum("kr,krd->kd", mu_new, x_new)     # moment-matched
    out = {
        "track_xy": x_hat[:, :dim],
        "track_vel": x_hat[:, dim:],
        "track_active": active,
        "track_confirmed": active & (hits >= cfg.confirm_hits),
        "track_id": track_id,
        "model_prob": mu_new,
        "assigned": jnp.where(jnp.any(slot_sel),
                              jnp.argmax(slot_sel), -1).astype(jnp.int32),
    }
    return new_state, out


def step_multi(
    state: TrackState,
    zs: jnp.ndarray,       # [N, 2] simultaneous measurements (meters)
    t: jnp.ndarray,        # scalar time (seconds)
    valids: jnp.ndarray,   # [N] bool
    cfg: TrackerConfig,
    z_covs: jnp.ndarray | None = None,  # [N, 2, 2] per-measurement noise
) -> tuple[TrackState, dict]:
    """Joint (JPDA) update with N simultaneous measurements — the regime a
    multi-event chunk produces (models.streaming max_events > 1), where the
    single-measurement :func:`step` would have to process events serially
    and could double-update one track.

    Association weights (``cfg.joint_association``):

    - ``'cheap'`` (default): Fitzgerald's normalization

          b[n,k] = L[n,k] / (sum_k' L[n,k'] + sum_n' L[n',k] - L[n,k] + B)

      with B = clutter_density / detect_prob — O(N K), reduces EXACTLY to
      the single-measurement PDA posterior of ``step(association='soft')``
      at N = 1.
    - ``'exact'``: full joint-hypothesis JPDA — every joint association
      event (injective measurement->track mapping, remainder clutter) is
      enumerated into a static table, weighted by
      prod_assigned L[n,k] * B^{#clutter}, and marginalized.  Mutual
      exclusivity is exact (a measurement claimed by one track cannot
      also fully claim another); also reduces to the PDA posterior at
      N = 1.  Cost is combinatorial but static (209 events at N = K = 4).

    Each track is updated once with its combined weighted innovation
    (standard JPDA update); unexplained measurements spawn into free
    slots.

    Outputs as :func:`step`, plus 'assigned' is [N] (dominant track per
    measurement, -1 if none with weight > 0.5).

    ``z_covs`` (optional, [N, 2, 2]) gives each measurement its own noise
    covariance (the localizer's ``xy_cov``): the innovation covariance,
    likelihoods, and Kalman gains become per-(measurement, track) — the
    heterogeneous-R JPDA — so low-quality events weigh in less.  With
    identical isotropic covs this reproduces the scalar path exactly
    (tested).
    """
    k = cfg.max_tracks
    dim = cfg.dim
    n = zs.shape[0]
    zs = zs.astype(jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    valids = valids.astype(bool)

    active, dropped, xp, pp, s_cov, sinv, det = _predict_all(state, t, cfg)
    if z_covs is not None:
        # heterogeneous R: innovation covariance per (measurement, track)
        z_covs = z_covs.astype(jnp.float32)
        s_cov = pp[None, :, :dim, :dim] + z_covs[:, None]  # [N, K, d, d]
        sinv, det = _inv_det(s_cov)

    # ---- likelihood matrix over (measurement, track) ---------------------
    # with z_covs, sinv/det are already [N, K, ...]; without, [K, ...]
    # broadcasting against the [N, K] innovations below
    innov = zs[:, None, :] - xp[None, :, :dim]  # [N, K, d]
    si = sinv if sinv.ndim == 4 else sinv[None]  # [N or 1, K, d, d]
    maha2 = (innov[..., None, :] @ si
             @ innov[..., :, None])[..., 0, 0]  # [N, K]
    gated = active[None, :] & (maha2 <= cfg.gate_maha2) & valids[:, None]
    like = jnp.where(
        gated,
        jnp.exp(-0.5 * jnp.minimum(maha2, 80.0))
        / ((2.0 * jnp.pi) ** (dim / 2.0) * jnp.sqrt(det)),
        0.0)  # [N, K]
    b_const = cfg.clutter_density / cfg.detect_prob
    if cfg.joint_association == "exact":
        # true JPDA: marginalize over every joint association event.
        # log-weight of event e = sum_{n assigned k} log L[n,k]
        #                         + (#clutter in e) * log(lambda / Pd);
        # gated-out (n, k) cells get a -1e30 log-likelihood so any event
        # using them vanishes under softmax (the all-clutter event always
        # has finite weight, so the softmax is well-defined).
        onehot_np, nclut_np = _joint_event_tables(n, k)
        onehot = jnp.asarray(onehot_np)
        nclut = jnp.asarray(nclut_np)
        loglike = jnp.where(
            like > 0.0, jnp.log(jnp.maximum(like, 1e-38)), -1e30)
        logw = (jnp.einsum("enk,nk->e", onehot, loglike)
                + nclut * jnp.log(b_const))
        p_e = jax.nn.softmax(logw)
        beta = jnp.einsum("e,enk->nk", p_e, onehot)  # [N, K]
    else:
        # Fitzgerald's cheap-JPDA normalization (exact at N = 1)
        denom = (jnp.sum(like, axis=1, keepdims=True)
                 + jnp.sum(like, axis=0, keepdims=True) - like + b_const)
        beta = like / denom  # [N, K]

    # ---- combined weighted Kalman update per track -----------------------
    w_k = jnp.sum(beta, axis=0)  # [K] total association probability
    if z_covs is None:
        ybar = jnp.einsum("nk,nki->ki", beta, innov)  # [K, d]
        gain = _gain(pp, sinv, dim)  # [K, 2d, d]
        x_new = xp + jnp.einsum("kij,kj->ki", gain, ybar)
        ksk = jnp.einsum("kij,kjl->kil", gain, pp[:, :dim, :])  # K S K^T
        # spread-of-innovations term: K (sum_n b y y' - ybar ybar') K'
        yy = (jnp.einsum("nk,nki,nkj->kij", beta, innov, innov)
              - ybar[:, :, None] * ybar[:, None, :])  # [K, d, d]
        p_new = (pp - w_k[:, None, None] * ksk
                 + jnp.einsum("kij,kjl,kml->kim", gain, yy, gain))
    else:
        # per-(n, k) gains: K_nk = P_k H^T S_nk^-1 ([N, K, 2d, d])
        pht = pp[None, :, :, :dim]  # [1, K, 2d, d]
        gain_nk = jnp.einsum("nkij,nkjl->nkil",
                             jnp.broadcast_to(
                                 pht, (zs.shape[0],) + pht.shape[1:]),
                             sinv)  # [N, K, 2d, d]
        ky = jnp.einsum("nkij,nkj->nki", gain_nk, innov)  # [N, K, 2d]
        kybar = jnp.einsum("nk,nki->ki", beta, ky)        # [K, 2d]
        x_new = xp + kybar
        # P = P- - sum_n b K S K' + (sum_n b Ky Ky' - kybar kybar');
        # K S K' = K (H P) since K = P H' S^-1
        hp = pp[None, :, :dim, :]  # [1, K, d, 2d]
        ksk = jnp.einsum("nkij,nkjl->nkil", gain_nk,
                         jnp.broadcast_to(
                             hp, (zs.shape[0],) + hp.shape[1:]))
        p_new = (pp - jnp.einsum("nk,nkil->kil", beta, ksk)
                 + jnp.einsum("nk,nki,nkl->kil", beta, ky, ky)
                 - kybar[:, :, None] * kybar[:, None, :])

    updated = w_k > 0.5
    hits = state.hits + updated.astype(jnp.int32)
    last_t = jnp.where(updated, t, state.last_t)

    # ---- spawn: unexplained measurements take free slots (in order) ------
    leftover = 1.0 - jnp.sum(beta, axis=1)  # [N] no-association posterior
    spawn_n = valids & (leftover > cfg.spawn_b0)
    free = ~active
    hits_new = hits
    born_t = state.born_t
    track_id = state.track_id
    next_id = state.next_id
    unassigned = state.unassigned
    p0 = _spawn_cov(cfg)
    for i in range(n):  # static unroll over the (small) measurement count
        spawn_slot = jnp.argmax(free)
        have_free = jnp.any(free)
        do_spawn = spawn_n[i] & have_free
        sm = (jnp.arange(k) == spawn_slot) & do_spawn
        x0 = jnp.concatenate([zs[i], jnp.zeros((dim,), jnp.float32)])
        x_new = jnp.where(sm[:, None], x0[None, :], x_new)
        p_new = jnp.where(sm[:, None, None], p0[None], p_new)
        free = free & ~sm
        hits_new = jnp.where(sm, 1, hits_new)
        last_t = jnp.where(sm, t, last_t)
        born_t = jnp.where(sm, t, born_t)
        track_id = jnp.where(sm, next_id, track_id)
        next_id = next_id + do_spawn.astype(jnp.int32)
        unassigned = unassigned + (
            spawn_n[i] & ~have_free).astype(jnp.int32)
    active = active | (~free & ~active)  # slots consumed by spawns

    new_state = TrackState(
        x=x_new, p=p_new, active=active, hits=hits_new, last_t=last_t,
        state_t=jnp.where(active, t, state.state_t),
        born_t=born_t, track_id=track_id, next_id=next_id, dropped=dropped,
        unassigned=unassigned)
    dominant = (jnp.max(beta, axis=1) > 0.5)  # [N]
    out = {
        "track_xy": x_new[:, :dim],
        "track_vel": x_new[:, dim:],
        "track_active": active,
        "track_confirmed": active & (hits_new >= cfg.confirm_hits),
        "track_id": track_id,
        "beta": beta,
        "assigned": jnp.where(dominant, jnp.argmax(beta, axis=1),
                              -1).astype(jnp.int32),
    }
    return new_state, out


# ----------------------------------------------------------------------
# Offline trajectory smoothing (Rauch-Tung-Striebel)
# ----------------------------------------------------------------------

def rts_smooth(
    x: jnp.ndarray,
    p: jnp.ndarray,
    t: jnp.ndarray,
    cfg: TrackerConfig = TrackerConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """RTS smoother over ONE track's recorded filter history.

    New capability beyond the reference (which has no tracking at all;
    its only temporal state is the correlogram EMA,
    src/components/correlations.c:38-63): the online tracker bank is
    causal, so early positions carry full filter uncertainty.  For
    offline/forensic use — replaying a recorded session, calibrating
    against a surveyed trajectory — the backward Rauch-Tung-Striebel
    pass conditions every estimate on the WHOLE event sequence, with
    the same constant-velocity transition and white-noise-acceleration
    Q the forward filter used (``_predict``).

    Inputs are the filtered posteriors of one track at its event times:
    ``x`` [T, 2*dim], ``p`` [T, 2*dim, 2*dim], ``t`` [T] (strictly
    increasing).  Record them after each ``Tracker.step`` from
    ``state.x[k] / state.p[k]`` at the track's slot ``k`` (slots are
    stable while a track lives; match by ``state.track_id``).

    Returns smoothed (xs [T, 2*dim], ps [T, 2*dim, 2*dim]); the last
    entry equals the filtered one (the smoother's anchor).  Gaps in
    ``t`` are handled exactly like the filter handles them (Q grows
    with dt).  Whole pass is one reverse ``lax.scan`` — jit/vmap-safe.
    """
    dim = x.shape[-1] // 2
    q = cfg.process_noise
    prec = jax.lax.Precision.HIGHEST  # tiny matrices; accuracy is free

    def back(carry, inp):
        xs_n, ps_n = carry
        xk, pk, dt = inp
        f = jnp.eye(2 * dim, dtype=xk.dtype)
        f = f.at[jnp.arange(dim), dim + jnp.arange(dim)].set(dt)
        xp, pp = _predict(xk, pk, dt, q, dim)
        # C = P_k F' Pp^{-1}; all three symmetric/PSD so one solve does it
        c = jnp.linalg.solve(
            pp, jnp.matmul(f, pk, precision=prec)).T
        xs_k = xk + jnp.matmul(c, xs_n - xp, precision=prec)
        ps_k = pk + jnp.matmul(
            jnp.matmul(c, ps_n - pp, precision=prec), c.T, precision=prec)
        ps_k = 0.5 * (ps_k + ps_k.T)  # keep symmetric under f32 roundoff
        return (xs_k, ps_k), (xs_k, ps_k)

    dts = t[1:] - t[:-1]  # dt[k] advances k -> k+1
    (_, _), (xs_rev, ps_rev) = jax.lax.scan(
        back, (x[-1], p[-1]),
        (x[:-1][::-1], p[:-1][::-1], dts[::-1]))
    xs = jnp.concatenate([xs_rev[::-1], x[-1:]], axis=0)
    ps = jnp.concatenate([ps_rev[::-1], p[-1:]], axis=0)
    return xs, ps


@dataclasses.dataclass(frozen=True)
class Tracker:
    """Convenience wrapper: jitted single- and multi-stream stepping."""

    cfg: TrackerConfig = TrackerConfig()

    def init(self) -> TrackState:
        if self.cfg.imm_q:
            return init_state_imm(self.cfg)
        return init_state(self.cfg)

    def init_many(self, n_streams: int) -> TrackState:
        one = self.init()
        return jax.tree.map(
            lambda v: jnp.broadcast_to(v, (n_streams,) + v.shape).copy(), one)

    @functools.cached_property
    def _step(self):
        fn = step_imm if self.cfg.imm_q else step
        return jax.jit(functools.partial(fn, cfg=self.cfg),
                       donate_argnums=(0,))

    @functools.cached_property
    def _step_cov(self):
        fn = step_imm if self.cfg.imm_q else step
        return jax.jit(
            lambda state, z, t, valid, z_cov: fn(
                state, z, t, valid, self.cfg, z_cov=z_cov),
            donate_argnums=(0,))

    @functools.cached_property
    def _step_many(self):
        fn = step_imm if self.cfg.imm_q else step
        return jax.jit(jax.vmap(functools.partial(fn, cfg=self.cfg)),
                       donate_argnums=(0,))

    @functools.cached_property
    def _step_many_cov(self):
        fn = step_imm if self.cfg.imm_q else step
        return jax.jit(
            jax.vmap(lambda state, z, t, valid, z_cov: fn(
                state, z, t, valid, self.cfg, z_cov=z_cov)),
            donate_argnums=(0,))

    @functools.cached_property
    def _step_multi(self):
        return jax.jit(functools.partial(step_multi, cfg=self.cfg),
                       donate_argnums=(0,))

    @functools.cached_property
    def _step_multi_cov(self):
        return jax.jit(
            lambda state, zs, t, valids, z_covs: step_multi(
                state, zs, t, valids, self.cfg, z_covs=z_covs),
            donate_argnums=(0,))

    @functools.cached_property
    def _step_any(self):
        # one jitted entry with optional (None = absent, an empty pytree)
        # z_cov / z_vel / v_cov; jit caches one trace per presence pattern
        return jax.jit(
            lambda state, z, t, valid, z_cov, z_vel, v_cov: step(
                state, z, t, valid, self.cfg, z_cov=z_cov, z_vel=z_vel,
                v_cov=v_cov),
            donate_argnums=(0,))

    def step(self, state, z, t, valid=True, z_cov=None, z_vel=None,
             v_cov=None):
        """``z_cov`` [2, 2] (e.g. the localizer's per-event ``xy_cov``)
        replaces cfg.measurement_noise for this measurement; ``z_vel``
        [dim] (e.g. ``localize_moving``'s delay-Doppler velocity) adds a
        sequential velocity-measurement update, with ``v_cov`` [dim, dim]
        overriding cfg.velocity_noise."""
        if v_cov is not None and z_vel is None:
            # v_cov only qualifies a velocity MEASUREMENT; without z_vel it
            # would be silently ignored (no velocity update happens)
            raise ValueError("v_cov requires z_vel (it is the noise of the "
                             "velocity measurement, not a standalone input)")
        if self.cfg.imm_q and z_vel is not None:
            raise ValueError("z_vel is not supported with the IMM bank "
                             "(imm_q); use the single-model tracker for "
                             "velocity-measurement fusion")
        if z_vel is not None:
            return self._step_any(
                state, jnp.asarray(z, jnp.float32),
                jnp.asarray(t, jnp.float32), jnp.asarray(valid, bool),
                None if z_cov is None else jnp.asarray(z_cov, jnp.float32),
                None if z_vel is None else jnp.asarray(z_vel, jnp.float32),
                None if v_cov is None else jnp.asarray(v_cov, jnp.float32))
        if z_cov is not None:
            return self._step_cov(state, jnp.asarray(z, jnp.float32),
                                  jnp.asarray(t, jnp.float32),
                                  jnp.asarray(valid, bool),
                                  jnp.asarray(z_cov, jnp.float32))
        return self._step(state, jnp.asarray(z, jnp.float32),
                          jnp.asarray(t, jnp.float32),
                          jnp.asarray(valid, bool))

    def step_many(self, states, zs, ts, valids, z_covs=None):
        """states stacked on a leading stream axis; zs [S, 2], ts [S],
        valids [S]; z_covs (optional) [S, 2, 2] per-stream measurement
        covariances."""
        if z_covs is not None:
            return self._step_many_cov(
                states, jnp.asarray(zs, jnp.float32),
                jnp.asarray(ts, jnp.float32), jnp.asarray(valids, bool),
                jnp.asarray(z_covs, jnp.float32))
        return self._step_many(
            states, jnp.asarray(zs, jnp.float32),
            jnp.asarray(ts, jnp.float32), jnp.asarray(valids, bool))

    @functools.cached_property
    def _smooth(self):
        return jax.jit(functools.partial(rts_smooth, cfg=self.cfg))

    def smooth(self, x, p, t):
        """Offline RTS smoothing of one track's recorded filter history
        (see :func:`rts_smooth`): x [T, 2*dim], p [T, 2*dim, 2*dim],
        t [T] -> smoothed (xs, ps)."""
        return self._smooth(jnp.asarray(x, jnp.float32),
                            jnp.asarray(p, jnp.float32),
                            jnp.asarray(t, jnp.float32))

    def step_multi(self, state, zs, t, valids=None, z_covs=None):
        """Joint JPDA update with N simultaneous measurements: zs [N, 2];
        z_covs (optional) [N, 2, 2] per-measurement noise covariances
        (heterogeneous-R JPDA)."""
        if self.cfg.imm_q:
            raise ValueError("step_multi is not supported with the IMM "
                             "bank (imm_q); use association='soft' with "
                             "per-measurement step calls instead")
        zs = jnp.asarray(zs, jnp.float32)
        if valids is None:
            valids = jnp.ones((zs.shape[0],), bool)
        if z_covs is not None:
            return self._step_multi_cov(
                state, zs, jnp.asarray(t, jnp.float32),
                jnp.asarray(valids, bool),
                jnp.asarray(z_covs, jnp.float32))
        return self._step_multi(
            state, zs, jnp.asarray(t, jnp.float32),
            jnp.asarray(valids, bool))
