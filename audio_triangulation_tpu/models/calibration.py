"""Array self-calibration: learn microphone geometry (and per-channel gain)
from observed frames by gradient descent through the full GCC pipeline.

New capability with no reference equivalent (the firmware trusts its
measured tape-distances, ``constants.h:17-19``): given frames of events at
known (or jointly estimated) source positions, minimize the mismatch between

- **measured** TDOAs: soft-argmax over the GCC correlogram (differentiable
  through windowing, rFFT, cross-power, whitening and irFFT), and
- **predicted** TDOAs from the current geometry estimate.

This is also the framework's canonical *training step* — the thing that gets
sharded over a device mesh (data-parallel over frames; XLA inserts the psum
for gradient reduction from sharding annotations alone).
"""

from __future__ import annotations

import dataclasses
import functools


import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.config import PipelineConfig
from ..core import geometry
from ..ops import conditioning, solver as solver_ops, window as window_ops, xcorr


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CalibParams:
    """Trainable parameters."""

    mic_xy: jnp.ndarray  # [M, 2] microphone positions (meters)
    log_gain: jnp.ndarray  # [M] per-channel gain (log-domain)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CalibBatch:
    """One training batch."""

    frames: jnp.ndarray  # [B, M, N] raw PCM
    source_xy: jnp.ndarray  # [B, 2] known source plane positions


def init_params(mic_xy_guess: np.ndarray) -> CalibParams:
    m = np.asarray(mic_xy_guess, np.float32)
    return CalibParams(
        mic_xy=jnp.asarray(m),
        log_gain=jnp.zeros((m.shape[0],), jnp.float32),
    )


def soft_tdoa(
    correlograms: jnp.ndarray, max_shift: int, beta: float = 2.0
) -> jnp.ndarray:
    """Differentiable TDOA: softmax-weighted lag expectation.

    correlograms [..., L] are max-normalized before the softmax so ``beta``
    is scale-free."""
    lags = jnp.arange(-max_shift, max_shift + 1, dtype=correlograms.dtype)
    c = correlograms / (
        jnp.max(jnp.abs(correlograms), axis=-1, keepdims=True) + 1e-20)
    w = jax.nn.softmax(beta * c * max_shift, axis=-1)
    return jnp.sum(w * lags, axis=-1)


def measured_tdoas(
    params: CalibParams,
    frames: jnp.ndarray,
    pairs: jnp.ndarray,
    window: jnp.ndarray,
    cfg: PipelineConfig,
    beta: float = 2.0,
) -> jnp.ndarray:
    """Frames [B, M, N] -> differentiable TDOAs [B, P] (samples)."""
    # rematerialize the GCC chain on the backward pass: activations of the
    # FFT/cross-power stack dominate memory at large batch, and recomputing
    # them is cheap relative to storing [B, M, F] complex spectra
    @jax.checkpoint
    def gcc(frames_in, log_gain):
        x = frames_in.astype(window.dtype)
        x = conditioning.dc_remove(x)
        x = x * jnp.exp(log_gain)[:, None]
        x = window_ops.apply_window(x, window)
        return xcorr.xcorr_fft(x, pairs, cfg)

    corr = gcc(frames, params.log_gain)
    return soft_tdoa(corr, cfg.max_shift, beta)


def calib_loss(
    params: CalibParams,
    batch: CalibBatch,
    pairs: jnp.ndarray,
    window: jnp.ndarray,
    cfg: PipelineConfig,
    *,
    height: float = 1.2,
    beta: float = 2.0,
    anchor_weight: float = 1.0,
) -> jnp.ndarray:
    """Mean squared TDOA residual (samples^2) + gauge anchors.

    The anchors fix the translation/rotation gauge freedom: centroid at the
    origin and zero net rotation relative to the initial estimate are not
    observable from TDOAs alone."""
    meas = measured_tdoas(params, batch.frames, pairs, window, cfg, beta)

    mic3 = jnp.concatenate(
        [params.mic_xy, jnp.zeros((params.mic_xy.shape[0], 1))], axis=-1)
    pred = solver_ops.predicted_tdoas(
        batch.source_xy, mic3, pairs,
        cfg.speed_of_sound_mps, height, True,
    ) * cfg.sample_rate_hz  # [B, P] samples

    resid = meas - pred
    loss = jnp.mean(resid * resid)
    centroid = jnp.mean(params.mic_xy, axis=0)
    loss = loss + anchor_weight * jnp.sum(centroid * centroid)
    return loss


def estimate_speed_of_sound(
    frames: jnp.ndarray,
    source_xy: jnp.ndarray,
    mic_positions: np.ndarray,
    pipeline: PipelineConfig = PipelineConfig(),
    *,
    height: float = 1.2,
    min_pred_samples: float = 2.0,
) -> tuple[float, dict]:
    """Estimate the speed of sound from events at KNOWN positions with
    KNOWN mic geometry — closed form, no iteration.

    c and the geometry's overall scale are jointly unobservable from TDOAs
    (scaling both leaves every tau = d/c invariant), so geometry stays
    fixed and only c is estimated — the physically common case:
    tape-measured geometry, unknown air temperature (c = 331.3 + 0.606 T
    [degC] m/s varies ~3.5% over 0..30 degC, a direct range bias if
    ignored).  With the model tau_p = K_p / c (K_p the geometric path
    difference times the sample rate), least squares in 1/c gives

        c* = sum_w K^2 / sum_w K * tau_meas

    over every (event, pair) whose predicted |tau| clears
    ``min_pred_samples`` (near-zero TDOAs carry no scale information,
    only noise).  Measurements are sub-sample GCC peaks — the unbiased
    estimator (soft-argmax carries shrinkage bias, fine for geometry
    gradients but poisonous for a global scale fit).

    frames: [B, M, N]; source_xy: [B, 2] plane coords (lifted to the
    radius-``height`` sphere, the reference's source model).
    Returns (c_mps, diagnostics) with diagnostics = {'n_used',
    'rms_samples', 'c_samples': per-event c estimates}.
    """
    from ..ops import window as window_ops, xcorr
    from . import localizer as localizer_mod

    mic_xy = np.asarray(mic_positions, np.float32)
    m = mic_xy.shape[0]
    pairs = geometry.mic_pairs(m)
    win = jnp.asarray(window_ops.window_for(pipeline))

    x = localizer_mod.condition_frames(
        jnp.asarray(frames, jnp.float32), win, pipeline)
    corr = xcorr.xcorr_fft(x, jnp.asarray(pairs), pipeline)
    meas, _ = xcorr.subsample_peak(corr, pipeline.max_shift)  # [B, P]
    meas = np.asarray(meas, np.float64)

    src3 = np.asarray(
        solver_ops.lift_to_model(
            jnp.asarray(source_xy, jnp.float32), height, True), np.float64)
    mic3 = np.zeros((m, 3))
    mic3[:, : mic_xy.shape[1]] = mic_xy
    d = np.linalg.norm(src3[:, None, :] - mic3[None], axis=-1)  # [B, M]
    k = ((d[:, pairs[:, 1]] - d[:, pairs[:, 0]])
         * pipeline.sample_rate_hz)                             # [B, P]

    mask = np.abs(k) / pipeline.speed_of_sound_mps >= min_pred_samples
    kw = k[mask]
    mw = meas[mask]
    denom = float(np.sum(kw * mw))
    if not mask.any() or denom <= 0:
        raise ValueError(
            "no informative (event, pair) TDOAs for a speed-of-sound fit "
            "(all predicted TDOAs below min_pred_samples, or degenerate "
            "measurements)")
    c = float(np.sum(kw * kw) / denom)
    resid = mw - kw / c
    per_event = np.where(
        np.sum(k * meas * mask, axis=1) > 0,
        np.sum(k * k * mask, axis=1)
        / np.maximum(np.sum(k * meas * mask, axis=1), 1e-12), np.nan)
    return c, {
        "n_used": int(mask.sum()),
        "rms_samples": float(np.sqrt(np.mean(resid ** 2))),
        "c_samples": per_event,
    }


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class JointParams:
    """Unsupervised calibration: mic geometry AND per-event source positions
    are latent (no labeled source positions needed — the events themselves
    are the calibration signal)."""

    mic_xy: jnp.ndarray  # [M, 2]
    log_gain: jnp.ndarray  # [M]
    source_xy: jnp.ndarray  # [B, 2] latent per-event source positions


def joint_loss(
    params: JointParams,
    frames: jnp.ndarray,
    pairs: jnp.ndarray,
    window: jnp.ndarray,
    cfg: PipelineConfig,
    mic_anchor: jnp.ndarray,
    *,
    height: float = 1.2,
    beta: float = 2.0,
    anchor_weight: float = 1.0,
    orientation_weight: float = 0.1,
) -> jnp.ndarray:
    """TDOA self-consistency + gauge anchors.

    Without labels the problem has translation/rotation gauge freedom; the
    centroid anchor and a weak orientation prior toward the initial guess
    (mic_anchor) fix it.  Scale is observable (the speed of sound sets it)."""
    cal = CalibParams(mic_xy=params.mic_xy, log_gain=params.log_gain)
    meas = measured_tdoas(cal, frames, pairs, window, cfg, beta)

    mic3 = jnp.concatenate(
        [params.mic_xy, jnp.zeros((params.mic_xy.shape[0], 1))], axis=-1)
    pred = solver_ops.predicted_tdoas(
        params.source_xy, mic3, pairs,
        cfg.speed_of_sound_mps, height, True,
    ) * cfg.sample_rate_hz

    resid = meas - pred
    loss = jnp.mean(resid * resid)
    centroid = jnp.mean(params.mic_xy, axis=0)
    loss = loss + anchor_weight * jnp.sum(centroid * centroid)
    loss = loss + orientation_weight * jnp.mean(
        (params.mic_xy - mic_anchor) ** 2)
    return loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrackedParams:
    """Self-calibration from tracked motion: the per-event source positions
    are not free latents (JointParams' 2B DOF) but constrained to a smooth
    polynomial trajectory xy(t) = sum_d coeffs[d] t^d — a moving source
    heard B times contributes B pair-constraints against only
    2 (order+1) trajectory DOF, a far stronger geometry signal."""

    mic_xy: jnp.ndarray       # [M, 2]
    log_gain: jnp.ndarray     # [M]
    traj_coeffs: jnp.ndarray  # [order+1, 2] polynomial in centered time


def traj_positions(coeffs: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    """Polynomial trajectory sample: coeffs [D+1, 2], times [B] -> [B, 2]."""
    powers = times[:, None] ** jnp.arange(
        coeffs.shape[0], dtype=times.dtype)[None, :]  # [B, D+1]
    return powers @ coeffs


def tracked_loss(
    params: TrackedParams,
    frames: jnp.ndarray,
    times: jnp.ndarray,       # [B] event times, centered (see fit_tracked)
    pairs: jnp.ndarray,
    window: jnp.ndarray,
    cfg: PipelineConfig,
    mic_anchor: jnp.ndarray,
    *,
    height: float = 1.2,
    beta: float = 2.0,
    anchor_weight: float = 1.0,
    orientation_weight: float = 0.1,
) -> jnp.ndarray:
    """TDOA self-consistency with trajectory-constrained source positions.

    Gauge anchors as in :func:`joint_loss` (rotating the mics and the
    trajectory together is unobservable from TDOAs)."""
    cal = CalibParams(mic_xy=params.mic_xy, log_gain=params.log_gain)
    meas = measured_tdoas(cal, frames, pairs, window, cfg, beta)

    src = traj_positions(params.traj_coeffs, times)  # [B, 2]
    mic3 = jnp.concatenate(
        [params.mic_xy, jnp.zeros((params.mic_xy.shape[0], 1))], axis=-1)
    pred = solver_ops.predicted_tdoas(
        src, mic3, pairs, cfg.speed_of_sound_mps, height, True,
    ) * cfg.sample_rate_hz

    resid = meas - pred
    loss = jnp.mean(resid * resid)
    centroid = jnp.mean(params.mic_xy, axis=0)
    loss = loss + anchor_weight * jnp.sum(centroid * centroid)
    loss = loss + orientation_weight * jnp.mean(
        (params.mic_xy - mic_anchor) ** 2)
    return loss


@dataclasses.dataclass(frozen=True)
class Calibrator:
    """Optax-based calibration trainer."""

    pipeline: PipelineConfig
    pairs: jnp.ndarray
    window: jnp.ndarray
    height: float = 1.2
    beta: float = 2.0
    learning_rate: float = 3e-3

    @classmethod
    def create(cls, n_mics: int, pipeline: PipelineConfig = PipelineConfig(),
               **kwargs) -> "Calibrator":
        pairs = jnp.asarray(geometry.mic_pairs(n_mics))
        win = jnp.asarray(
            window_ops.window_for(pipeline))
        return cls(pipeline=pipeline, pairs=pairs, window=win, **kwargs)

    @functools.cached_property
    def optimizer(self):
        return optax.adam(self.learning_rate)

    def init(self, mic_xy_guess: np.ndarray):
        params = init_params(mic_xy_guess)
        return params, self.optimizer.init(params)

    @functools.cached_property
    def train_step(self):
        """Jitted (params, opt_state, batch) -> (params, opt_state, loss)."""

        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(calib_loss)(
                params, batch, self.pairs, self.window, self.pipeline,
                height=self.height, beta=self.beta,
            )
            updates, opt_state = self.optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1))

    def fit(self, mic_xy_guess, batches, steps_per_batch: int = 1):
        params, opt_state = self.init(mic_xy_guess)
        losses = []
        for batch in batches:
            for _ in range(steps_per_batch):
                params, opt_state, loss = self.train_step(
                    params, opt_state, batch)
                losses.append(float(loss))
        return params, losses

    # ------------------------------------------------------------------
    # Unsupervised (joint) mode: no labeled source positions

    def init_joint(self, mic_xy_guess: np.ndarray,
                   source_xy_guess: np.ndarray):
        m = np.asarray(mic_xy_guess, np.float32)
        params = JointParams(
            mic_xy=jnp.asarray(m),
            log_gain=jnp.zeros((m.shape[0],), jnp.float32),
            source_xy=jnp.asarray(source_xy_guess, jnp.float32),
        )
        return params, self.optimizer.init(params)

    def fit_em(self, mic_xy_guess: np.ndarray, frames,
               em_rounds: int = 6, inner_steps: int = 80):
        """Unsupervised self-calibration by expectation-maximization:
        E-step localizes the events with the current geometry estimate,
        M-step refines the geometry supervised on those positions.

        Identifiability is pair-count-limited: 3-mic arrays (3 pairs vs 2
        latent source DOF per event) are nearly gauge-degenerate and barely
        improve; >= ~6 mics give a strongly overdetermined system (8-mic
        circular measured: 7.5 -> 5.2 mm mean geometry error in 6 rounds,
        no labels)."""
        from . import localizer as localizer_mod

        mic_est = np.asarray(mic_xy_guess, np.float32).copy()
        losses = []
        for _ in range(em_rounds):
            loc = localizer_mod.Localizer.create(mic_est, self.pipeline)
            src = loc(frames)["xy"]
            batch = CalibBatch(frames=frames, source_xy=src)
            params, opt_state = self.init(mic_est)
            for _ in range(inner_steps):
                params, opt_state, loss = self.train_step(
                    params, opt_state, batch)
            mic_est = np.asarray(params.mic_xy)
            losses.append(float(loss))
        return mic_est, losses

    # ------------------------------------------------------------------
    # Self-calibration from tracked motion (docs/ROADMAP capability item):
    # a moving source's tracker trajectory becomes the reference source

    @functools.cached_property
    def train_step_tracked(self):
        """Jitted trajectory-constrained step: (params, opt_state, frames,
        times, mic_anchor) -> (params, opt_state, loss)."""

        def step(params, opt_state, frames, times, mic_anchor):
            loss, grads = jax.value_and_grad(tracked_loss)(
                params, frames, times, self.pairs, self.window,
                self.pipeline, mic_anchor,
                height=self.height, beta=self.beta,
            )
            updates, opt_state = self.optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1))

    def fit_tracked(self, mic_xy_guess: np.ndarray, frames,
                    event_times: np.ndarray, *, traj_order: int = 1,
                    steps: int = 300, tracker_cfg=None):
        """Unsupervised self-calibration from a single moving source.

        1. Localize each event with the initial geometry guess.
        2. Run the Kalman tracker (models.tracking) over the timestamped
           positions; its filtered trajectory initializes the polynomial
           trajectory coefficients (order 1 = the tracker's own
           constant-velocity model).
        3. Jointly refine geometry + gains + trajectory against the
           measured TDOAs (:func:`tracked_loss`).

        Returns (mic_xy [M, 2], traj_coeffs [order+1, 2] in centered time,
        losses).  Identifiability scales with pair count exactly like
        :meth:`fit_em`, but a moving source yields many effective source
        positions from one session."""
        from . import localizer as localizer_mod
        from . import tracking

        mic0 = np.asarray(mic_xy_guess, np.float32)
        times = np.asarray(event_times, np.float32)
        t0 = float(times.mean())  # center time: conditions the poly basis
        tc = times - t0

        # E-step 0: localize + track with the guessed geometry
        loc = localizer_mod.Localizer.create(mic0, self.pipeline)
        xy = np.asarray(loc(frames)["xy"])  # [B, 2]
        tr = tracking.Tracker(tracker_cfg or tracking.TrackerConfig(
            measurement_noise=0.05, process_noise=0.5))
        st = tr.init()
        filt = []
        for i in np.argsort(times):
            st, out = tr.step(st, xy[i], times[i])
            k = int(np.asarray(out["assigned"]))
            filt.append(np.asarray(out["track_xy"])[max(k, 0)])
        filt = np.asarray(filt)[np.argsort(np.argsort(times))]  # undo sort

        # init trajectory: polyfit through the tracker's filtered positions
        coeffs = np.stack([
            np.polyfit(tc, filt[:, d], traj_order)[::-1]
            for d in range(2)], axis=-1).astype(np.float32)  # [order+1, 2]

        params = TrackedParams(
            mic_xy=jnp.asarray(mic0),
            log_gain=jnp.zeros((mic0.shape[0],), jnp.float32),
            traj_coeffs=jnp.asarray(coeffs),
        )
        opt_state = self.optimizer.init(params)
        frames_j = jnp.asarray(frames)
        tc_j = jnp.asarray(tc)
        anchor = jnp.asarray(mic0)
        losses = []
        for _ in range(steps):
            params, opt_state, loss = self.train_step_tracked(
                params, opt_state, frames_j, tc_j, anchor)
            losses.append(float(loss))
        return (np.asarray(params.mic_xy), np.asarray(params.traj_coeffs),
                losses)

    @functools.cached_property
    def train_step_joint(self):
        """Jitted unsupervised step: (params, opt_state, frames, mic_anchor)
        -> (params, opt_state, loss)."""

        def step(params, opt_state, frames, mic_anchor):
            loss, grads = jax.value_and_grad(joint_loss)(
                params, frames, self.pairs, self.window, self.pipeline,
                mic_anchor, height=self.height, beta=self.beta,
            )
            updates, opt_state = self.optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1))
