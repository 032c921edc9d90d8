"""Streaming localizer: stateful chunked ingest with event detection and
EMA-smoothed correlograms.

This is the TPU re-expression of the reference's whole runtime loop
(``src/sample_compute.h:45-150``): where the firmware paces one sample every
20 us through a ring buffer and bursts compute on a trigger, this consumes
fixed-size chunks (jit-friendly static shapes), detects triggers with the
vectorized variance detector, and — masked, not branched — runs the
correlation/localization burst and EMA update for chunks that contain an
event.  State is a pytree; ``step`` is pure and donation-safe, so the EMA
correlogram state updates in place in HBM (the analogue of the firmware's
mutate-in-place ``correlations_average``).

Reference-parity behaviors:
- trigger = summed outgoing variance > threshold + summed incoming variance
  (sample_compute.h:78-90)
- post-event ring reset: detection is suppressed until a full frame of fresh
  samples has streamed in (sample_compute.h:55-57 re-inits the rings)
- shift gate: events with sum(best_shift^2) <= gate don't update the EMA
  (sample_compute.h:124-134)
- EMA decay 1 - exp(-dt/tau) with dt the real time since the last accepted
  event (correlations.c:40-43)
"""

from __future__ import annotations

import dataclasses
import functools


import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import GridConfig, PipelineConfig, SolverConfig, StreamConfig

from ..ops import (beamform, consistency, detector, solver as solver_ops,
                   srp, xcorr)
from . import localizer as localizer_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamState:
    """Carried state of the streaming localizer (a pytree)."""

    context: jnp.ndarray  # [M, frame_size - 1] trailing samples
    ema_corr: jnp.ndarray  # [P, L] float32 smoothed correlograms
    best_shift: jnp.ndarray  # [P] int32 current best shifts
    time_s: jnp.ndarray  # scalar: stream clock (seconds)
    last_event_s: jnp.ndarray  # scalar: time of last accepted event
    # countdown of fresh samples during which triggering stays suppressed
    # (post-event ring-refill; overflow-free unlike an absolute watermark)
    suppress: jnp.ndarray  # scalar int32
    abs_sample: jnp.ndarray  # scalar int32 absolute sample counter (wraps
    # after ~2^31 samples ~= 12 h @ 50 kHz; used only for event reporting)
    event_count: jnp.ndarray  # scalar int32


@dataclasses.dataclass(frozen=True)
class StreamingLocalizer:
    """Chunked streaming pipeline around a :class:`Localizer`'s params."""

    pipeline: PipelineConfig
    grid: GridConfig
    solver: SolverConfig
    stream: StreamConfig
    params: localizer_mod.LocalizerParams
    srp_form: str
    # Gauss-Newton refine of the smoothed peak each step (the batch path's
    # flagship 'xy' for streaming consumers)
    with_solver: bool = True

    @classmethod
    def create(
        cls,
        mic_positions: np.ndarray,
        pipeline: PipelineConfig = PipelineConfig(),
        grid: GridConfig = GridConfig(),
        solver: SolverConfig = SolverConfig(),
        stream: StreamConfig = StreamConfig(),
        with_solver: bool = True,
        **kwargs,
    ) -> "StreamingLocalizer":
        mic_positions = np.asarray(mic_positions, dtype=np.float32)
        key = (cls, mic_positions.tobytes(), mic_positions.shape, pipeline,
               grid, solver, stream, with_solver,
               tuple(sorted((k, repr(v)) for k, v in kwargs.items())))

        def build():
            base = localizer_mod.Localizer.create(
                mic_positions, pipeline, grid, solver, **kwargs)
            return cls(pipeline=pipeline, grid=grid, solver=solver,
                       stream=stream, params=base.params,
                       srp_form=base.srp_form, with_solver=with_solver)

        return localizer_mod._memo_create(key, build)

    # ------------------------------------------------------------------
    def init_state(self) -> StreamState:
        m = self.params.mic_positions.shape[0]
        p = self.params.pairs.shape[0]
        n = self.pipeline.frame_size
        return StreamState(
            context=jnp.zeros((m, n - 1), jnp.float32),
            ema_corr=jnp.zeros((p, self.pipeline.num_lags), jnp.float32),
            best_shift=jnp.zeros((p,), jnp.int32),
            time_s=jnp.zeros((), jnp.float32),
            last_event_s=jnp.zeros((), jnp.float32),
            suppress=jnp.asarray(n - 1, jnp.int32),
            abs_sample=jnp.zeros((), jnp.int32),
            event_count=jnp.zeros((), jnp.int32),
        )

    def __call__(self, state: StreamState, chunk: jnp.ndarray):
        return self._jitted(state, chunk, caf_resample=self._caf_resample)

    @functools.cached_property
    def _caf_resample(self):
        # solve_velocity's resampling matrices, passed as a jit ARGUMENT
        # (138 MB at 33 scales: as a closure constant they oversize the
        # compile payload — the PERFORMANCE.md jit-closure footgun)
        if not self.stream.solve_velocity:
            return None
        from ..ops import caf as caf_ops

        return caf_ops.precompute_resample(
            self.pipeline.frame_size, self.stream.velocity_v_max,
            self.stream.velocity_n_scales, self.pipeline.speed_of_sound_mps,
            cfg=self.pipeline)

    def step_kwargs(self) -> dict:
        """The full static-kwargs set binding :func:`stream_step` to this
        localizer's configuration — the single source shared by the
        single-stream jit, the batched jit, and the fused tracked step
        (models.tracked.TrackedStreamingLocalizer)."""
        return dict(
            params=self.params,
            cfg=self.pipeline,
            grid_cfg=self.grid,
            solver_cfg=self.solver,
            srp_form=self.srp_form,
            max_events=self.stream.max_events_per_chunk,
            refractory=self.stream.refractory_samples,
            with_solver=self.with_solver,
            n_sources=self.stream.n_sources,
            multi_min_separation_m=self.stream.multi_min_separation_m,
            multi_assoc_window=self.stream.multi_assoc_window_samples,
            solve_xyz=self.stream.solve_xyz,
            xyz_z_inits=self.stream.xyz_z_inits,
            solve_velocity=self.stream.solve_velocity,
            velocity_v_max=self.stream.velocity_v_max,
            velocity_n_scales=self.stream.velocity_n_scales,
            health_weighting=self.stream.health_weighting,
            health_ratio=self.stream.health_ratio,
            health_floor_s=self.stream.health_floor_s,
        )

    @functools.cached_property
    def _jitted(self):
        return jax.jit(
            functools.partial(stream_step, **self.step_kwargs()),
            donate_argnums=(0,),
        )

    # ------------------------------------------------------------------
    # Batched multi-stream serving: S independent streams advance in one
    # device program (states stacked on a leading axis).  This is the
    # production-serving shape — thousands of concurrent arrays sharing one
    # chip — and it vmaps the exact same pure step, so single-stream and
    # batched behavior are identical by construction.

    def init_states(self, n_streams: int) -> StreamState:
        one = self.init_state()
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape).copy(), one)

    def step_many(self, states: StreamState, chunks: jnp.ndarray):
        """states: leading-axis-stacked StreamState; chunks [S, M, C].

        Beyond ``stream.batch_chunk_streams`` streams, the step runs as
        asynchronously pipelined sub-batch dispatches of one compiled
        ~1,024-stream program instead of a single huge vmapped program:
        past ~1,024 streams the detector ring state outgrows XLA's
        alternate-memory (VMEM) budget and the monolithic program spills
        to HBM with relayout copies (r3 trace: 2,048 dense streams cost
        15.7 ms device vs 2 x 2.94 chunked — a 2.7x superlinear cliff;
        a lax.map body re-spills at 12.7 ms, so the sub-batching happens
        at dispatch level, where each body is exactly the VMEM-resident
        sweet-spot program)."""
        cs = self.stream.batch_chunk_streams
        s = chunks.shape[0]
        traced = isinstance(chunks, jax.core.Tracer) or any(
            isinstance(x, jax.core.Tracer) for x in jax.tree.leaves(states))
        if cs is None or s <= cs or traced:
            # under an enclosing jit the sub-dispatches would inline into
            # one monolithic program (no pipelining, plus pad/slice/concat
            # overhead) — use the plain vmapped program there
            return self._jitted_batch(states, chunks,
                                      caf_resample=self._caf_resample)
        k = -(-s // cs)
        parts = self._split_batch(k * cs, cs)(states, chunks)
        res = [self._jitted_batch(st, ch, caf_resample=self._caf_resample)
               for st, ch in parts]
        st, out = self._concat_batch(s)(
            [r[0] for r in res], [r[1] for r in res])
        return st, out

    @functools.cached_property
    def _batch_helpers(self):
        # jitted split/concat helpers keyed by shape (self is a frozen
        # dataclass holding arrays — not lru_cache-hashable)
        return {}

    def _split_batch(self, total: int, cs: int):
        """Jitted (pad to ``total``, split into ``cs``-stream sub-trees)."""
        key = ("split", total, cs)
        if key in self._batch_helpers:
            return self._batch_helpers[key]

        def split(states, chunks):
            def _prep(x):
                pad = total - x.shape[0]
                if pad:
                    x = jnp.concatenate(
                        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
                return x

            states = jax.tree.map(_prep, states)
            chunks = _prep(chunks)
            cut = lambda x, i: x[i * cs:(i + 1) * cs]  # noqa: E731
            return tuple(
                (jax.tree.map(lambda x: cut(x, i), states), cut(chunks, i))
                for i in range(total // cs))

        # no donation: the padded [total,...] buffers can never alias the
        # [cs,...] slice outputs (XLA would just warn on every compile)
        fn = jax.jit(split)
        self._batch_helpers[key] = fn
        return fn

    def _concat_batch(self, s: int):
        """Jitted re-stack of sub-batch (states, outputs) to ``s`` streams."""
        key = ("concat", s)
        if key in self._batch_helpers:
            return self._batch_helpers[key]

        def concat(state_list, out_list):
            cat = lambda *xs: jnp.concatenate(xs, 0)[:s]  # noqa: E731
            return (jax.tree.map(cat, *state_list),
                    jax.tree.map(cat, *out_list))

        # no donation: [cs,...] inputs can't alias the [s,...] concat output
        fn = jax.jit(concat)
        self._batch_helpers[key] = fn
        return fn

    @functools.cached_property
    def _jitted_batch(self):
        one = functools.partial(stream_step, **self.step_kwargs())

        def vstep(states, chunks, caf_resample=None):
            # resample matrices shared (unbatched) across streams; closed
            # over INSIDE the jit so they stay a traced argument
            return jax.vmap(
                lambda s, c: one(s, c, caf_resample=caf_resample)
            )(states, chunks)

        return jax.jit(vstep, donate_argnums=(0,))

    def run(self, streams: np.ndarray):
        """Convenience: drive a whole [M, T] stream through chunked steps on
        host, returning the list of per-chunk outputs."""
        c = self.stream.chunk_size
        t = streams.shape[-1]
        state = self.init_state()
        outs = []
        for i in range(0, t - t % c, c):
            state, out = self(state, jnp.asarray(streams[:, i: i + c]))
            outs.append(jax.tree.map(np.asarray, out))
        return state, outs


# ----------------------------------------------------------------------

def _detect_and_capture(
    state: StreamState,
    chunk: jnp.ndarray,  # [M, C]
    *,
    cfg: PipelineConfig,
    max_events: int,
    refractory: int,
):
    """Shared detection front half: advance the detector over the chunk and
    extract up to ``max_events`` triggers plus their captured frames.

    Returns (window [M, N-1+C], founds [K], t_rels [K] window indices,
    frames [K, M, N], trig_times [K] stream seconds, arm countdown)."""
    n = cfg.frame_size
    fs = cfg.sample_rate_hz
    chunk = chunk.astype(jnp.float32)

    window = jnp.concatenate([state.context, chunk], axis=-1)  # [M, N-1+C]

    # detector over the windowed view; w indexes window positions, and the
    # fresh (this-chunk) positions start at w = n - 1 (chunk sample 0)
    mask0 = detector.trigger_mask(window[None], cfg)[0]  # [N-1+C]
    w = jnp.arange(mask0.shape[-1])
    chunk_pos = w - (n - 1)  # chunk-relative sample index of position w
    mask0 = mask0 & (chunk_pos >= 0)

    # --- sequential trigger extraction with post-event holdoff ------------
    # ``arm`` is the chunk-relative position from which triggering is armed;
    # it starts at the carried countdown and jumps past each event's frame
    # refill (the reference's ring re-init) plus the configured refractory.
    holdoff = n + refractory
    founds, t_rels = [], []
    arm = state.suppress
    for _ in range(max_events):
        m_k = mask0 & (chunk_pos >= arm)
        f_k = jnp.any(m_k)
        t_k = jnp.argmax(m_k)  # index into window
        founds.append(f_k)
        t_rels.append(t_k)
        arm = jnp.where(f_k, (t_k - (n - 1)) + holdoff, arm)
    founds = jnp.stack(founds)  # [K]
    t_rels = jnp.stack(t_rels)  # [K]

    starts = jnp.maximum(t_rels - (n - 1), 0)
    # gather-free extraction: the vmapped dynamic_slice this replaces
    # lowered to a serial per-stream while loop under step_many's vmap
    # (0.87 ms of the 2.94 ms step at 1,024 streams); bit-exact swap
    frames = jax.vmap(
        lambda s_: detector.extract_window_mm(
            window, s_, n, max_start=window.shape[-1] - n)
    )(starts)  # [K, M, N]
    trig_times = state.time_s + (
        t_rels - (n - 1) + 1).astype(jnp.float32) / fs  # [K]
    return window, founds, t_rels, frames, trig_times, arm


def stream_step(
    state: StreamState,
    chunk: jnp.ndarray,  # [M, C]
    *,
    params: localizer_mod.LocalizerParams,
    cfg: PipelineConfig,
    grid_cfg: GridConfig,
    solver_cfg: SolverConfig,
    srp_form: str,
    max_events: int = 1,
    refractory: int = 0,
    with_solver: bool = False,
    n_sources: int = 1,
    multi_min_separation_m: float = 0.4,
    multi_assoc_window: float = 3.0,
    solve_xyz: bool = False,
    xyz_z_inits: tuple = (0.4, 1.2, 2.0),
    solve_velocity: bool = False,
    velocity_v_max: float = 8.0,
    velocity_n_scales: int = 33,
    caf_resample: jnp.ndarray | None = None,
    health_weighting: bool = False,
    health_ratio: float = 3.0,
    health_floor_s: float = 1e-5,
):
    """One streaming step: returns (new_state, outputs dict).

    Extracts up to ``max_events`` triggers per chunk (each followed by the
    reference's full-frame refill holdoff plus ``refractory`` extra samples,
    sample_compute.h:55-57) and EMA-merges every accepted event in stream
    order.  ``with_solver`` adds a Gauss-Newton refine of the smoothed
    correlogram peak (the batch path's flagship ``xy``) to the outputs.

    ``n_sources`` > 1 additionally resolves simultaneous sources per event
    slot from the RAW (untapered) per-event correlograms — SRP top-K +
    per-source TDOA disambiguation + GN refine, the streaming form of
    :func:`..localizer.localize_frames_multi` — into 'multi_xy'
    [K, S, 2] / 'multi_score' / 'multi_xy_cov' / 'multi_valid' outputs
    sized for :meth:`..tracking.Tracker.step_multi`."""
    n = cfg.frame_size
    c_len = chunk.shape[-1]
    fs = cfg.sample_rate_hz

    window, founds, t_rels, frames, trig_times, arm = _detect_and_capture(
        state, chunk, cfg=cfg, max_events=max_events, refractory=refractory)

    # --- correlation bursts (computed every step, masked into state) ------
    x = localizer_mod.condition_frames(frames, params.window, cfg)
    corr = localizer_mod.correlate_frames(x, params, cfg)  # [K, P, L]
    shifts = xcorr.best_lag(corr, cfg.max_shift)  # [K, P]
    corr_t = (xcorr.peak_taper(corr, cfg.max_shift, cfg.taper_denom, shifts)
              if cfg.taper_enabled else corr)

    gates = jnp.sum(shifts.astype(jnp.int32) ** 2, axis=-1) > cfg.shift_gate
    accepts = founds & gates  # [K]

    # EMA with real dt since last accepted event (correlations.c:40-43),
    # applied in stream order (dt chains through accepted events)
    ema_corr = state.ema_corr
    last_event = state.last_event_s
    for k in range(max_events):
        dt = jnp.maximum(trig_times[k] - last_event, 0.0)
        decay = xcorr.ema_decay(dt, cfg.ema_tau_s)
        ema_new = xcorr.ema_update(ema_corr, corr_t[k], decay)
        ema_corr = jnp.where(accepts[k], ema_new, ema_corr)
        last_event = jnp.where(accepts[k], trig_times[k], last_event)
    any_accept = jnp.any(accepts)
    best = jnp.where(
        any_accept, xcorr.best_lag(ema_corr, cfg.max_shift),
        state.best_shift)

    # --- array health (computed every step; also drives fault-tolerant
    # weighting below when enabled): TDOA cycle-consistency residual of
    # the smoothed correlogram peaks (ops/consistency) — rises when a
    # channel goes bad (0 for a healthy array), with per-mic attribution.
    # Units are SECONDS, the same convention as diagnose_mics / the CLI.
    n_mics = params.mic_positions.shape[0]
    tdoa_samples = xcorr.subsample_peak(ema_corr, cfg.max_shift)[0]
    if cfg.subsample_peak and cfg.subsample_method in ("phase", "hybrid"):
        # the batch dispatch (localizer.localize_frames), applied on EVENT
        # steps from the PRIMARY captured frame's spectra: the EMA state
        # carries no phase, but right after an accepted event its peak
        # tracks that event's correlogram, so the phase-slope refinement
        # anchors on the smoothed integer peak `best`.  Non-event steps
        # (and, under 'hybrid', low-coherence pairs) keep the parabolic
        # estimate.  Slot 0 is the first accepted event of the chunk.
        spectra = xcorr.rfft_frames(x[0], cfg.fft_length)  # [M, F]
        wm = xcorr.band_mask(cfg)
        if wm is None and cfg.band_auto:
            wm = xcorr.auto_band_weight(
                spectra, params.pairs, cfg)[..., None, :]
        tdoa_phase = xcorr.tdoa_phase_slope(
            spectra, params.pairs, best, fft_length=cfg.fft_length,
            half_width=cfg.coherence_bins, eps=cfg.phat_eps,
            weight_mask=wm)
        use_phase = accepts[0]
        if cfg.subsample_method == "hybrid":
            _, _, _, g2 = xcorr.smoothed_cross_stats(
                spectra, params.pairs, cfg.coherence_bins,
                eps=cfg.phat_eps)
            w_bins = (jnp.ones_like(g2) if wm is None
                      else jnp.broadcast_to(
                          jnp.asarray(wm, g2.dtype), g2.shape))
            coh = (jnp.sum(g2 * w_bins, axis=-1)
                   / jnp.maximum(jnp.sum(w_bins, axis=-1), 1e-12))
            use_phase = accepts[0] & (coh >= cfg.hybrid_coherence_min)
        tdoa_samples = jnp.where(use_phase, tdoa_phase, tdoa_samples)
    _, _, c_resid = consistency.project_consistent(
        tdoa_samples / fs, params.pairs, n_mics)
    mic_scores = consistency.mic_consistency_scores(
        c_resid, params.pairs, n_mics)
    w2_health = None
    if health_weighting:
        # leave-one-mic-out mic weights + seeded per-pair IRLS
        # (ops/consistency.fault_weights): a failing channel's pairs are
        # suppressed in BOTH the SRP init grid and the GN solve, so
        # localization degrades gracefully instead of breaking (needs
        # M >= 5 for a dead mic to be fully absorbed by the remaining
        # pair redundancy).
        w2_health, tdoa_clean_s, w_mic = consistency.fault_weights(
            tdoa_samples / fs, params.pairs, n_mics,
            ratio=health_ratio, floor=health_floor_s)

    # --- localization from the smoothed correlograms ---
    srp_in = ema_corr if w2_health is None else ema_corr * w2_health[:, None]
    if srp_form == "matmul":
        scores = srp.srp_scores_matmul(srp_in[None], params.onehot)[0]
    else:
        scores = srp.srp_scores_gather(srp_in[None], params.lut_flat)[0]
    xy_grid = srp.grid_peak_xy(
        scores[None], (grid_cfg.height, grid_cfg.width),
        (grid_cfg.half_cells_x, grid_cfg.half_cells_y),
        grid_cfg.cells_per_m,
    )[0]

    found_any = jnp.any(founds)
    new_state = StreamState(
        context=window[:, -(n - 1):],
        ema_corr=ema_corr,
        best_shift=best,
        time_s=state.time_s + c_len / fs,
        last_event_s=last_event,
        # post-event: reference re-inits rings -> need a full fresh frame
        # (countdown is relative, so arbitrarily long streams never overflow)
        suppress=jnp.maximum(arm - c_len, 0).astype(jnp.int32),
        abs_sample=state.abs_sample + c_len,
        event_count=state.event_count + jnp.sum(accepts.astype(jnp.int32)),
    )
    event_abs = jnp.where(founds, state.abs_sample + (t_rels - (n - 1)), -1)
    out = {
        "event": accepts[0] if max_events == 1 else any_accept,
        "triggered": found_any,
        "trigger_abs": event_abs[0],
        # per-slot event reporting (multi-event capability)
        "events": accepts,  # [K] accepted-event mask
        "events_found": founds,  # [K] raw trigger mask (pre shift-gate)
        "event_trigger_abs": event_abs,  # [K]
        "event_time_s": trig_times,  # [K] stream seconds (valid iff found)
        "event_shifts": shifts,  # [K, P] per-event integer lags
        "best_shift": best,
        "tdoa_samples": tdoa_samples,
        "xy_grid": xy_grid,
        "event_count": new_state.event_count,
    }
    out["consistency_rms"] = jnp.sqrt(jnp.mean(c_resid * c_resid))
    out["mic_consistency"] = mic_scores
    if w2_health is not None:
        out["pair_weight"] = w2_health  # [P] fault-tolerance weights
        out["mic_weight"] = w_mic  # [M] leave-one-out mic health weights
    if with_solver:
        # health path: solve the DENOISED (weighted-consistent) TDOAs —
        # every pair re-synthesized from arrival times fitted to the
        # healthy pairs — with the IRLS weights besides
        tdoa_s = (tdoa_samples[None] / fs if w2_health is None
                  else tdoa_clean_s[None])  # [1, P] seconds
        xy, rms = solver_ops.solve_tdoa_batched(
            tdoa_s, params.mic_positions, params.pairs,
            speed_of_sound=cfg.speed_of_sound_mps,
            height=grid_cfg.height_m,
            # solver convention: `weights` is the standard-deviation-style
            # weight, squared internally — w2_health is already the
            # squared-residual multiplier, so pass its root
            weights=None if w2_health is None else jnp.sqrt(w2_health),
            init_xy=xy_grid[None], cfg=solver_cfg)
        out["xy"] = xy[0]
        out["rms_m"] = rms[0]
        # per-event position covariance — live consumers (the tracker's
        # z_cov) get the same honest uncertainty as the batch path
        out["xy_cov"] = solver_ops.solution_covariance(
            xy, rms, params.mic_positions, params.pairs,
            height=grid_cfg.height_m, cfg=solver_cfg)[0]
        if solve_xyz:
            # free 3-D position from the same smoothed TDOAs (multi-start
            # GN; no volumetric grid in the loop) — feeds a dim=3 tracker
            xyz, xyz_rms = solver_ops.solve_tdoa_xyz_multistart(
                tdoa_s, params.mic_positions, params.pairs,
                speed_of_sound=cfg.speed_of_sound_mps,
                init_xy=xy, z_inits=xyz_z_inits)
            out["xyz"] = xyz[0]
            out["xyz_rms_m"] = xyz_rms[0]
        if solve_velocity:
            # instantaneous per-event velocity: delay-Doppler CAF on the
            # PRIMARY captured frame (computed every step like the rest
            # of the burst path, meaningful iff 'event'); opt-in — costs
            # ~velocity_n_scales x one frame's GCC per step
            from ..core import geometry
            from ..ops import caf as caf_ops

            m = int(params.mic_positions.shape[0])
            # canonical pair order (== params.pairs, needed statically)
            pairs_np = geometry.mic_pairs(m)
            dd = caf_ops.estimate_delay_doppler(
                frames[:1], params.window, pairs_np, cfg,
                v_max=velocity_v_max, n_scales=velocity_n_scales,
                resample=caf_resample)
            mdim = int(params.mic_positions.shape[1])
            if solve_xyz:
                pos = xyz  # [1, 3]
            else:
                pos = jnp.concatenate(
                    [xy, jnp.full((1, 1), grid_cfg.height_m, xy.dtype)],
                    axis=-1)
            mic3 = (params.mic_positions if mdim == 3 else
                    jnp.concatenate(
                        [params.mic_positions,
                         jnp.zeros((m, 3 - mdim),
                                   params.mic_positions.dtype)], axis=-1))
            # in-plane iff the array is actually coplanar (same test as
            # Localizer.localize_moving): a planar array supplied as [M, 3]
            # with constant z must NOT run the rank-deficient 3-D LS.
            # params is always partial-bound (concrete) at trace time; if a
            # caller ever traces it, fall back to the column-count proxy.
            if isinstance(params.mic_positions, jax.core.Tracer):
                coplanar = mdim < 3
            else:
                coplanar = mdim < 3 or bool(
                    np.ptp(np.asarray(params.mic_positions)[:, 2]) < 1e-6)
            vel = caf_ops.solve_velocity(
                pos, dd["pair_rel_speed"], mic3, params.pairs,
                in_plane=coplanar)
            out["velocity"] = vel[0]
            out["pair_rel_speed"] = dd["pair_rel_speed"][0]

    if n_sources > 1:
        # simultaneous-source resolution per event slot, from the RAW
        # per-event correlograms (the tapered/EMA'd state above keeps its
        # reference single-source semantics untouched)
        from ..ops import multisource

        g = grid_cfg.num_cells
        if srp_form == "matmul":
            mscores = srp.srp_scores_matmul(corr, params.onehot)
        else:
            mscores = srp.srp_scores_gather(corr, params.lut_flat)
        cell_xy = jnp.asarray(multisource.cell_centers_xy(grid_cfg))
        pk_xy, pk_score = srp.top_k_peaks(
            mscores[..., :g], cell_xy, n_sources,
            multi_min_separation_m)  # [K, S, 2], [K, S]
        mic3 = jnp.zeros((params.mic_positions.shape[0], 3), jnp.float32)
        mic3 = mic3.at[:, :2].set(params.mic_positions)
        pred_lags = solver_ops.predicted_tdoas(
            pk_xy, mic3, params.pairs, cfg.speed_of_sound_mps,
            grid_cfg.height_m, solver_cfg.constrain_to_sphere) * fs
        m_tdoa, _ = multisource.windowed_subsample_peak(
            corr[:, None], cfg.max_shift, pred_lags, multi_assoc_window)
        m_xy, m_rms = solver_ops.solve_tdoa_batched(
            m_tdoa / fs, params.mic_positions, params.pairs,
            speed_of_sound=cfg.speed_of_sound_mps,
            height=grid_cfg.height_m, init_xy=pk_xy, cfg=solver_cfg)
        out["multi_xy"] = m_xy  # [K, S, 2] strongest first
        out["multi_score"] = pk_score
        out["multi_rms_m"] = m_rms
        out["multi_tdoa_samples"] = m_tdoa
        out["multi_xy_cov"] = solver_ops.solution_covariance(
            m_xy, m_rms, params.mic_positions, params.pairs,
            height=grid_cfg.height_m, cfg=solver_cfg)
        out["multi_valid"] = accepts[:, None] & jnp.ones(
            (n_sources,), bool)[None, :]
    return new_state, out


# ----------------------------------------------------------------------
# Two-rate serving: chunk-rate detection, event-rate localization
# ----------------------------------------------------------------------

def detect_step(
    state: StreamState,
    chunk: jnp.ndarray,  # [M, C]
    *,
    cfg: PipelineConfig,
    refractory: int = 0,
):
    """Detector-only streaming step (the cheap rate of the two-rate design).

    Advances the carried context / clocks / holdoff exactly like
    :func:`stream_step` but runs NO correlation, SRP or solve — it returns
    the captured frame and trigger metadata for a later event-rate
    localization pass (:meth:`TwoRateStreamingLocalizer.localize_triggered`).
    The reference analogue is the split between its 50 kHz sampling loop
    (sample_compute.h:62-99) and the compute burst it arms (:105-139)."""
    n = cfg.frame_size
    c_len = chunk.shape[-1]
    window, founds, t_rels, frames, trig_times, arm = _detect_and_capture(
        state, chunk, cfg=cfg, max_events=1, refractory=refractory)
    new_state = StreamState(
        context=window[:, -(n - 1):],
        ema_corr=state.ema_corr,
        best_shift=state.best_shift,
        time_s=state.time_s + c_len / cfg.sample_rate_hz,
        last_event_s=state.last_event_s,
        suppress=jnp.maximum(arm - c_len, 0).astype(jnp.int32),
        abs_sample=state.abs_sample + c_len,
        event_count=state.event_count,  # counted at localization time
    )
    out = {
        "triggered": founds[0],
        "frame": frames[0],  # [M, N] captured frame (valid iff triggered)
        "trig_time": trig_times[0],
        "trigger_abs": jnp.where(
            founds[0], state.abs_sample + (t_rels[0] - (n - 1)), -1),
    }
    return new_state, out


@dataclasses.dataclass(frozen=True)
class TwoRateStreamingLocalizer:
    """Batched multi-stream serving with split rates: detection every chunk
    for every stream (cheap: variance prefix sums only), localization only
    for streams that actually triggered, compacted into a fixed-capacity
    event batch.

    Acoustic events are sparse — at typical rates well under one event per
    stream per 10 ms chunk — so the dense :meth:`StreamingLocalizer.step_many`
    spends most of its time correlating silence.  Here:

        states, det = tr.detect_many(states, chunks)        # every chunk
        if host_any(det["triggered"]):                      # event rate
            states, ev = tr.localize_triggered(states, det)

    ``localize_triggered`` sorts triggered streams first (stable argsort on
    the mask — fixed shapes, no host round-trip needed), localizes the top
    ``event_capacity`` as one batch (condition -> GCC -> taper -> shift gate
    -> per-stream EMA merge -> SRP -> GN solve), and scatters the updated
    EMA state back.  Overflow beyond capacity is dropped and counted in the
    output (``overflow``), mirroring the dense path's events_dropped
    accounting.  Detection/holdoff semantics are identical to
    :func:`stream_step` (same ``_detect_and_capture``); only WHERE the
    burst runs differs."""

    pipeline: PipelineConfig
    grid: GridConfig
    solver: SolverConfig
    stream: StreamConfig
    params: localizer_mod.LocalizerParams
    srp_form: str
    event_capacity: int = 64
    with_solver: bool = True
    # also return beamformed per-event source audio ('audio' [E, N]) from
    # each accepted event's frame at its localized position (ops/beamform)
    with_audio: bool = False

    @classmethod
    def create(
        cls,
        mic_positions: np.ndarray,
        pipeline: PipelineConfig = PipelineConfig(),
        grid: GridConfig = GridConfig(),
        solver: SolverConfig = SolverConfig(),
        stream: StreamConfig = StreamConfig(),
        event_capacity: int = 64,
        with_solver: bool = True,
        with_audio: bool = False,
        **kwargs,
    ) -> "TwoRateStreamingLocalizer":
        base = localizer_mod.Localizer.create(
            mic_positions, pipeline, grid, solver, **kwargs)
        return cls(pipeline=pipeline, grid=grid, solver=solver, stream=stream,
                   params=base.params, srp_form=base.srp_form,
                   event_capacity=event_capacity, with_solver=with_solver,
                   with_audio=with_audio)

    def init_states(self, n_streams: int) -> StreamState:
        one = StreamingLocalizer(
            pipeline=self.pipeline, grid=self.grid, solver=self.solver,
            stream=self.stream, params=self.params, srp_form=self.srp_form,
        ).init_state()
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape).copy(), one)

    # -- chunk rate ----------------------------------------------------
    def detect_many(self, states: StreamState, chunks: jnp.ndarray):
        """states: stacked StreamState; chunks [S, M, C]."""
        return self._jitted_detect(states, chunks)

    @functools.cached_property
    def _jitted_detect(self):
        return jax.jit(
            jax.vmap(functools.partial(
                detect_step, cfg=self.pipeline,
                refractory=self.stream.refractory_samples)),
            donate_argnums=(0,),
        )

    # -- event rate ----------------------------------------------------
    def localize_triggered(self, states: StreamState, det: dict):
        """Localize the chunk's triggered streams (compacted to
        ``event_capacity``) and merge their EMA state.

        Returns (new_states, events dict with [E]-shaped fields):
        'stream_idx' (which stream each slot belongs to), 'accepted'
        (triggered AND passed the shift gate), 'xy' / 'xy_grid' /
        'tdoa_samples' / 'confidence' per slot, and scalar 'overflow'
        (triggered streams beyond capacity, dropped this chunk)."""
        return self._jitted_localize(
            states, det["triggered"], det["frame"], det["trig_time"])

    @functools.cached_property
    def _jitted_localize(self):
        return jax.jit(functools.partial(
            _localize_triggered,
            params=self.params, cfg=self.pipeline, grid_cfg=self.grid,
            solver_cfg=self.solver, srp_form=self.srp_form,
            capacity=self.event_capacity, with_solver=self.with_solver,
            with_audio=self.with_audio,
        ), donate_argnums=(0,))


def _localize_triggered(
    states: StreamState,
    triggered: jnp.ndarray,  # [S] bool
    frames: jnp.ndarray,  # [S, M, N]
    trig_times: jnp.ndarray,  # [S]
    *,
    params: localizer_mod.LocalizerParams,
    cfg: PipelineConfig,
    grid_cfg: GridConfig,
    solver_cfg: SolverConfig,
    srp_form: str,
    capacity: int,
    with_solver: bool,
    with_audio: bool = False,
):
    k = cfg.max_shift
    e = capacity
    # stable sort: triggered streams first, in stream order
    order = jnp.argsort(jnp.logical_not(triggered), stable=True)
    sel = order[:e]  # [E] stream indices
    m_sel = triggered[sel]  # [E]
    f_sel = frames[sel]  # [E, M, N]
    t_sel = trig_times[sel]  # [E]

    # event burst on the compact batch (same ops as stream_step's burst)
    x = localizer_mod.condition_frames(f_sel, params.window, cfg)
    corr = localizer_mod.correlate_frames(x, params, cfg)  # [E, P, L]
    shifts = xcorr.best_lag(corr, k)
    corr_t = (xcorr.peak_taper(corr, k, cfg.taper_denom, shifts)
              if cfg.taper_enabled else corr)
    gates = jnp.sum(shifts.astype(jnp.int32) ** 2, axis=-1) > cfg.shift_gate
    accepts = m_sel & gates  # [E]

    # per-stream EMA merge (dt from each stream's own last accepted event)
    ema_sel = states.ema_corr[sel]  # [E, P, L]
    dt = jnp.maximum(t_sel - states.last_event_s[sel], 0.0)
    decay = xcorr.ema_decay(dt, cfg.ema_tau_s)[:, None, None]
    ema_new = jnp.where(
        accepts[:, None, None],
        xcorr.ema_update(ema_sel, corr_t, decay), ema_sel)

    # localization on the merged correlograms (event-rate work)
    if srp_form == "matmul":
        scores = srp.srp_scores_matmul(ema_new, params.onehot, cfg.srp_dtype)
    else:
        scores = srp.srp_scores_gather(ema_new, params.lut_flat)
    xy_grid = srp.grid_peak_xy(
        scores, (grid_cfg.height, grid_cfg.width),
        (grid_cfg.half_cells_x, grid_cfg.half_cells_y),
        grid_cfg.cells_per_m)
    tdoa_samples, _ = xcorr.subsample_peak(ema_new, k)
    psr = xcorr.peak_confidence(corr, k)

    out = {
        "stream_idx": sel,
        "accepted": accepts,
        "triggered": m_sel,
        "event_shifts": shifts,
        "tdoa_samples": tdoa_samples,
        "xy_grid": xy_grid,
        "confidence": jnp.min(psr, axis=-1),
        # triggered streams beyond capacity are dropped this chunk
        "overflow": jnp.maximum(
            jnp.sum(triggered.astype(jnp.int32)) - e, 0),
    }
    if with_solver:
        tdoa_s = tdoa_samples / cfg.sample_rate_hz
        xy, rms = solver_ops.solve_tdoa_batched(
            tdoa_s, params.mic_positions, params.pairs,
            speed_of_sound=cfg.speed_of_sound_mps,
            height=grid_cfg.height_m,
            init_xy=xy_grid, cfg=solver_cfg)
        out["xy"] = xy
        out["rms_m"] = rms

    if with_audio:
        # beamformed source audio of each accepted event at its solved
        # (or grid) position — serving-side "what did it say"
        pos = out.get("xy", out["xy_grid"])
        delays = beamform.source_delays(
            pos, params.mic_positions, cfg, height=grid_cfg.height_m,
            constrain_sphere=solver_cfg.constrain_to_sphere)
        out["audio"] = beamform.extract_das(f_sel, delays, cfg)  # [E, N]

    # scatter the merged state back (unaccepted slots wrote ema_sel back
    # unchanged, so a plain scatter at sel is correct; sel has no dups)
    new_states = StreamState(
        context=states.context,
        ema_corr=states.ema_corr.at[sel].set(ema_new),
        best_shift=states.best_shift.at[sel].set(jnp.where(
            accepts[:, None], xcorr.best_lag(ema_new, k),
            states.best_shift[sel])),
        time_s=states.time_s,
        last_event_s=states.last_event_s.at[sel].set(
            jnp.where(accepts, t_sel, states.last_event_s[sel])),
        suppress=states.suppress,
        abs_sample=states.abs_sample,
        event_count=states.event_count.at[sel].add(
            accepts.astype(jnp.int32)),
    )
    return new_states, out
