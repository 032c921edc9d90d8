"""Multi-array fusion: spatially separated mic arrays scoring one world grid.

New capability with no reference equivalent (the firmware is a single 3-mic
triangle, ``src/components/vga/vga_heatmap.h``): K microphone arrays placed
anywhere in a shared world frame each compute their own pairwise GCC
correlograms, every array scores the SAME world-coordinate SRP grid through
its own steering matrix, and the per-array score maps are fused (weighted
sum) before the grid argmax.  A joint Gauss-Newton solve over ALL K*P
hyperbolic TDOA constraints then refines the peak — separated arrays give
the solve long baselines, fixing the range ambiguity a single compact array
has for distant sources.

Design notes (TPU-first):
- Array geometry only enters through the steering matrices and the solver;
  the correlogram stage is geometry-free, so frames [..., K, M, N] run the
  SAME fused Pallas / MXU-DFT kernels as the flagship localizer with the
  array axis folded into the batch.
- Per-array scoring + fusion is ONE einsum ``[..., K, P*L] x [K, P*L, G] ->
  [..., G]`` — MXU-shaped, no gathers.
- The array axis K is a natural mesh axis: ``parallel.spmd.make_fusion_spmd``
  shards arrays over ``model`` (each device holds only its arrays' steering
  matrices), psums the fused scores and all-gathers the TDOAs for the
  replicated joint solve.
- The world grid uses the planar projection and the solver runs
  unconstrained-plane mode: the reference's sphere-cap model
  (vga_heatmap.h:57-60) is centered on ONE array and meaningless for a
  multi-array world frame.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import GridConfig, PipelineConfig, SolverConfig
from ..core import geometry
from ..ops import solver as solver_ops
from ..ops import srp, window as window_ops, xcorr
from . import localizer as localizer_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusionParams:
    """Array-valued constants for the jitted fusion pipeline."""

    mic_world: jnp.ndarray   # [K, M, 2] world-frame mic positions
    pairs: jnp.ndarray       # [P, 2] per-array pair indices
    window: jnp.ndarray      # [N]
    onehot: jnp.ndarray      # [K, P*L, G] per-array steering matrices
    cat_mics: jnp.ndarray    # [K*M, 2] concatenated mics (joint solve)
    cat_pairs: jnp.ndarray   # [K*P, 2] pair indices into cat_mics
    cross_pairs: jnp.ndarray  # [Pc, 2] cross-array pairs into cat_mics
    mic_array_id: jnp.ndarray  # [K*M] array index per concatenated mic


@dataclasses.dataclass(frozen=True)
class ArrayFusionLocalizer:
    """Configured, jit-compiled multi-array fusion localizer.

    >>> fus = ArrayFusionLocalizer.create([mics_a, mics_b])
    >>> out = fus(frames)            # frames [B, K, M, N]
    >>> out["xy"]                    # [B, 2] world-frame positions
    """

    pipeline: PipelineConfig
    grid: GridConfig
    solver: SolverConfig
    params: FusionParams
    with_solver: bool = True
    # lag window covering the WORLD aperture (cross-array baselines) for
    # the sync solve's cross correlograms; intra scoring keeps cfg.max_shift
    sync_max_shift: int = 0

    @classmethod
    def create(
        cls,
        arrays: Sequence[np.ndarray],
        pipeline: PipelineConfig = PipelineConfig(),
        grid: Optional[GridConfig] = None,
        solver: Optional[SolverConfig] = None,
        *,
        with_solver: bool = True,
        dtype=jnp.float32,
    ) -> "ArrayFusionLocalizer":
        """``arrays``: K mic arrays [M, 2] in WORLD coordinates (equal M so
        the array axis batches; pad a smaller array by duplicating a mic if
        needed — duplicate pairs contribute zero-lag constraints only to
        their own array).  Grid/solver default to the planar world model."""
        arrays = [np.asarray(a, np.float32) for a in arrays]
        m = arrays[0].shape[0]
        if any(a.shape != (m, 2) for a in arrays):
            raise ValueError(
                "all arrays must share shape [M, 2]; got "
                f"{[a.shape for a in arrays]}")
        if grid is None:
            grid = GridConfig(projection="plane")
        elif grid.projection != "plane":
            raise ValueError(
                "multi-array fusion needs GridConfig(projection='plane'): "
                "the sphere projection is centered on a single array")
        if solver is None:
            solver = SolverConfig(constrain_to_sphere=False)
        elif solver.constrain_to_sphere:
            raise ValueError(
                "multi-array fusion needs "
                "SolverConfig(constrain_to_sphere=False)")

        k = len(arrays)
        pairs = geometry.mic_pairs(m)
        onehots = []
        for a in arrays:
            lut = geometry.lag_lut(grid, a, pairs, pipeline)
            onehots.append(geometry.lag_onehot(lut, pipeline.num_lags))
        cat_mics = np.concatenate(arrays, axis=0)  # [K*M, 2]
        cat_pairs = np.concatenate(
            [pairs + i * m for i in range(k)], axis=0)  # [K*P, 2]
        # cross-array pairs (for the sync solve): every mic pair spanning
        # two different arrays
        aid = np.repeat(np.arange(k), m)  # [K*M]
        ii, jj = np.triu_indices(k * m, 1)
        cross = np.stack([ii, jj], axis=-1)[aid[ii] != aid[jj]]
        win = window_ops.window_for(pipeline)
        params = FusionParams(
            mic_world=jnp.asarray(np.stack(arrays)),
            pairs=jnp.asarray(pairs),
            window=jnp.asarray(win, dtype=dtype),
            onehot=jnp.asarray(np.stack(onehots), dtype=dtype),
            cat_mics=jnp.asarray(cat_mics),
            cat_pairs=jnp.asarray(cat_pairs),
            cross_pairs=jnp.asarray(cross.astype(np.int32)),
            mic_array_id=jnp.asarray(aid.astype(np.int32)),
        )
        return cls(pipeline=pipeline, grid=grid, solver=solver,
                   params=params, with_solver=with_solver,
                   sync_max_shift=geometry.max_lag_for_array(
                       cat_mics, pipeline))

    # ------------------------------------------------------------------
    @property
    def n_arrays(self) -> int:
        return int(self.params.mic_world.shape[0])

    def __call__(self, frames: jnp.ndarray,
                 weights: jnp.ndarray | None = None) -> dict:
        """frames [..., K, M, N]; optional per-array ``weights`` [K]
        (e.g. zero out a faulted array, or de-rate a distant one)."""
        k, m = self.params.mic_world.shape[:2]
        n = self.pipeline.frame_size
        if frames.ndim < 3 or frames.shape[-3:] != (k, m, n):
            raise ValueError(
                f"frames must be [..., {k} arrays, {m} mics, {n} samples]; "
                f"got {frames.shape}")
        w = (jnp.ones((k,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        return self._jitted(self.params, frames, w)

    @functools.cached_property
    def _jitted(self):
        return jax.jit(
            functools.partial(
                fuse_frames,
                cfg=self.pipeline,
                grid_cfg=self.grid,
                solver_cfg=self.solver,
                with_solver=self.with_solver,
                pairs_static=tuple(
                    tuple(int(v) for v in row)
                    for row in np.asarray(self.params.pairs)),
            )
        )

    def localize_sync(self, frames: jnp.ndarray,
                      weights: jnp.ndarray | None = None,
                      event_times_s: jnp.ndarray | None = None) -> dict:
        """Joint localization + clock synchronization over an EVENT BATCH.

        frames [E, K, M, N]: E events captured by K free-running (mutually
        unsynchronized) arrays.  Cross-array TDOAs carry the unknown
        per-array clock offsets; all E positions and the K-1 shared offsets
        (array 0 = time reference) are solved jointly
        (ops.solver.solve_tdoa_sync).  More events pin the offsets harder.
        With ``event_times_s`` [E] (capture timestamps), per-array clock
        DRIFT rates are estimated too (offset + skew model — free-running
        crystals drift tens of samples per minute).
        Returns the intra-only outputs plus 'xy_sync' [E, 2],
        'clock_offsets_s' [K-1], 'sync_rms_m' [E], 'tdoa_cross' [E, Pc]
        (+ 'clock_drift' [K-1] seconds/second when times are given)."""
        k, m = self.params.mic_world.shape[:2]
        n = self.pipeline.frame_size
        if frames.ndim != 4 or frames.shape[-3:] != (k, m, n):
            raise ValueError(
                f"localize_sync wants frames [E, {k} arrays, {m} mics, "
                f"{n} samples]; got {frames.shape}")
        w = (jnp.ones((k,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        times = (None if event_times_s is None
                 else jnp.asarray(event_times_s, jnp.float32))
        # None vs array retraces the same jitted callable (two cache
        # entries: offset-only and offset+drift)
        return self._jitted_sync(self.params, frames, w, times)

    @functools.cached_property
    def _jitted_sync(self):
        return jax.jit(
            functools.partial(
                fuse_frames_sync,
                cfg=self.pipeline,
                grid_cfg=self.grid,
                solver_cfg=self.solver,
                sync_max_shift=self.sync_max_shift,
                pairs_static=tuple(
                    tuple(int(v) for v in row)
                    for row in np.asarray(self.params.pairs)),
            )
        )


# ----------------------------------------------------------------------
# Functional pipeline (pure; jit/pjit-able)
# ----------------------------------------------------------------------

def fusion_correlograms(
    params: FusionParams, frames: jnp.ndarray, cfg: PipelineConfig,
    pairs_static: tuple | None = None,
):
    """frames [..., K, M, N] -> (corr_t [..., K, P, L], shifts, tdoa, psr).

    The array axis rides the batch through the shared GCC kernels."""
    loc_params = localizer_mod.LocalizerParams(
        mic_positions=jnp.zeros((0, 2), jnp.float32),
        pairs=params.pairs, window=params.window,
        lut_flat=jnp.zeros((params.pairs.shape[0], 1), jnp.int32),
        onehot=None, score_bias=None)
    corr = localizer_mod._conditioned_correlograms(
        loc_params, frames, cfg, pairs_static)  # [..., K, P, L]
    kk = cfg.max_shift
    shifts = xcorr.best_lag(corr, kk)
    tdoa, _ = xcorr.subsample_peak(corr, kk)
    if not cfg.subsample_peak:
        tdoa = shifts.astype(corr.dtype)
    psr = xcorr.peak_confidence(corr, kk)
    corr_t = (xcorr.peak_taper(corr, kk, cfg.taper_denom, shifts)
              if cfg.taper_enabled else corr)
    return corr_t, shifts, tdoa, psr


def fused_scores(corr_t: jnp.ndarray, onehot: jnp.ndarray,
                 weights: jnp.ndarray, dtype: str = "float32") -> jnp.ndarray:
    """Weighted-sum fusion of per-array SRP maps in one contraction:
    corr_t [..., K, P, L] x onehot [K, P*L, G] -> [..., G]."""
    *lead, k, p, l = corr_t.shape
    flat = corr_t.reshape(*lead, k, p * l) * weights[:, None]
    if dtype == "bfloat16":
        return jnp.einsum(
            "...kf,kfg->...g", flat.astype(jnp.bfloat16),
            onehot.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
    return jnp.einsum("...kf,kfg->...g", flat, onehot)


def fuse_frames(
    params: FusionParams,
    frames: jnp.ndarray,
    weights: jnp.ndarray,
    *,
    cfg: PipelineConfig,
    grid_cfg: GridConfig,
    solver_cfg: SolverConfig,
    with_solver: bool = True,
    pairs_static: tuple | None = None,
) -> dict:
    """Full fusion pipeline on frames [..., K, M, N].  Returns:

    - 'tdoa_samples' [..., K, P]: per-array sub-sample TDOAs
    - 'scores'       [..., G]: fused world-grid SRP scores
    - 'xy_grid'      [..., 2]: fused grid peak (meters, world frame)
    - 'xy'           [..., 2]: joint Gauss-Newton refined position
    - 'rms_m'        [...]: joint solve residual (meters)
    - 'xy_cov'       [..., 2, 2]: position covariance at the solution
    - 'confidence'   [..., K]: per-array weakest-pair peak-to-sidelobe
    """
    corr_t, shifts, tdoa, psr = fusion_correlograms(
        params, frames, cfg, pairs_static)

    scores = fused_scores(corr_t, params.onehot, weights, cfg.srp_dtype)
    refine = (grid_cfg.refine_peak == "on"
              or (grid_cfg.refine_peak == "auto" and not with_solver))
    xy_grid = srp.grid_peak_xy(
        scores, (grid_cfg.height, grid_cfg.width),
        (grid_cfg.half_cells_x, grid_cfg.half_cells_y),
        grid_cfg.cells_per_m, refine=refine)

    out = {
        "tdoa_samples": tdoa,
        "best_shift": shifts,
        "scores": scores,
        "xy_grid": xy_grid,
        "confidence": jnp.min(psr, axis=-1),
    }
    if with_solver:
        *lead, k, p = tdoa.shape
        tdoa_s = tdoa.reshape(*lead, k * p) / cfg.sample_rate_hz
        pair_w = jnp.repeat(weights, p)  # [K*P]
        xy, rms = solver_ops.solve_tdoa_batched(
            tdoa_s, params.cat_mics, params.cat_pairs,
            speed_of_sound=cfg.speed_of_sound_mps,
            height=grid_cfg.height_m, init_xy=xy_grid,
            weights=pair_w, cfg=solver_cfg)
        out["xy"] = xy
        out["rms_m"] = rms
        out["xy_cov"] = solver_ops.solution_covariance(
            xy, rms, params.cat_mics, params.cat_pairs,
            height=grid_cfg.height_m, cfg=solver_cfg)
    else:
        out["xy"] = xy_grid
        out["rms_m"] = jnp.zeros(tdoa.shape[:-2], corr_t.dtype)
    return out


def cross_array_tdoas(
    params: FusionParams,
    frames: jnp.ndarray,
    cfg: PipelineConfig,
    sync_max_shift: int,
) -> jnp.ndarray:
    """Sub-sample TDOAs [..., Pc] for the cross-array pairs.

    Cross-array baselines exceed any single array's aperture, so these
    correlograms use their own lag window (``sync_max_shift``, derived
    from the WORLD mic set) on the XLA-FFT path — the intra-array hot
    paths are untouched."""
    *lead, k, m, n = frames.shape
    flat = frames.reshape(*lead, k * m, n)
    cfg_sync = dataclasses.replace(
        cfg, max_shift_samples=sync_max_shift,
        # band_crop/fused dials are tuned for the intra lag budget; the
        # plain FFT path is correct for any lag window.  The DPSS window
        # is DISABLED here: cross-array delays reach hundreds of samples,
        # so the transient sits far off-center in one frame of the pair
        # and the taper's asymmetric attenuation biases the peak by
        # ~0.3 samples (measured) — the window's purposes (reference
        # parity, spectral control at short lags) don't apply to
        # long-baseline pairs.  The transform length must also grow with
        # the cross-array lag window: an inherited pinned fft_size or
        # 'circular' pad mode would alias lag +s with -(N-s) at the
        # hundreds-of-samples delays cross pairs see, silently biasing
        # tdoa_cross — force linear padding sized from sync_max_shift.
        window_enabled=False, fft_size=None, fft_pad_mode="linear")
    cond = localizer_mod.condition_frames(flat, params.window, cfg_sync)
    corr = xcorr.xcorr_fft(cond, params.cross_pairs, cfg_sync)
    tdoa, _ = xcorr.subsample_peak(corr, sync_max_shift)
    if not cfg.subsample_peak:
        tdoa = xcorr.best_lag(corr, sync_max_shift).astype(corr.dtype)
    return tdoa


def fuse_frames_sync(
    params: FusionParams,
    frames: jnp.ndarray,
    weights: jnp.ndarray,
    event_times_s: jnp.ndarray | None = None,
    *,
    cfg: PipelineConfig,
    grid_cfg: GridConfig,
    solver_cfg: SolverConfig,
    sync_max_shift: int,
    pairs_static: tuple | None = None,
) -> dict:
    """Fusion with UNSYNCHRONIZED arrays: intra-array pipeline (offset-free
    by construction — a pair inside one array shares its clock) seeds a
    joint solve over all events' positions plus the K-1 inter-array clock
    offsets, with the cross-array TDOA pairs supplying both the offsets'
    observability and long-baseline range information.

    frames [E, K, M, N] (one leading event axis; the offsets are shared
    across it).  See ArrayFusionLocalizer.localize_sync.
    """
    out = fuse_frames(params, frames, weights,
                      cfg=cfg, grid_cfg=grid_cfg, solver_cfg=solver_cfg,
                      with_solver=True, pairs_static=pairs_static)
    tdoa_cross = cross_array_tdoas(
        params, frames, cfg, sync_max_shift)  # [E, Pc]
    out["tdoa_cross"] = tdoa_cross

    e, k, p = out["tdoa_samples"].shape
    fs = cfg.sample_rate_hz
    tdoa_all = jnp.concatenate(
        [out["tdoa_samples"].reshape(e, k * p) / fs,
         tdoa_cross / fs], axis=-1)  # [E, KP + Pc]
    pairs_all = jnp.concatenate(
        [params.cat_pairs, params.cross_pairs], axis=0)
    # per-pair weights: intra pairs inherit their array's weight; a cross
    # pair gets the geometric mean of its two arrays'
    aid = params.mic_array_id
    w_intra = jnp.repeat(weights, p)
    w_cross = jnp.sqrt(
        jnp.take(weights, jnp.take(aid, params.cross_pairs[:, 0]))
        * jnp.take(weights, jnp.take(aid, params.cross_pairs[:, 1])))
    w_all = jnp.concatenate([w_intra, w_cross])

    res = solver_ops.solve_tdoa_sync(
        tdoa_all, params.cat_mics, pairs_all,
        aid, int(params.mic_world.shape[0]),
        speed_of_sound=cfg.speed_of_sound_mps,
        height=grid_cfg.height_m,
        init_xy=out["xy"],
        weights=w_all,
        event_times_s=event_times_s,
        iterations=solver_cfg.iterations + 4,
        damping=solver_cfg.damping)
    if event_times_s is None:
        xy_sync, offsets, rms = res
    else:
        xy_sync, offsets, drift, rms = res
        out["clock_drift"] = drift
    out["xy_sync"] = xy_sync
    out["clock_offsets_s"] = offsets
    out["sync_rms_m"] = rms
    return out


# ----------------------------------------------------------------------
# Inter-array extrinsic registration (new capability)
# ----------------------------------------------------------------------

def register_arrays(
    local_xy: jnp.ndarray,
    *,
    anchor: int = 0,
    weights: jnp.ndarray | None = None,
) -> dict:
    """Rigid registration of K arrays from jointly observed events.

    Deployment problem the reference never faces (single fixed array):
    K independently placed arrays each localize the SAME E events in
    their own local frames; recover each array's pose (rotation +
    translation, no scale — geometry is metric) into the ``anchor``
    array's frame.  Closed-form weighted Kabsch/Umeyama: one SVD of the
    d x d weighted cross-covariance per array, batched over K.

    local_xy [K, E, d] (d = 2 or 3): per-array local-frame event fixes.
    Match events across arrays before calling (with synchronized streams
    the trigger timestamps align them).  weights [K, E] (optional):
    per-array per-event confidence; 0 drops an event for that array
    (e.g. not detected there).  Effective weight of event e for array k
    is ``weights[k, e] * weights[anchor, e]`` — an event unseen by the
    anchor constrains nothing.

    Returns dict of arrays:
      'rot'   [K, d, d] — proper rotations (det +1; reflections are
              rejected via the Kabsch sign fix)
      'trans' [K, d]
      'rms'   [K] — post-alignment residual against the anchor's fixes
    with world = rot @ local + trans; the anchor's transform is the
    identity.  At least 2 well-separated (3 for d=3, non-collinear)
    events are needed per array for a unique pose.
    """
    local_xy = jnp.asarray(local_xy, jnp.float32)
    k, e, d = local_xy.shape
    if weights is None:
        weights = jnp.ones((k, e), jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)
    w = weights * weights[anchor][None, :]          # [K, E]
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    wn = w / wsum                                   # normalized weights

    b = local_xy[anchor]                            # [E, d] target frame
    a_bar = jnp.einsum("ke,ked->kd", wn, local_xy)  # [K, d]
    b_bar = jnp.einsum("ke,ed->kd", wn, b)          # [K, d]
    a_c = local_xy - a_bar[:, None, :]
    b_c = b[None] - b_bar[:, None, :]
    h = jnp.einsum("ke,ked,kef->kdf", wn, a_c, b_c)  # [K, d, d]
    u, _, vt = jnp.linalg.svd(h)
    # proper rotation: flip the last singular direction if det < 0
    det = jnp.linalg.det(jnp.einsum("kij,kjl->kil",
                                    jnp.swapaxes(vt, -1, -2),
                                    jnp.swapaxes(u, -1, -2)))
    signs = jnp.concatenate(
        [jnp.ones((k, d - 1), jnp.float32), det[:, None]], axis=1)
    rot = jnp.einsum("kji,kj,kjl->kil", vt, signs, jnp.swapaxes(u, -1, -2))
    trans = b_bar - jnp.einsum("kij,kj->ki", rot, a_bar)
    fit = jnp.einsum("kij,kej->kei", rot, local_xy) + trans[:, None, :]
    rms = jnp.sqrt(jnp.einsum("ke,ke->k", wn,
                              jnp.sum((fit - b[None]) ** 2, axis=-1)))
    return {"rot": rot, "trans": trans, "rms": rms}


def registered_arrays(
    local_arrays: Sequence[np.ndarray], reg: dict
) -> list[np.ndarray]:
    """Apply a :func:`register_arrays` result to each array's LOCAL mic
    coordinates, returning world-frame arrays ready for
    :meth:`ArrayFusionLocalizer.create`."""
    rot = np.asarray(reg["rot"])
    trans = np.asarray(reg["trans"])
    return [np.asarray(a, np.float32) @ rot[i].T + trans[i]
            for i, a in enumerate(local_arrays)]
