"""Flagship frame-batch localizer: the end-to-end jitted pipeline.

Maps a batch of multi-channel PCM frames to TDOAs and source positions:

    frames [B, M, N] -> condition -> window -> GCC(-PHAT) -> taper ->
    SRP grid scores -> grid peak -> Gauss-Newton refine -> xy [B, 2]

This is the TPU re-expression of the reference's per-event burst
(``src/sample_compute.h:105-139`` + ``vga_heatmap.h:95-133``): what the
firmware does once per acoustic event on 3 mics, this does for thousands of
frames and arbitrary arrays in one XLA program, entirely HBM-resident.

An integer path (``localize_frames_int``) reproduces the reference's
fixed-point semantics bit-for-bit for validation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import GridConfig, PipelineConfig, SolverConfig
from ..core import geometry
from ..ops import conditioning, mxu_fft, srp, solver as solver_ops
from ..ops import window as window_ops, xcorr


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LocalizerParams:
    """Array-valued constants consumed by the jitted pipeline."""

    mic_positions: jnp.ndarray  # [M, 2] float32
    pairs: jnp.ndarray  # [P, 2] int32
    window: jnp.ndarray  # [N] float32
    lut_flat: jnp.ndarray  # [P, G+] int32 lag indices
    onehot: Optional[jnp.ndarray]  # [P*L, G+] float32 or None (gather form)
    # additive bias [G+] masking grid-axis padding (None when unpadded);
    # padding lets the grid axis shard evenly over a mesh axis
    score_bias: Optional[jnp.ndarray] = None
    # steering matrix with the lag axis zero-padded to the fused kernel's
    # 128-lane boundary ([P*L_pad, G+]): lets the kernel's bf16 SRP output
    # feed the scoring matmul with a FREE reshape — no slice/cast/copy
    # chain between the kernel and the MXU (19% of device time in the
    # r3 headline trace).  None -> derived by padding `onehot` at trace
    # time (paths that rebuild params, e.g. sharded, stay compatible).
    onehot_pad: Optional[jnp.ndarray] = None
    # large-array precomputed steering matrix [P*L8, G] (bf16/f32, zero
    # rows at lag padding): scoring = ONE HBM-streamed MXU contraction
    # instead of the blocked per-chunk one-hot scan (ops.srp
    # big_onehot_device; r3 config-5b: 14.7 -> ~10 ms device per 256
    # frames).  Built at create when it fits
    # PipelineConfig.srp_big_matmul_budget_bytes; None elsewhere.
    onehot_big: Optional[jnp.ndarray] = None


# Opt-in instance memoization for Localizer.create / StreamingLocalizer.
# create (env ATRT_SHARE_LOCALIZERS=1): identical (mics, configs, kwargs)
# return the SAME instance, so its cached_property jits — and their traced
# programs — are shared.  Instances are immutable (frozen dataclasses,
# params used read-only), so sharing is safe; it is opt-in because a
# long-lived cache pins params arrays in memory.  The test suite enables
# it (tests/conftest.py): re-tracing near-identical pipelines across files
# was a measurable slice of the wall clock.
_CREATE_CACHE: dict = {}
_CREATE_STATS = {"hits": 0, "misses": 0}


def _memo_create(key, build):
    import os

    if not os.environ.get("ATRT_SHARE_LOCALIZERS"):
        return build()
    hit = _CREATE_CACHE.get(key)
    if hit is None:
        _CREATE_STATS["misses"] += 1
        hit = _CREATE_CACHE[key] = build()
    else:
        _CREATE_STATS["hits"] += 1
    return hit


@dataclasses.dataclass(frozen=True)
class Localizer:
    """Configured, jit-compiled frame-batch localizer.

    >>> loc = Localizer.create(mic_positions)
    >>> out = loc(frames)           # frames [B, M, N]
    >>> out["xy"]                   # [B, 2] source positions (meters)
    """

    pipeline: PipelineConfig
    grid: GridConfig
    solver: SolverConfig
    params: LocalizerParams
    srp_form: str  # 'matmul' | 'gather'
    with_solver: bool = True
    with_heatmap: bool = False

    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        mic_positions: np.ndarray,
        pipeline: PipelineConfig = PipelineConfig(),
        grid: GridConfig = GridConfig(),
        solver: SolverConfig = SolverConfig(),
        *,
        srp_form: str = "auto",
        with_solver: bool = True,
        with_heatmap: bool = False,
        init_grid_stride: int = 1,
        dtype=jnp.float32,
    ) -> "Localizer":
        """``init_grid_stride`` > 1 coarsens the SRP grid by that factor
        (e.g. 3 -> 33x33 cells instead of 101x101, ~9x less scoring work).
        The Gauss-Newton solver only needs a basin-accurate init — the SRP
        peak blob spans many cells at the reference taper width — so the
        refined ``xy`` is unchanged while the scoring matmul, the largest
        non-kernel stage, shrinks ~stride^2-fold (tested: sub-mm agreement
        with stride 1).  Requires with_solver and no heatmap, since
        'scores'/'xy_grid'/'heat_levels' would be on the coarse grid."""
        if init_grid_stride > 1:
            if with_heatmap or not with_solver:
                raise ValueError(
                    "init_grid_stride > 1 needs with_solver=True and "
                    "with_heatmap=False (grid outputs would be coarse)")
            s = init_grid_stride
            grid = dataclasses.replace(
                grid,
                half_cells_x=grid.half_cells_x // s,
                half_cells_y=grid.half_cells_y // s,
                cells_per_m=grid.cells_per_m / s,
            )
        mic_positions = np.asarray(mic_positions, dtype=np.float32)
        key = (cls, mic_positions.tobytes(), mic_positions.shape, pipeline,
               grid, solver, srp_form, with_solver, with_heatmap, str(dtype))
        return _memo_create(key, lambda: cls._build(
            mic_positions, pipeline, grid, solver, srp_form=srp_form,
            with_solver=with_solver, with_heatmap=with_heatmap,
            dtype=dtype))

    @classmethod
    def _build(
        cls,
        mic_positions: np.ndarray,
        pipeline: PipelineConfig,
        grid: GridConfig,
        solver: SolverConfig,
        *,
        srp_form: str,
        with_solver: bool,
        with_heatmap: bool,
        dtype,
    ) -> "Localizer":
        pairs = geometry.mic_pairs(mic_positions.shape[0])
        lut = geometry.lag_lut(grid, mic_positions, pairs, pipeline)  # [P,H,W]
        lut_flat = lut.reshape(lut.shape[0], -1)
        if srp_form == "auto":
            srp_form = srp.auto_srp_form(
                pairs.shape[0], pipeline.num_lags, grid.num_cells
            )
        onehot = None
        onehot_pad = None
        if srp_form == "matmul":
            oh = geometry.lag_onehot(lut, pipeline.num_lags)
            onehot = jnp.asarray(oh, dtype=dtype)
            # lag axis padded to the fused kernel's 128-lane boundary (zero
            # rows): the kernel's bf16 SRP output reshapes into this for
            # free (see LocalizerParams.onehot_pad)
            l_pad = -(-pipeline.num_lags // 128) * 128
            if l_pad != pipeline.num_lags:
                p_n, g_n = pairs.shape[0], oh.shape[-1]
                ohp = np.zeros((p_n, l_pad, g_n), oh.dtype)
                ohp[:, : pipeline.num_lags] = oh.reshape(
                    p_n, pipeline.num_lags, g_n)
                onehot_pad = jnp.asarray(
                    ohp.reshape(p_n * l_pad, g_n), dtype=dtype)
            else:
                onehot_pad = onehot
        onehot_big = None
        if (srp_form != "matmul" and pairs.shape[0] > 256
                and pipeline.srp_big_matmul_budget_bytes > 0):
            # large-array fast path: precompute the steering matrix when
            # it fits the HBM budget (see LocalizerParams.onehot_big).
            # >256 pairs mirrors the blocked-scan default, so this only
            # ever replaces the (already matmul-form) blocked path —
            # small explicit-gather configs keep exact gather semantics
            l8 = srp.sublane_pad_lags(pipeline.num_lags)
            itemsize = 2 if pipeline.srp_dtype == "bfloat16" else 4
            if (pairs.shape[0] * l8 * grid.num_cells * itemsize
                    <= pipeline.srp_big_matmul_budget_bytes):
                onehot_big = srp.big_onehot_device(
                    jnp.asarray(lut_flat), pipeline.num_lags,
                    pipeline.srp_dtype)
        win = window_ops.window_for(pipeline)
        params = LocalizerParams(
            mic_positions=jnp.asarray(mic_positions),
            pairs=jnp.asarray(pairs),
            window=jnp.asarray(win, dtype=dtype),
            lut_flat=jnp.asarray(lut_flat),
            onehot=onehot,
            score_bias=None,
            onehot_pad=onehot_pad,
            onehot_big=onehot_big,
        )
        return cls(
            pipeline=pipeline, grid=grid, solver=solver, params=params,
            srp_form=srp_form, with_solver=with_solver,
            with_heatmap=with_heatmap,
        )

    # ------------------------------------------------------------------
    def __call__(self, frames: jnp.ndarray) -> dict:
        m = self.params.mic_positions.shape[0]
        n = self.pipeline.frame_size
        if frames.ndim < 2 or frames.shape[-2] != m or frames.shape[-1] != n:
            raise ValueError(
                f"frames must be [..., {m} mics, {n} samples]; "
                f"got {frames.shape}")
        return self._jitted(self.params, frames)

    @functools.cached_property
    def _jitted(self):
        return jax.jit(
            functools.partial(
                localize_frames,
                cfg=self.pipeline,
                grid_cfg=self.grid,
                solver_cfg=self.solver,
                srp_form=self.srp_form,
                with_solver=self.with_solver,
                with_heatmap=self.with_heatmap,
                pairs_static=tuple(
                    tuple(int(v) for v in row)
                    for row in np.asarray(self.params.pairs)),
                mics_static=tuple(
                    tuple(float(v) for v in row)
                    for row in np.asarray(self.params.mic_positions)),
            )
        )

    def save(self, path: str) -> str:
        """Persist this localizer's EXACT configuration to a small JSON
        file (every derived tensor — window, LUTs, steering matrices — is
        deterministic from it, so nothing else needs saving).  A deployed
        service reconstructs the identical pipeline with
        :meth:`Localizer.load`."""
        import dataclasses as dc
        import json

        blob = {
            "format": "audio_triangulation_tpu.Localizer/1",
            "pipeline": dc.asdict(self.pipeline),
            "grid": dc.asdict(self.grid),
            "solver": dc.asdict(self.solver),
            "srp_form": self.srp_form,
            "with_solver": self.with_solver,
            "with_heatmap": self.with_heatmap,
            "mic_positions": np.asarray(
                self.params.mic_positions).tolist(),
        }
        if not path.endswith(".json"):
            path = path + ".json"
        with open(path, "w") as f:
            json.dump(blob, f, indent=1)
        return path

    @classmethod
    def load(cls, path: str) -> "Localizer":
        """Reconstruct a localizer saved by :meth:`save`: numerically
        identical outputs (tested).  The stored grid already reflects any
        init_grid_stride coarsening, so it is used verbatim."""
        import json

        from ..core.config import GridConfig, PipelineConfig, SolverConfig

        if not path.endswith(".json"):
            path = path + ".json"
        with open(path) as f:
            blob = json.load(f)
        fmt = blob.get("format", "")
        if not fmt.startswith("audio_triangulation_tpu.Localizer/"):
            raise ValueError(f"not a saved Localizer: {path} ({fmt!r})")

        def detuple(d):
            # JSON round-trips tuples as lists; config fields are never
            # real lists (frozen dataclasses must stay hashable — e.g.
            # band_hz=(lo, hi) as a list would crash the fused-kernel
            # dispatch, whose jit declares cfg static)
            return {k: tuple(v) if isinstance(v, list) else v
                    for k, v in d.items()}

        return cls.create(
            np.asarray(blob["mic_positions"], np.float32),
            PipelineConfig(**detuple(blob["pipeline"])),
            GridConfig(**detuple(blob["grid"])),
            SolverConfig(**detuple(blob["solver"])),
            srp_form=blob["srp_form"],
            with_solver=blob["with_solver"],
            with_heatmap=blob["with_heatmap"],
        )

    def lower(self, frames):
        """jax.jit lowering handle (for AOT compile / inspection)."""
        return self._jitted.lower(self.params, frames)

    def localize_multi(
        self,
        frames: jnp.ndarray,
        n_sources: int = 2,
        *,
        min_separation_m: float = 0.4,
        assoc_window_samples: float = 3.0,
    ) -> dict:
        """Resolve up to ``n_sources`` SIMULTANEOUS sources per frame
        (cm-level, like the single-source path): SRP top-K peaks ->
        per-source TDOA disambiguation near each peak's predicted lags ->
        per-source Gauss-Newton refine.  See :func:`localize_frames_multi`
        for the output dict ('xy' is [..., n_sources, 2], strongest
        first; 'source_score' ranks/validates the slots)."""
        m = self.params.mic_positions.shape[0]
        n = self.pipeline.frame_size
        if frames.ndim < 2 or frames.shape[-2] != m or frames.shape[-1] != n:
            raise ValueError(
                f"frames must be [..., {m} mics, {n} samples]; "
                f"got {frames.shape}")
        fn = self._jitted_multi(
            n_sources, float(min_separation_m), float(assoc_window_samples))
        return fn(self.params, frames)

    @functools.cached_property
    def _multi_cache(self) -> dict:
        # per-instance jit cache keyed by the static multi-source knobs
        # (lru_cache can't be used: params holds unhashable arrays)
        return {}

    def _jitted_multi(self, n_sources, min_separation_m,
                      assoc_window_samples):
        key = (n_sources, min_separation_m, assoc_window_samples)
        fn = self._multi_cache.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    localize_frames_multi,
                    cfg=self.pipeline,
                    grid_cfg=self.grid,
                    solver_cfg=self.solver,
                    srp_form=self.srp_form,
                    n_sources=n_sources,
                    min_separation_m=min_separation_m,
                    assoc_window_samples=assoc_window_samples,
                    pairs_static=tuple(
                        tuple(int(v) for v in row)
                        for row in np.asarray(self.params.pairs)),
                )
            )
            self._multi_cache[key] = fn
        return fn

    def localize_moving(self, frames: jnp.ndarray, *, v_max: float = 8.0,
                        n_scales: int = 33) -> dict:
        """Position + instantaneous VELOCITY for moving sources.

        Runs the standard pipeline, then the delay-Doppler
        cross-ambiguity (ops.caf) on the same frames: adds 'velocity'
        ([..., 2] m/s for coplanar arrays — in-plane, matching the grid
        model — or [..., 3] for non-coplanar), 'pair_rel_speed' /
        'alpha' [..., P], and 'tdoa_doppler' [..., P] (the de-smeared
        best-scale TDOAs).  One frame, no tracker; see ops.caf for
        scale-grid sizing (default 33 ~ 0.5 m/s steps at v_max=8)."""
        if not self.with_solver:
            raise ValueError("localize_moving needs with_solver=True "
                             "(the velocity model linearizes at the "
                             "refined position)")
        out = dict(self(frames))
        fn, resample = self._jitted_moving(float(v_max), int(n_scales))
        out.update(fn(self.params, frames, out["xy"], resample))
        return out

    @functools.cached_property
    def _moving_cache(self) -> dict:
        return {}

    def _jitted_moving(self, v_max, n_scales):
        key = (v_max, n_scales)
        fn = self._moving_cache.get(key)
        if fn is None:
            from ..ops import caf as caf_ops

            pairs_np = np.asarray(self.params.pairs)
            mics_np = np.asarray(self.params.mic_positions)
            mic3 = np.zeros((mics_np.shape[0], 3), np.float32)
            mic3[:, : mics_np.shape[1]] = mics_np
            coplanar = bool(np.ptp(mic3[:, 2]) < 1e-6)
            cfg, height = self.pipeline, self.grid.height_m
            # resample matrices ride as a jit ARGUMENT (138 MB at 33
            # scales; a closure constant would oversize the compile
            # payload — the PERFORMANCE.md jit-closure footgun)
            resample = caf_ops.precompute_resample(
                cfg.frame_size, v_max, n_scales, cfg.speed_of_sound_mps,
                cfg=cfg)

            def tail(params, frames, xy, resample):
                dd = caf_ops.estimate_delay_doppler(
                    frames, params.window, pairs_np, cfg,
                    v_max=v_max, n_scales=n_scales, resample=resample)
                pos3 = jnp.concatenate(
                    [xy, jnp.full(xy.shape[:-1] + (1,), height, xy.dtype)],
                    axis=-1)
                vel = caf_ops.solve_velocity(
                    pos3, dd["pair_rel_speed"], jnp.asarray(mic3),
                    jnp.asarray(pairs_np), in_plane=coplanar)
                return {"velocity": vel,
                        "pair_rel_speed": dd["pair_rel_speed"],
                        "alpha": dd["alpha"],
                        "tdoa_doppler": dd["tdoa_samples"]}

            fn = (jax.jit(tail), resample)
            self._moving_cache[key] = fn
        return fn

    def extract(self, frames: jnp.ndarray, xy: jnp.ndarray | None = None,
                *, method: str = "das", **kwargs) -> jnp.ndarray:
        """Beamformed source-audio extraction at position(s) ``xy``
        (localized from ``frames`` when omitted): after the pipeline says
        WHERE, recover WHAT — an enhanced single-channel waveform
        [..., N] via delay-and-sum ('das') or adaptive MVDR ('mvdr')
        (see ops.beamform)."""
        from ..ops import beamform

        if xy is None:
            xy = self(frames)["xy"]
        delays = beamform.source_delays(
            jnp.asarray(xy), np.asarray(self.params.mic_positions),
            self.pipeline, height=self.grid.height_m,
            # steer at the same 3-D lift the solver used (the streaming
            # sibling, streaming._localize_triggered, already does):
            # sphere-projecting a plane-model xy would steer off-source
            constrain_sphere=self.solver.constrain_to_sphere)
        fn = {"das": beamform.extract_das,
              "mvdr": beamform.extract_mvdr}[method]
        return fn(frames, delays, self.pipeline, **kwargs)


# ----------------------------------------------------------------------
# Functional pipeline (pure; jit/vmap/pjit-able)
# ----------------------------------------------------------------------

def condition_frames(frames: jnp.ndarray, window: jnp.ndarray,
                     cfg: PipelineConfig) -> jnp.ndarray:
    """DC-remove -> gain -> window, the float analogue of
    sample_compute.h:105-117."""
    x = frames.astype(window.dtype)
    if cfg.nan_guard:
        x = jnp.where(jnp.isfinite(x), x, 0.0)
    x = conditioning.dc_remove(x)
    x = conditioning.normalize(x, cfg.normalize_mode)
    if cfg.window_enabled:
        x = window_ops.apply_window(x, window)
    return x


def correlate_frames(frames: jnp.ndarray, params: LocalizerParams,
                     cfg: PipelineConfig) -> jnp.ndarray:
    """Conditioned frames [..., M, N] -> correlograms [..., P, L]."""
    if cfg.effective_weighting in ("scot", "roth", "ml"):
        # smoothed-spectral-estimate weightings live on the XLA-FFT path
        # (robustness/accuracy tools; PHAT/none stay on the MXU paths)
        return xcorr.xcorr_fft(frames, params.pairs, cfg)
    if cfg.band_auto and cfg.xcorr_mode != "mxu":
        # the MXU engines fold the per-event auto band into the spectra
        # (mxu_fft.autoband_scale_reim, r5); only the explicit 'fft'
        # engine still routes to the XLA-FFT reference path
        return xcorr.xcorr_fft(frames, params.pairs, cfg)
    if cfg.xcorr_mode == "mxu":
        n_pairs = params.pairs.shape[0]
        chunk = cfg.pair_chunk
        if chunk is None and n_pairs > 256:
            chunk = 128  # bound the [B, P, F] cross-power intermediate
        if chunk is not None and n_pairs > chunk:
            return mxu_fft.xcorr_mxu_pairblocked(
                frames, params.pairs, cfg, matmul_dtype=cfg.matmul_dtype,
                pair_chunk=chunk)
        return mxu_fft.xcorr_mxu(
            frames, params.pairs, cfg, matmul_dtype=cfg.matmul_dtype)
    if cfg.xcorr_mode == "fft":
        return xcorr.xcorr_fft(frames, params.pairs, cfg)
    if cfg.xcorr_mode == "time":
        return xcorr.xcorr_time(frames, params.pairs, cfg.max_shift)
    raise ValueError(f"unknown xcorr mode {cfg.xcorr_mode}")


def _fused_tile(cfg: PipelineConfig, n_mics: int, n: int) -> int | None:
    """Batch tile for the single-VMEM-pass Pallas GCC kernel, or None when
    the unfused path should run.  Tries smaller tiles when the preferred one
    doesn't fit VMEM (e.g. 8-mic arrays: 28 pairs of cross-power)."""
    from ..ops.pallas import gcc_kernel

    if cfg.fused_kernel == "off" or cfg.xcorr_mode != "mxu":
        return None
    if cfg.normalize_mode not in ("shift8", "none"):
        return None  # full-range normalization is not folded into the kernel
    if cfg.effective_weighting in ("scot", "roth", "ml"):
        return None  # smoothed weightings run on the XLA-FFT path
    if cfg.band_auto or (cfg.subsample_peak
                         and cfg.subsample_method in ("phase", "hybrid")):
        # auto band / phase-slope run IN-KERNEL (gcc_kernel spectral-stats
        # mode, r5) — but only on the folded full-band DFT: band_crop
        # reindexes bins and an odd fft_length keeps the Nyquist column
        if cfg.band_crop or cfg.fft_length % 2 != 0:
            return None
    if cfg.phat and cfg.phat_beta != 1.0:
        return None  # the kernel's whitening is the rsqrt (beta = 1) form
    if cfg.fused_kernel == "on":
        return cfg.fused_tile_b
    if jax.default_backend() != "tpu":
        return None
    return gcc_kernel.pick_tile_b(n_mics, n, cfg, cfg.fused_tile_b)


def _onehot_fits_vmem(onehot_pad, budget: int = 4 * 1024 * 1024) -> bool:
    """Whether the steering matrix fits resident in kernel VMEM (bf16)
    alongside the DFT/synthesis weights — the gate for in-kernel SRP.
    The full-resolution 101x101 grid (15.7 MB at 6 pairs) does NOT fit;
    the strided solver-init grids (stride 2-3) do."""
    return onehot_pad.size * 2 <= budget


def _static_batch(lead) -> int | None:
    """Total leading-batch size as a Python int, or None when a dimension
    is symbolic (jax.export shape polymorphism) — in which case the
    batch-size-dependent kernel dispatch falls back to the unfused XLA
    path, which is shape-polymorphic."""
    try:
        return int(np.prod(lead)) if lead else 1
    except Exception:  # TypeError / InconclusiveDimensionOperation
        return None


def _use_gcc_large(cfg: PipelineConfig, pairs_static, b_total) -> bool:
    """Whether the chunked large-array Pallas GCC kernel applies: >256
    pairs, MXU mode, none/phat weighting only (smoothed weightings run on
    the XLA-FFT path), default matmul precision, a real TPU backend, and
    a static batch."""
    return (pairs_static is not None and len(pairs_static) > 256
            and cfg.xcorr_mode == "mxu"
            and cfg.effective_weighting in ("none", "phat")
            # band_auto factorizes through the spectra (gcc_large.
            # _prep_spectra scales them by sqrt(w)), so it stays on this
            # kernel; the weight itself comes from a pair subsample
            and cfg.dft_precision == "default"  # exact f32 -> XLA path
            and jax.default_backend() == "tpu"
            and b_total is not None)


def _conditioned_correlograms(
    params: LocalizerParams, frames: jnp.ndarray, cfg: PipelineConfig,
    pairs_static: tuple | None = None,
) -> jnp.ndarray:
    """Raw frames [..., M, N] -> correlograms [..., P, L], choosing between
    the fused Pallas kernel and the unfused condition->correlate path.

    ``pairs_static`` (a tuple of (i, j)) enables the fused kernel, which
    unrolls over pairs at trace time; without it the unfused path runs."""
    m, n = frames.shape[-2:]
    lead = frames.shape[:-2]
    b_total = _static_batch(lead)
    tile = _fused_tile(cfg, m, n) if pairs_static is not None else None
    if (tile is not None and b_total is not None
            # tiny batches pad up to a full tile — the unfused path wins there
            and b_total * 2 >= tile):
        from ..ops.pallas import gcc_kernel

        b = b_total
        pad = (-b) % tile
        flat = frames.reshape(b, m, n).astype(jnp.float32)
        if cfg.nan_guard:
            flat = jnp.where(jnp.isfinite(flat), flat, 0.0)
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, m, n), flat.dtype)], axis=0)
        corr = gcc_kernel.fused_gcc(
            flat, params.window, np.asarray(pairs_static), cfg, tile_b=tile,
            interpret=jax.default_backend() != "tpu")
        corr = corr[:b]
        return corr.reshape(*lead, corr.shape[-2], corr.shape[-1])
    if _use_gcc_large(cfg, pairs_static, _static_batch(lead)):
        # large-array chunked Pallas kernel: spectra tile stays in VMEM
        # across pair chunks (2.1x over the XLA pair-blocked path)
        from ..ops.pallas import gcc_large

        b = _static_batch(lead)
        tile = 4
        pad = (-b) % tile
        x = condition_frames(frames.reshape(b, m, n), params.window, cfg)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, m, n), x.dtype)], axis=0)
        corr = gcc_large.xcorr_large(
            x, np.asarray(pairs_static), cfg, tile_b=tile)[:b]
        return corr.reshape(*lead, corr.shape[-2], corr.shape[-1])
    x = condition_frames(frames, params.window, cfg)
    return correlate_frames(x, params, cfg)


def localize_frames(
    params: LocalizerParams,
    frames: jnp.ndarray,
    *,
    cfg: PipelineConfig,
    grid_cfg: GridConfig,
    solver_cfg: SolverConfig,
    srp_form: str,
    with_solver: bool = True,
    with_heatmap: bool = False,
    pairs_static: tuple | None = None,
    mics_static: tuple | None = None,
) -> dict:
    """Full pipeline on frames [..., M, N].  Returns a dict of:

    - 'tdoa_samples' [..., P]: sub-sample TDOAs (fractional lags)
    - 'best_shift'   [..., P]: integer argmax lags (reference parity)
    - 'correlograms' [..., P, L]: tapered correlograms
    - 'scores'       [..., G]: SRP grid scores
    - 'xy_grid'      [..., 2]: grid peak (meters, quadratic-refined)
    - 'xy'           [..., 2]: Gauss-Newton refined position
    - 'rms_m'        [...]: solver residual (meters)
    - 'heat_levels'  [..., G] uint8 (only if with_heatmap)
    """
    k = cfg.max_shift
    m, n = frames.shape[-2:]
    lead = frames.shape[:-2]
    b_total = _static_batch(lead)
    tile = _fused_tile(cfg, m, n) if pairs_static is not None else None
    fully_fused = (
        tile is not None and b_total is not None
        and cfg.taper_enabled and cfg.subsample_peak
        # tiny batches pad up to a full tile — the unfused path wins there
        and b_total * 2 >= tile
    )
    if fully_fused:
        # taper + argmax + parabolic peak run inside the Pallas kernel
        from ..ops.pallas import gcc_kernel

        b = b_total
        pad = (-b) % tile
        flat = frames.reshape(b, m, n).astype(jnp.float32)
        if cfg.nan_guard:
            flat = jnp.where(jnp.isfinite(flat), flat, 0.0)
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, m, n), flat.dtype)], axis=0)
        # Mode B (in-kernel SRP scoring + grid argmax): active for the
        # production solver configuration — bf16 matmul scoring, no
        # heatmap/scores consumers forced, unpadded grid.  The kernel then
        # returns the argmax cell directly.  NOTE: the external scoring
        # matmul below still computes out['scores']; it is only dead-code
        # eliminated when the caller wraps _jitted in an OUTER jit that
        # discards 'scores' (as bench.py does) — plain Localizer.__call__
        # returns the full dict, so Mode B 'on' runs scoring twice there.
        # One more reason the default is 'off' (see core/config.py).
        p_n = len(pairs_static)
        refine = (grid_cfg.refine_peak == "on"
                  or (grid_cfg.refine_peak == "auto" and not with_solver))
        in_kernel_srp = (
            cfg.fused_srp == "on"
            and not cfg.band_auto
            and cfg.subsample_method not in ("phase", "hybrid")
            and srp_form == "matmul" and cfg.srp_dtype == "bfloat16"
            and params.onehot_pad is not None
            and params.score_bias is None
            and not refine
            and 4 * p_n + 2 <= 128
            and _onehot_fits_vmem(params.onehot_pad))
        oh3 = None
        if in_kernel_srp:
            g = params.onehot_pad.shape[-1]
            oh3 = params.onehot_pad.reshape(p_n, -1, g)
        # NOTE(r3): scoring the UNSLICED 128-lane kernel output against the
        # zero-row-padded steering matrix (gcc_kernel keep_lanes) was
        # measured neutral on-device (2.985 vs 2.949 ms/iter): XLA replaces
        # the slice->reshape chain with an equal-cost convert->copy chain —
        # the relayouts feed the scoring matmul's chosen operand layout,
        # not the slice — and the K=768 argmax fusion costs slightly more
        # than the K=558 one, so the default path stays.
        outs = gcc_kernel.fused_gcc_peaks(
            flat, params.window, np.asarray(pairs_static), cfg, tile_b=tile,
            interpret=jax.default_backend() != "tpu", srp_onehot=oh3)
        corr_t, shifts, tdoa_samples, peak_val, psr = outs[:5]
        best_cell = outs[5][:b] if in_kernel_srp else None
        p = corr_t.shape[-2]
        corr_t = corr_t[:b].reshape(*lead, p, corr_t.shape[-1])
        shifts = shifts[:b].reshape(*lead, p)
        tdoa_samples = tdoa_samples[:b].reshape(*lead, p)
        peak_val = peak_val[:b].reshape(*lead, p)
        psr = psr[:b].reshape(*lead, p)
    else:
        # NOTE(r3): routing large arrays through gcc_large.xcorr_large_peaks
        # (in-kernel argmax/sub-sample/psr/taper) was measured SLOWER on
        # config 5b — 9.50 vs 8.76 ms device per 256-frame batch: Mosaic
        # serializes the ~15 VPU peak passes per grid step (+1.23 ms in
        # the kernel), costing more than the ~1.6 ms of external HBM
        # re-reads they replace.  The mechanism stays available (tested
        # bit-equal in interpret mode) for chips where VPU/MXU overlap
        # improves; the external masked reductions remain the default.
        best_cell = None
        corr = _conditioned_correlograms(params, frames, cfg, pairs_static)
        shifts = xcorr.best_lag(corr, k)
        tdoa_samples, peak_val = xcorr.subsample_peak(corr, k)
        psr = xcorr.peak_confidence(corr, k)  # raw, pre-taper
        if not cfg.subsample_peak:
            tdoa_samples = shifts.astype(corr.dtype)
        elif cfg.subsample_method in ("phase", "hybrid"):
            cond = condition_frames(frames, params.window, cfg)
            spectra = xcorr.rfft_frames(cond, cfg.fft_length)
            wm = xcorr.band_mask(cfg)
            if wm is None and cfg.band_auto:
                wm = xcorr.auto_band_weight(
                    spectra, params.pairs, cfg)[..., None, :]
            tdoa_phase = xcorr.tdoa_phase_slope(
                spectra, params.pairs, shifts,
                fft_length=cfg.fft_length,
                half_width=cfg.coherence_bins, eps=cfg.phat_eps,
                weight_mask=wm)
            if cfg.subsample_method == "hybrid":
                # per-pair dispatch: phase-slope where the pair's in-band
                # mean coherence clears the gate (it wins ~30% at high
                # SNR), else the parabolic estimate already computed
                _, _, _, g2 = xcorr.smoothed_cross_stats(
                    spectra, params.pairs, cfg.coherence_bins,
                    eps=cfg.phat_eps)
                w_bins = (jnp.ones_like(g2) if wm is None
                          else jnp.broadcast_to(
                              jnp.asarray(wm, g2.dtype), g2.shape))
                coh = (jnp.sum(g2 * w_bins, axis=-1)
                       / jnp.maximum(jnp.sum(w_bins, axis=-1), 1e-12))
                tdoa_samples = jnp.where(
                    coh >= cfg.hybrid_coherence_min,
                    tdoa_phase, tdoa_samples)
            else:
                tdoa_samples = tdoa_phase
        corr_t = (
            xcorr.peak_taper(corr, k, cfg.taper_denom, shifts)
            if cfg.taper_enabled else corr
        )

    if srp_form == "matmul":
        # under Mode B this external matmul duplicates the in-kernel
        # scoring unless an outer jit discards 'scores' (see the Mode B
        # note above)
        scores = srp.srp_scores_matmul(corr_t, params.onehot, cfg.srp_dtype)
    else:
        n_pairs = params.pairs.shape[0]
        chunk = cfg.pair_chunk
        if chunk is None and n_pairs > 256:
            chunk = 128
        if params.onehot_big is not None:
            # precomputed steering matrix: one HBM-streamed contraction
            # (the blocked scan's per-chunk one-hot construction cost ~5x
            # the matmul itself — r3 config-5b trace)
            scores = srp.srp_scores_matmul_big(
                corr_t, params.onehot_big, dtype=cfg.srp_dtype)
        elif chunk is not None and n_pairs > chunk:
            scores = srp.srp_scores_matmul_blocked(
                corr_t, params.lut_flat, cfg.num_lags, chunk,
                dtype=cfg.srp_dtype)
        else:
            scores = srp.srp_scores_gather(corr_t, params.lut_flat)
    if params.score_bias is not None:
        scores = scores + params.score_bias

    grid_shape = (grid_cfg.height, grid_cfg.width)
    refine = (grid_cfg.refine_peak == "on"
              or (grid_cfg.refine_peak == "auto" and not with_solver))
    if best_cell is not None:
        # Mode B: cell index straight from the kernel (refine is off in
        # this mode); shared cell->meters mapping
        xy_grid = srp.cell_to_xy(
            best_cell.reshape(*lead), grid_cfg.width,
            (grid_cfg.half_cells_x, grid_cfg.half_cells_y),
            grid_cfg.cells_per_m)
    else:
        xy_grid = srp.grid_peak_xy(
            scores, grid_shape,
            (grid_cfg.half_cells_x, grid_cfg.half_cells_y),
            grid_cfg.cells_per_m,
            refine=refine,
        )

    out = {
        "tdoa_samples": tdoa_samples,
        "best_shift": shifts,
        "correlograms": corr_t,
        "scores": scores,
        "xy_grid": xy_grid,
        "peak_value": peak_val,
        # weakest-pair peak-to-sidelobe ratio of the RAW correlograms:
        # a per-frame detection confidence (~1 = noise, >2 = confident)
        "confidence": jnp.min(psr, axis=-1),
    }

    if with_heatmap:
        out["heat_levels"] = srp.quantize_heatmap(scores)

    if with_solver:
        tdoa_s = tdoa_samples / cfg.sample_rate_hz
        use_gn_kernel = (
            mics_static is not None and pairs_static is not None
            and jax.default_backend() == "tpu"
            # the kernel unrolls statically over pairs; large arrays blow
            # the VMEM stack and compile time — use the XLA solver there
            and len(pairs_static) <= 64
            # robust IRLS lives in the XLA solver only
            and solver_cfg.robust == "none"
            # symbolic batch (jax.export) -> shape-polymorphic XLA solver
            and _static_batch(tdoa_s.shape[:-1]) is not None)
        if use_gn_kernel:
            from ..ops.pallas import gn_kernel

            flat_tau = tdoa_s.reshape(-1, tdoa_s.shape[-1])
            flat_init = xy_grid.reshape(-1, 2)
            xy, rms = gn_kernel.solve_tdoa_pallas(
                flat_tau, np.asarray(mics_static), np.asarray(pairs_static),
                speed_of_sound=cfg.speed_of_sound_mps,
                height=grid_cfg.height_m,
                init_xy=flat_init, cfg=solver_cfg)
            xy = xy.reshape(*tdoa_s.shape[:-1], 2)
            rms = rms.reshape(tdoa_s.shape[:-1])
        else:
            xy, rms = solver_ops.solve_tdoa_batched(
                tdoa_s, params.mic_positions, params.pairs,
                speed_of_sound=cfg.speed_of_sound_mps,
                height=grid_cfg.height_m,
                init_xy=xy_grid, cfg=solver_cfg,
            )
        out["xy"] = xy
        out["rms_m"] = rms
        # per-event position covariance sigma^2 (J^T J)^-1 at the solution:
        # honest per-measurement noise for downstream trackers (z_cov)
        out["xy_cov"] = solver_ops.solution_covariance(
            xy, rms, params.mic_positions, params.pairs,
            height=grid_cfg.height_m, cfg=solver_cfg)
    else:
        out["xy"] = xy_grid
        out["rms_m"] = jnp.zeros(tdoa_samples.shape[:-1], corr_t.dtype)

    return out


def localize_frames_multi(
    params: LocalizerParams,
    frames: jnp.ndarray,
    *,
    cfg: PipelineConfig,
    grid_cfg: GridConfig,
    solver_cfg: SolverConfig,
    srp_form: str,
    n_sources: int = 2,
    min_separation_m: float = 0.4,
    assoc_window_samples: float = 3.0,
    pairs_static: tuple | None = None,
) -> dict:
    """Simultaneous multi-source pipeline on frames [..., M, N].

    Where :func:`localize_frames` assumes one dominant source (its taper
    and argmax follow the reference's single-event semantics,
    ``vga_heatmap.h:99-108``), this resolves up to ``n_sources`` concurrent
    sources per frame:

    1. correlograms stay RAW (no peak taper — it would erase the weaker
       source's peaks) and score the SRP grid;
    2. ``srp.top_k_peaks`` extracts K spatially-separated grid peaks
       (greedy NMS with a ``min_separation_m`` suppression radius);
    3. each candidate's per-pair TDOA is re-measured as the correlogram's
       local max within ``assoc_window_samples`` of the lag that candidate
       PREDICTS (ops.multisource.windowed_subsample_peak) — the spatial
       hypothesis picks which correlogram peak belongs to which source;
    4. a per-source Gauss-Newton solve refines each candidate.

    Returns (all leading dims preserved, S = n_sources):

    - 'xy'           [..., S, 2]: refined positions, strongest first
    - 'xy_grid'      [..., S, 2]: the SRP peak candidates
    - 'tdoa_samples' [..., S, P]: per-source disambiguated TDOAs
    - 'source_score' [..., S]: SRP peak score (ranking / validity)
    - 'rms_m'        [..., S]: per-source solver residual
    - 'xy_cov'       [..., S, 2, 2]: per-source position covariance
      (feed ``models.tracking.Tracker.step_multi(zs, z_covs=...)``)
    - 'scores'       [..., G]: the (untapered) SRP grid scores
    """
    from ..ops import multisource

    k = cfg.max_shift
    corr = _conditioned_correlograms(params, frames, cfg, pairs_static)

    if srp_form == "matmul":
        scores = srp.srp_scores_matmul(corr, params.onehot, cfg.srp_dtype)
    else:
        # same large-array routing as the single-source path: the plain
        # gather materializes [B, P, G] (tens of GB at 64 mics / 2016
        # pairs — srp.srp_scores_gather_blocked's docstring), so stream
        # the precomputed steering matrix or block over pairs when big
        n_pairs = params.pairs.shape[0]
        chunk = cfg.pair_chunk
        if chunk is None and n_pairs > 256:
            chunk = 128
        if params.onehot_big is not None:
            scores = srp.srp_scores_matmul_big(
                corr, params.onehot_big, dtype=cfg.srp_dtype)
        elif chunk is not None and n_pairs > chunk:
            scores = srp.srp_scores_matmul_blocked(
                corr, params.lut_flat, cfg.num_lags, chunk,
                dtype=cfg.srp_dtype)
        else:
            scores = srp.srp_scores_gather(corr, params.lut_flat)
    if params.score_bias is not None:
        scores = scores + params.score_bias

    g = grid_cfg.num_cells
    cell_xy = jnp.asarray(multisource.cell_centers_xy(grid_cfg))
    peak_xy, peak_score = srp.top_k_peaks(
        scores[..., :g], cell_xy, n_sources, min_separation_m)

    # per-candidate predicted lags -> windowed local TDOA re-measurement
    mic3 = jnp.zeros((params.mic_positions.shape[0], 3), jnp.float32)
    mic3 = mic3.at[:, :2].set(params.mic_positions)
    pred_s = solver_ops.predicted_tdoas(
        peak_xy, mic3, params.pairs, cfg.speed_of_sound_mps,
        grid_cfg.height_m, solver_cfg.constrain_to_sphere)  # [..., S, P] s
    pred_lags = pred_s * cfg.sample_rate_hz
    tdoa_samples, peak_val = multisource.windowed_subsample_peak(
        corr[..., None, :, :], k, pred_lags, assoc_window_samples)

    xy, rms = solver_ops.solve_tdoa_batched(
        tdoa_samples / cfg.sample_rate_hz, params.mic_positions,
        params.pairs, speed_of_sound=cfg.speed_of_sound_mps,
        height=grid_cfg.height_m, init_xy=peak_xy, cfg=solver_cfg)
    xy_cov = solver_ops.solution_covariance(
        xy, rms, params.mic_positions, params.pairs,
        height=grid_cfg.height_m, cfg=solver_cfg)

    return {
        "xy": xy,
        "xy_grid": peak_xy,
        "tdoa_samples": tdoa_samples,
        "peak_value": peak_val,
        "source_score": peak_score,
        "rms_m": rms,
        "xy_cov": xy_cov,
        "scores": scores,
    }


# ----------------------------------------------------------------------
# Bit-exact integer pipeline (validation vs the golden model)
# ----------------------------------------------------------------------

def localize_stream(
    loc: "Localizer",
    stream: jnp.ndarray,
    *,
    max_events: int = 16,
    refractory: int = 0,
) -> dict:
    """One-shot offline pipeline: a raw [M, T] stream -> detected events ->
    batched localization, all device-side (one jitted program).

    The batch analogue of the firmware's capture loop: detect every event
    (vectorized variance trigger with refractory holdoff), extract the frame
    ending at each trigger, run the full frame pipeline on the event batch.
    Absent events are masked via 'valid'."""
    from ..ops import detector as detector_ops

    cfg = loc.pipeline
    n = cfg.frame_size

    @functools.partial(jax.jit, static_argnames=())
    def run(s):
        idxs, valid = detector_ops.all_triggers_capped(
            s.astype(jnp.int64)[None], cfg, max_events=max_events,
            refractory=refractory)
        idxs, valid = idxs[0], valid[0]
        s32 = s.astype(jnp.float32)
        frames = jax.vmap(
            lambda t: jax.lax.dynamic_slice_in_dim(
                s32, jnp.maximum(t - (n - 1), 0), n, axis=-1)
        )(idxs)  # [E, M, N] without broadcasting the stream per slot
        out = loc._jitted(loc.params, frames)
        out["trigger_idx"] = idxs
        out["valid"] = valid
        return out

    return run(stream)


def localize_frames_int(
    frames_u8: jnp.ndarray,
    pairs: jnp.ndarray,
    window_q15: jnp.ndarray,
    lut_flat: jnp.ndarray,
    cfg: PipelineConfig,
) -> dict:
    """The reference's exact fixed-point event burst on raw 8-bit frames
    [..., M, N] (values 0..255 as pushed from the DMA sample array):

    DC-remove (sum >> bits) -> int16 <<8 -> Q15 window -> int64 xcorr ->
    argmax -> float32 Gaussian taper truncated to int64 -> shift gate ->
    int SRP scores + 4-level heat colors.
    """
    x = frames_u8.astype(jnp.int16)
    x = conditioning.dc_remove_int(x, cfg.frame_size_bits)
    x = conditioning.normalize_shift8_int(x)
    x = window_ops.apply_window_q15(x, window_q15)

    corr = xcorr.xcorr_time_int(x, pairs, cfg.max_shift)
    shifts = xcorr.best_lag(corr, cfg.max_shift)
    corr_t = xcorr.peak_taper_int(corr, cfg.max_shift, cfg.taper_denom)

    gate = jnp.sum(shifts.astype(jnp.int64) ** 2, axis=-1) > cfg.shift_gate

    scores = srp.srp_scores_int(corr_t, lut_flat)
    levels = srp.quantize_heatmap(scores)
    return {
        "frames_conditioned": x,
        "correlograms": corr_t,
        "correlograms_raw": corr,
        "best_shift": shifts,
        "gate": gate,
        "scores": scores,
        "heat_levels": levels,
    }
