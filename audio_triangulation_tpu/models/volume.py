"""Volumetric (3-D) SRP localization.

The reference's localizer is a fixed-height 2-D grid: every candidate is
projected onto a 1.2 m sphere cap around the array
(vga_heatmap.h:48-93, vga.h:27-35).  This module generalizes the same
steered-response scoring to a true 3-D search box — find sources anywhere
in a room, including height — and refines the winning cell with the free
(x, y, z) Gauss-Newton solve (ops.solver.solve_tdoa_xyz).

TPU shape: the volume is just more grid cells.  Scoring stays the one-hot
steering MXU matmul (correlograms [B, P*L] @ onehot [P*L, G3]) — a LARGER
matmul than the planar grid's, which the MXU likes; the peak is an argmax
plus per-axis parabolic refinement over masked reductions (no gathers).

Use a non-coplanar array (e.g. geometry.tetrahedral_array) when height
matters: planar arrays cannot resolve elevation sign and have weak z
sensitivity near their plane.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry
from ..core.config import PipelineConfig, SolverConfig, VolumeConfig
from ..ops import srp, xcorr
from ..ops import solver as solver_ops
from ..ops import window as window_ops
from . import localizer as localizer_mod


@dataclasses.dataclass(frozen=True)
class VolumeLocalizer:
    """Configured, jit-compiled 3-D frame-batch localizer.

    >>> loc = VolumeLocalizer.create(geometry.tetrahedral_array(0.3))
    >>> out = loc(frames)            # frames [B, M, N]
    >>> out["xyz"]                   # [B, 3] source positions (meters)
    """

    pipeline: PipelineConfig
    volume: VolumeConfig
    solver: SolverConfig
    params: localizer_mod.LocalizerParams
    srp_form: str
    with_solver: bool = True

    @classmethod
    def create(
        cls,
        mic_positions: np.ndarray,
        pipeline: PipelineConfig = PipelineConfig(),
        volume: VolumeConfig = VolumeConfig(),
        solver: SolverConfig = SolverConfig(),
        *,
        srp_form: str = "auto",
        with_solver: bool = True,
        dtype=jnp.float32,
    ) -> "VolumeLocalizer":
        mic_positions = np.asarray(mic_positions, dtype=np.float32)
        if pipeline.max_shift_samples is None:
            # the lag window must cover the array aperture (the reference's
            # fixed +-46 assumes its 0.2 m triangle; larger apertures clip)
            pipeline = dataclasses.replace(
                pipeline,
                max_shift_samples=geometry.max_lag_for_array(
                    mic_positions, pipeline))
        pairs = geometry.mic_pairs(mic_positions.shape[0])
        lut = geometry.volume_lag_lut(
            volume, mic_positions, pairs, pipeline)  # [P, D, H, W]
        p = lut.shape[0]
        lut_flat = lut.reshape(p, -1)
        if srp_form == "auto":
            srp_form = srp.auto_srp_form(
                p, pipeline.num_lags, volume.num_cells)
        onehot = None
        if srp_form == "matmul":
            # lag_onehot flattens the trailing grid axes; feed it the
            # volume LUT with (D*H, W) standing in for (H, W)
            oh = geometry.lag_onehot(
                lut.reshape(p, volume.depth * volume.height, volume.width),
                pipeline.num_lags)
            onehot = jnp.asarray(oh, dtype=dtype)
        win = window_ops.window_for(pipeline)
        params = localizer_mod.LocalizerParams(
            mic_positions=jnp.asarray(mic_positions),
            pairs=jnp.asarray(pairs),
            window=jnp.asarray(win, dtype=dtype),
            lut_flat=jnp.asarray(lut_flat),
            onehot=onehot,
        )
        return cls(pipeline=pipeline, volume=volume, solver=solver,
                   params=params, srp_form=srp_form,
                   with_solver=with_solver)

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
        return jax.jit(functools.partial(
            localize_frames_volume,
            cfg=self.pipeline,
            volume=self.volume,
            solver_cfg=self.solver,
            srp_form=self.srp_form,
            with_solver=self.with_solver,
            pairs_static=tuple(
                tuple(int(v) for v in row)
                for row in np.asarray(self.params.pairs)),
        ))


def volume_peak_xyz(
    scores: jnp.ndarray,          # [..., G3]
    volume: VolumeConfig,
    *,
    refine: bool = True,
) -> jnp.ndarray:
    """Volume-grid argmax -> (x, y, z) meters, with optional per-axis
    parabolic sub-cell refinement (the 3-D analogue of srp.grid_peak_xy;
    neighbors read via masked reductions, not gathers — see
    xcorr.subsample_peak for why)."""
    d, h, w = volume.depth, volume.height, volume.width
    vol = scores.reshape(*scores.shape[:-1], d, h, w)
    flat_idx = jnp.argmax(scores, axis=-1)
    iz = flat_idx // (h * w)
    iy = (flat_idx // w) % h
    ix = flat_idx % w

    def axis_delta(axis_len, idx, axis_scores):
        """Parabolic offset along one axis; axis_scores [..., axis_len] is
        the score line through the peak along that axis."""
        pc = jnp.clip(idx, 1, axis_len - 2)
        lane = jnp.arange(axis_len)
        cm = jnp.sum(jnp.where(lane == (pc - 1)[..., None],
                               axis_scores, 0), axis=-1)
        c0 = jnp.sum(jnp.where(lane == pc[..., None],
                               axis_scores, 0), axis=-1)
        cp = jnp.sum(jnp.where(lane == (pc + 1)[..., None],
                               axis_scores, 0), axis=-1)
        den = cm - 2.0 * c0 + cp
        delta = jnp.where(jnp.abs(den) > 1e-20,
                          0.5 * (cm - cp) / den, 0.0)
        delta = jnp.where((idx >= 1) & (idx <= axis_len - 2), delta, 0.0)
        return jnp.clip(delta, -0.5, 0.5)

    dx = dy = dz = 0.0
    if refine:
        # score line through the peak along each axis, via two masked
        # reductions per axis (select the orthogonal indices, then refine)
        zl, yl, xl = (jnp.arange(d), jnp.arange(h), jnp.arange(w))
        sel_z = (yl[:, None] == iy[..., None, None]) \
            & (xl == ix[..., None, None])
        line_z = jnp.sum(jnp.where(sel_z[..., None, :, :], vol, 0.0),
                         axis=(-2, -1))                        # [..., D]
        sel_y = (zl[:, None] == iz[..., None, None]) \
            & (xl == ix[..., None, None])
        line_y = jnp.sum(jnp.where(sel_y[..., :, None, :], vol, 0.0),
                         axis=(-3, -1))                        # [..., H]
        sel_x = (zl[:, None] == iz[..., None, None]) \
            & (yl == iy[..., None, None])
        line_x = jnp.sum(jnp.where(sel_x[..., :, :, None], vol, 0.0),
                         axis=(-3, -2))                        # [..., W]
        dz = axis_delta(d, iz, line_z)
        dy = axis_delta(h, iy, line_y)
        dx = axis_delta(w, ix, line_x)

    cpm = jnp.asarray(volume.cells_per_m, scores.dtype)
    x = (ix + dx - volume.half_cells_x) / cpm
    y = (volume.half_cells_y - (iy + dy)) / cpm
    z = volume.z_min_m + (iz + dz) * volume.z_step_m
    return jnp.stack([x, y, jnp.broadcast_to(z, x.shape)], axis=-1)


def localize_frames_volume(
    params: localizer_mod.LocalizerParams,
    frames: jnp.ndarray,
    *,
    cfg: PipelineConfig,
    volume: VolumeConfig,
    solver_cfg: SolverConfig,
    srp_form: str,
    with_solver: bool = True,
    pairs_static: Optional[tuple] = None,
) -> dict:
    """Volumetric pipeline on frames [..., M, N].  Returns:

    - 'tdoa_samples' [..., P]: sub-sample TDOAs
    - 'best_shift'   [..., P]: integer argmax lags
    - 'correlograms' [..., P, L]
    - 'scores'       [..., G3] (G3 = depth*height*width, z-major)
    - 'xyz_grid'     [..., 3]: volume peak (meters, per-axis refined)
    - 'xyz'          [..., 3]: free-3-D Gauss-Newton refinement
    - 'rms_m'        [...]: solver residual (meters)

    Shares the correlogram engine (fused Pallas kernel included) with the
    planar localize_frames; only scoring/peak/solve differ.
    """
    k = cfg.max_shift
    corr = localizer_mod._conditioned_correlograms(
        params, frames, cfg, pairs_static)
    shifts = xcorr.best_lag(corr, k)
    tdoa_samples, peak_val = xcorr.subsample_peak(corr, k)
    if not cfg.subsample_peak:
        tdoa_samples = shifts.astype(corr.dtype)
    corr_t = (xcorr.peak_taper(corr, k, cfg.taper_denom, shifts)
              if cfg.taper_enabled else corr)

    if srp_form == "matmul":
        scores = srp.srp_scores_matmul(corr_t, params.onehot, cfg.srp_dtype)
    else:
        n_pairs = params.pairs.shape[0]
        chunk = cfg.pair_chunk
        if chunk is None and n_pairs > 256:
            chunk = 128
        if chunk is not None and n_pairs > chunk:
            scores = srp.srp_scores_matmul_blocked(
                corr_t, params.lut_flat, cfg.num_lags, chunk,
                dtype=cfg.srp_dtype)
        else:
            scores = srp.srp_scores_gather(corr_t, params.lut_flat)

    xyz_grid = volume_peak_xyz(scores, volume, refine=not with_solver)
    out = {
        "tdoa_samples": tdoa_samples,
        "best_shift": shifts,
        "correlograms": corr_t,
        "scores": scores,
        "xyz_grid": xyz_grid,
        "peak_value": peak_val,
    }
    if with_solver:
        tdoa_s = tdoa_samples / cfg.sample_rate_hz
        lead = tdoa_s.shape[:-1]
        xyz, rms = solver_ops.solve_tdoa_xyz(
            tdoa_s.reshape(-1, tdoa_s.shape[-1]),
            params.mic_positions, params.pairs,
            speed_of_sound=cfg.speed_of_sound_mps,
            init_xyz=xyz_grid.reshape(-1, 3),
            iterations=solver_cfg.iterations + 3,
            z_min=min(volume.z_min_m, 0.05),
        )
        out["xyz"] = xyz.reshape(*lead, 3)
        out["rms_m"] = rms.reshape(lead)
    else:
        out["xyz"] = xyz_grid
        out["rms_m"] = jnp.zeros(tdoa_samples.shape[:-1], corr_t.dtype)
    return out
