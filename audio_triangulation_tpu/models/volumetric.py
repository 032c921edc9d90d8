"""Volumetric (3-D) SRP localization: a stack of plane grids over heights.

The reference constrains candidates to a single sphere cap at 1.2 m
(``vga_heatmap.h:57-60``) — sources off that surface bias its estimate.
This model searches a z-stack of plane grids instead: the steering LUT gains
a height axis, SRP scoring stays one MXU matmul over the flattened
(z, y, x) cell axis, and the argmax yields a full 3-D position.

Scales the same way as the 2-D path (grid axis sharding applies unchanged —
the flat cell axis just got Z times longer).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import GridConfig, PipelineConfig
from ..core import geometry
from ..ops import solver as solver_ops, srp, window as window_ops, xcorr
from . import localizer as localizer_mod


def volumetric_lut(
    grid: GridConfig,
    heights: tuple,
    mic_positions: np.ndarray,
    pairs: np.ndarray,
    pipeline: PipelineConfig,
) -> np.ndarray:
    """Lag LUT [P, Z, H, W] over plane grids at the given heights."""
    luts = []
    for h in heights:
        g = dataclasses.replace(grid, height_m=float(h), projection="plane")
        luts.append(geometry.lag_lut(g, mic_positions, pairs, pipeline))
    return np.stack(luts, axis=1)  # [P, Z, H, W]


@dataclasses.dataclass(frozen=True)
class VolumetricLocalizer:
    """Frame batches -> (x, y, z) source positions via 3-D SRP."""

    pipeline: PipelineConfig
    grid: GridConfig
    heights: tuple
    params: localizer_mod.LocalizerParams
    onehot3d: jnp.ndarray  # [P*L, Z*H*W]

    @classmethod
    def create(
        cls,
        mic_positions: np.ndarray,
        heights,
        pipeline: PipelineConfig = PipelineConfig(phat=True),
        grid: GridConfig = GridConfig(half_cells_x=24, half_cells_y=24,
                                      cells_per_m=16.0),
    ) -> "VolumetricLocalizer":
        mic_positions = np.asarray(mic_positions, np.float32)
        heights = tuple(float(h) for h in heights)
        pairs = geometry.mic_pairs(mic_positions.shape[0])
        if pipeline.max_shift_samples is None:
            # the lag window must cover the array aperture (the reference's
            # fixed +-46 assumes its 0.2 m triangle; larger apertures clip)
            pipeline = dataclasses.replace(
                pipeline,
                max_shift_samples=geometry.max_lag_for_array(
                    mic_positions, pipeline))
        lut = volumetric_lut(grid, heights, mic_positions, pairs, pipeline)
        p = lut.shape[0]
        flat = lut.reshape(p, -1)
        onehot = np.zeros(
            (p, pipeline.num_lags, flat.shape[1]), np.float32)
        pp = np.repeat(np.arange(p), flat.shape[1])
        onehot[pp, flat.ravel(),
               np.tile(np.arange(flat.shape[1]), p)] = 1.0
        win = window_ops.window_for(pipeline)
        params = localizer_mod.LocalizerParams(
            mic_positions=jnp.asarray(mic_positions),
            pairs=jnp.asarray(pairs),
            window=jnp.asarray(win),
            lut_flat=jnp.asarray(flat),
            onehot=None,
            score_bias=None,
        )
        return cls(
            pipeline=pipeline, grid=grid, heights=heights, params=params,
            onehot3d=jnp.asarray(
                onehot.reshape(p * pipeline.num_lags, -1)),
        )

    def __call__(self, frames: jnp.ndarray) -> dict:
        return self._jitted(self.params, self.onehot3d, frames)

    @functools.cached_property
    def _jitted(self):
        pairs_static = tuple(
            tuple(int(v) for v in row) for row in np.asarray(self.params.pairs))
        return jax.jit(functools.partial(
            localize_volumetric,
            cfg=self.pipeline, grid_cfg=self.grid, heights=self.heights,
            pairs_static=pairs_static))


def localize_volumetric(
    params: localizer_mod.LocalizerParams,
    onehot3d: jnp.ndarray,
    frames: jnp.ndarray,
    *,
    cfg: PipelineConfig,
    grid_cfg: GridConfig,
    heights: tuple,
    pairs_static: tuple | None = None,
) -> dict:
    """frames [..., M, N] -> 'xyz' [..., 3], 'scores' [..., Z*H*W], plus
    the usual TDOA outputs."""
    k = cfg.max_shift
    corr = localizer_mod._conditioned_correlograms(
        params, frames, cfg, pairs_static)
    shifts = xcorr.best_lag(corr, k)
    tdoa, _ = xcorr.subsample_peak(corr, k)
    corr_t = (xcorr.peak_taper(corr, k, cfg.taper_denom, shifts)
              if cfg.taper_enabled else corr)

    scores = srp.srp_scores_matmul(corr_t, onehot3d, cfg.srp_dtype)
    h, w = grid_cfg.height, grid_cfg.width

    idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    zi = idx // (h * w)
    rem = idx % (h * w)
    row = rem // w
    col = rem % w
    hs = jnp.asarray(np.asarray(heights, np.float32))
    x_m = (col.astype(jnp.float32) - grid_cfg.half_cells_x) \
        / grid_cfg.cells_per_m
    y_m = (grid_cfg.half_cells_y - row.astype(jnp.float32)) \
        / grid_cfg.cells_per_m
    z_m = hs[zi]
    xyz_grid = jnp.stack([x_m, y_m, z_m], axis=-1)

    # free-(x, y, z) GN refinement from the sub-sample TDOAs: resolves the
    # one-cell radial bias inherent to integer-lag SRP grids
    lead = tdoa.shape[:-1]
    xyz, rms = solver_ops.solve_tdoa_xyz(
        (tdoa / cfg.sample_rate_hz).reshape(-1, tdoa.shape[-1]),
        params.mic_positions, params.pairs,
        speed_of_sound=cfg.speed_of_sound_mps,
        init_xyz=xyz_grid.reshape(-1, 3))
    return {
        "xyz": xyz.reshape(*lead, 3),
        "xyz_grid": xyz_grid,
        "rms_m": rms.reshape(lead),
        "scores": scores,
        "tdoa_samples": tdoa,
        "best_shift": shifts,
        "z_index": zi,
    }
