"""Simultaneous multi-source localization primitives.

The reference pipeline is structurally single-source: its heatmap argmax
(``src/components/vga/vga_heatmap.h:99-108``) and peak taper
(``src/components/correlations.c:26-33``) both assume one dominant event
per capture.  This module supplies the pieces that lift the same SRP
machinery to K simultaneous sources:

1. ``srp.top_k_peaks`` finds K spatially-separated SRP peaks (candidate
   positions).
2. For each candidate, each pair's TDOA is re-measured as the correlogram's
   LOCAL maximum near that candidate's *predicted* lag
   (:func:`windowed_subsample_peak`) — the spatial hypothesis disambiguates
   which correlogram peak belongs to which source, so overlapping sources
   stop corrupting each other's TDOA sets.
3. A per-source Gauss-Newton solve (``ops.solver.solve_tdoa_batched``
   batched over the source axis) refines each candidate to cm level.

Everything is masked/branchless with static shapes: K is a compile-time
constant, so the whole multi-source pipeline jits and vmaps like the
single-source one.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def cell_centers_xy(grid) -> np.ndarray:
    """Planar (x, y) meters of every grid cell, flat row-major [G, 2].

    Matches the cell->meters mapping of ``srp.grid_peak_xy`` (reference
    ``vga_heatmap.h:52-54``): col 0 is -half_cells_x cells left of center,
    row 0 is +half_cells_y cells above.  These are the PLANE coordinates of
    the cells (what ``top_k_peaks``'s suppression radius and the solver's
    ``init_xy`` want) regardless of the grid's sphere/plane projection —
    the projection only changes each cell's expected lags, not its planar
    address."""
    xs = (np.arange(grid.width) - grid.half_cells_x) / grid.cells_per_m
    ys = (grid.half_cells_y - np.arange(grid.height)) / grid.cells_per_m
    gx, gy = np.meshgrid(xs, ys)  # [H, W] each; flat index = row*W + col
    return np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)


def windowed_subsample_peak(
    correlograms: jnp.ndarray,
    max_shift: int,
    pred_lags: jnp.ndarray,
    window: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Local correlogram peak near a predicted lag, with parabolic
    sub-sample refinement.

    correlograms: [..., P, L] (raw, untapered); pred_lags: [..., P]
    predicted fractional lags (samples, signed); ``window``: half-width of
    the association gate in samples.  Returns (tdoa_samples [..., P],
    peak_value [..., P]); the argmax is restricted to
    ``|lag - pred| <= window`` while the parabolic neighbors read the raw
    correlogram (the true local curvature), exactly like
    ``xcorr.subsample_peak`` does globally.

    Broadcasting note: to evaluate K source hypotheses against one
    correlogram set, pass ``correlograms[..., None, :, :]`` ([..., 1, P, L])
    with ``pred_lags`` [..., K, P]."""
    n_lags = correlograms.shape[-1]
    c = correlograms
    lane = jnp.arange(n_lags, dtype=jnp.float32) - max_shift  # lag values
    mask = jnp.abs(lane - pred_lags[..., None]) <= window  # [..., P, L]
    neg = jnp.asarray(-3.0e38, c.dtype)
    cm_masked = jnp.where(mask, c, neg)
    p = jnp.argmax(cm_masked, axis=-1)
    peak = jnp.max(cm_masked, axis=-1)

    pc = jnp.clip(p, 1, n_lags - 2)
    # neighbor values via masked reductions, NOT take_along_axis (TPU
    # gathers of one value per [B, P] index are pathological — see
    # xcorr.subsample_peak)
    ilane = jnp.arange(n_lags)
    cm = jnp.sum(jnp.where(ilane == (pc - 1)[..., None], c, 0), axis=-1)
    c0 = jnp.sum(jnp.where(ilane == pc[..., None], c, 0), axis=-1)
    cp = jnp.sum(jnp.where(ilane == (pc + 1)[..., None], c, 0), axis=-1)
    den = cm - 2.0 * c0 + cp
    delta = jnp.where(jnp.abs(den) > 1e-20, 0.5 * (cm - cp) / den, 0.0)
    delta = jnp.where((p >= 1) & (p <= n_lags - 2), delta, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    return (p - max_shift) + delta, peak
