"""Steered-response-power (SRP) grid localization.

The reference's localization solver IS this grid search: each of 101x101
cells has a precomputed expected integer lag per mic pair, the cell score is
the sum of the pairs' correlogram values at those lags, and the argmax cell
is where the heatmap glows (``src/components/vga/vga_heatmap.h:48-133``).

TPU-native formulations, batched over frames:

- **matmul form** (default, MXU): scores[B, G] = corr[B, P*L] @ onehot[P*L, G]
  where ``onehot`` is the steering one-hot of the lag LUT.  For the reference
  geometry that's a [B, 279] x [279, 10201] matmul — one MXU pass for the
  whole batch instead of the firmware's 2 x 101 x 101 x 3 scalar gathers.
- **gather form**: take_along_axis per pair then sum — preferred when
  P * L * G makes the one-hot too large (e.g. 64-mic arrays).

Both produce identical scores (tested).  Peak extraction refines the argmax
cell with a 2-D quadratic fit (new capability).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def srp_scores_matmul(
    correlograms: jnp.ndarray, onehot: jnp.ndarray, dtype: str = "float32"
) -> jnp.ndarray:
    """scores[..., G] from correlograms [..., P, L] and onehot [P*L, G].

    dtype='bfloat16' runs the contraction at 2x MXU rate with f32
    accumulation; the 0/1 steering matrix is exact in bf16, so only the
    correlogram operand loses precision (~4e-3 relative)."""
    *lead, p, l = correlograms.shape
    flat = correlograms.reshape(*lead, p * l)
    if dtype == "bfloat16":
        flat = flat.astype(jnp.bfloat16)
        onehot = onehot.astype(jnp.bfloat16)
    return jnp.matmul(flat, onehot, preferred_element_type=jnp.float32)


def srp_scores_gather(
    correlograms: jnp.ndarray, lut_flat: jnp.ndarray
) -> jnp.ndarray:
    """scores[..., G] via per-pair gather; lut_flat is int32 [P, G].

    corr[..., p, lut[p, g]] summed over p — the literal (but batched)
    vga_draw_heatmap:99-108 computation."""
    gathered = jnp.take_along_axis(
        correlograms[..., :, :],  # [..., P, L]
        jnp.broadcast_to(
            lut_flat, correlograms.shape[:-2] + lut_flat.shape
        ),
        axis=-1,
    )  # [..., P, G]
    return jnp.sum(gathered, axis=-2)


def srp_scores_gather_blocked(
    correlograms: jnp.ndarray, lut_flat: jnp.ndarray, pair_chunk: int = 128
) -> jnp.ndarray:
    """Pair-blocked gather scoring for large arrays: accumulates [..., G]
    over ``pair_chunk``-sized slices of the pair axis so the [..., P, G]
    gather intermediate never materializes (2016 pairs x a 63x63 grid would
    need ~8 GB per batch of 256 otherwise)."""
    import jax

    p = correlograms.shape[-2]
    pad = (-p) % pair_chunk
    corr = correlograms
    lut = lut_flat
    if pad:
        corr = jnp.concatenate(
            [corr, jnp.zeros((*corr.shape[:-2], pad, corr.shape[-1]),
                             corr.dtype)], axis=-2)
        lut = jnp.concatenate(
            [lut, jnp.zeros((pad, lut.shape[-1]), lut.dtype)], axis=0)
    n_chunks = corr.shape[-2] // pair_chunk
    corr_c = jnp.moveaxis(
        corr.reshape(*corr.shape[:-2], n_chunks, pair_chunk,
                     corr.shape[-1]), -3, 0)  # [C, ..., chunk, L]
    lut_c = lut.reshape(n_chunks, pair_chunk, -1)

    def body(acc, args):
        c, l = args
        return acc + srp_scores_gather(c, l), None

    init = jnp.zeros((*correlograms.shape[:-2], lut.shape[-1]),
                     correlograms.dtype)
    out, _ = jax.lax.scan(body, init, (corr_c, lut_c))
    return out


def srp_scores_matmul_blocked(
    correlograms: jnp.ndarray, lut_flat: jnp.ndarray, num_lags: int,
    pair_chunk: int = 128, dtype: str = "float32",
) -> jnp.ndarray:
    """Pair-blocked MXU scoring for large arrays.

    TPU gathers of [B, P, G] indices are orders of magnitude slower than
    matmuls, so each pair chunk's one-hot steering block [chunk * L, G] is
    built on the fly (an equality compare against iota) and contracted on
    the MXU; a scan accumulates chunks.  Identical scores to the gather
    forms (tested), ~1000x faster than the blocked gather at 2016 pairs.

    ``dtype`` = 'bfloat16' runs the contraction at 2x MXU rate (the one-hot
    side is exact in bf16; accumulation stays f32 — same tradeoff as
    ``srp_scores_matmul``'s srp_dtype, argmax cell unchanged in tests)."""
    import jax

    p, g = lut_flat.shape
    pad = (-p) % pair_chunk
    corr = correlograms
    lut = lut_flat
    # pad the lag axis to a sublane multiple: merging (chunk, L) -> chunk*L
    # is then a free layout change instead of a relayout copy of the one-hot
    # block each scan step (measured 5 ms/iter at 2016 pairs, L = 149)
    l8 = -(-num_lags // 8) * 8
    if l8 != num_lags:
        corr = jnp.concatenate(
            [corr, jnp.zeros((*corr.shape[:-1], l8 - num_lags),
                             corr.dtype)], axis=-1)
    if pad:
        corr = jnp.concatenate(
            [corr, jnp.zeros((*corr.shape[:-2], pad, corr.shape[-1]),
                             corr.dtype)], axis=-2)
        # padded pairs point at lag 0 but carry zero correlogram -> no effect
        lut = jnp.concatenate(
            [lut, jnp.zeros((pad, g), lut.dtype)], axis=0)
    n_chunks = lut.shape[0] // pair_chunk
    corr_c = jnp.moveaxis(
        corr.reshape(*corr.shape[:-2], n_chunks, pair_chunk, corr.shape[-1]),
        -3, 0)  # [C, ..., chunk, L8]
    lut_c = lut.reshape(n_chunks, pair_chunk, g)
    # lut values are < num_lags, so the padded lag rows are all-zero
    lag_iota = jnp.arange(l8, dtype=lut.dtype)

    mm_dtype = jnp.dtype(dtype)

    def body(acc, args):
        c, l = args  # c: [..., chunk, L8], l: [chunk, G]
        onehot = (l[:, None, :] == lag_iota[None, :, None]).astype(
            mm_dtype)  # [chunk, L8, G]
        flat = c.reshape(*c.shape[:-2], pair_chunk * l8).astype(mm_dtype)
        w = onehot.reshape(pair_chunk * l8, g)
        return acc + jnp.matmul(
            flat, w, preferred_element_type=jnp.float32), None

    init = jnp.zeros((*correlograms.shape[:-2], g), correlograms.dtype)
    out, _ = jax.lax.scan(body, init, (corr_c, lut_c))
    return out


def sublane_pad_lags(num_lags: int) -> int:
    """Lag-axis length rounded up to the 8-sublane boundary — merging
    (P, L8) -> P*L8 is then a free layout change (no relayout copy)."""
    return -(-num_lags // 8) * 8


def big_onehot_device(lut_flat: jnp.ndarray, num_lags: int,
                      dtype: str = "bfloat16") -> jnp.ndarray:
    """Precompute the large-array steering matrix [P*L8, G] ON DEVICE
    (zero rows at lag padding; the 0/1 entries are exact in bf16).

    For 2016-pair arrays the blocked scan (``srp_scores_matmul_blocked``)
    reconstructs per-chunk one-hots from ``lut_flat`` every step; the r3
    config-5b trace showed that construction (pred relayout copies, pair
    padding, chunk reshapes) costing ~5x the actual scoring matmul
    (~4.2 ms vs 0.83 ms per 256-frame batch).  Materializing the matrix
    once (~590 MB bf16 at 2016 pairs x 152 lags x 961 cells) turns
    scoring into a single HBM-streamed MXU contraction."""
    p, g = lut_flat.shape
    l8 = sublane_pad_lags(num_lags)
    lanes = jnp.arange(l8, dtype=lut_flat.dtype)
    w = (lut_flat[:, None, :] == lanes[None, :, None]).astype(
        jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    return w.reshape(p * l8, g)


def srp_scores_matmul_big(
    correlograms: jnp.ndarray, onehot_big: jnp.ndarray,
    dtype: str = "float32",
) -> jnp.ndarray:
    """scores[..., G] via ONE contraction against a precomputed
    [P*L8, G] steering matrix (``big_onehot_device``): the fast path for
    large pair counts when the matrix fits the HBM budget.  The padded
    lag length is derived from the matrix shape."""
    *lead, p, l = correlograms.shape
    l8 = onehot_big.shape[0] // p
    corr = correlograms
    if l8 != l:
        corr = jnp.concatenate(
            [corr, jnp.zeros((*corr.shape[:-1], l8 - l), corr.dtype)],
            axis=-1)
    flat = corr.reshape(*lead, p * l8)
    if dtype == "bfloat16":
        flat = flat.astype(jnp.bfloat16)
    return jnp.matmul(flat, onehot_big.astype(flat.dtype),
                      preferred_element_type=jnp.float32)


def srp_scores_int(
    correlograms: jnp.ndarray, lut_flat: jnp.ndarray
) -> jnp.ndarray:
    """int64 scores for bit-exact heatmap validation."""
    return srp_scores_gather(correlograms.astype(jnp.int64), lut_flat)


def quantize_heatmap(scores: jnp.ndarray) -> jnp.ndarray:
    """4-level fractional-of-max color quantization, vga_draw_heatmap:111-127:
    thresholds 63/64, 31/32, 15/16, 7/8 of the max -> levels 4/3/2/1, else 0.

    Works on float or int scores; for int inputs uses the C arithmetic-shift
    semantics exactly."""
    m = jnp.max(scores, axis=-1, keepdims=True)
    if jnp.issubdtype(scores.dtype, jnp.integer):
        t_white = (m * 63) >> 6
        t_green = (m * 31) >> 5
        t_red = (m * 15) >> 4
        t_blue = (m * 7) >> 3
    else:
        t_white = m * (63.0 / 64.0)
        t_green = m * (31.0 / 32.0)
        t_red = m * (15.0 / 16.0)
        t_blue = m * (7.0 / 8.0)
    level = (
        (scores >= t_blue).astype(jnp.uint8)
        + (scores >= t_red).astype(jnp.uint8)
        + (scores >= t_green).astype(jnp.uint8)
        + (scores >= t_white).astype(jnp.uint8)
    )
    return level


def grid_argmax(
    scores: jnp.ndarray, grid_shape: tuple[int, int]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(row, col) int32 argmax of flat scores [..., G]."""
    h, w = grid_shape
    flat_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    return flat_idx // w, flat_idx % w


def cell_to_xy(cell: jnp.ndarray, width: int, half_cells: tuple[int, int],
               cells_per_m: float, dx=0.0, dy=0.0,
               dtype=jnp.float32) -> jnp.ndarray:
    """Flat grid cell index -> (x, y) meters — THE cell->meters convention
    (vga_init_heatmap:52-54), shared by every scoring path so they cannot
    drift.  ``dx``/``dy`` add fractional sub-cell refinement."""
    half_x, half_y = half_cells
    row = cell // width
    col = cell % width
    x_m = (col.astype(dtype) + dx - half_x) / cells_per_m
    y_m = (half_y - (row.astype(dtype) + dy)) / cells_per_m
    return jnp.stack([x_m, y_m], axis=-1)


def grid_peak_xy(
    scores: jnp.ndarray,
    grid_shape: tuple[int, int],
    half_cells: tuple[int, int],
    cells_per_m: float,
    refine: bool = True,
) -> jnp.ndarray:
    """Peak position [..., 2] in meters from flat scores [..., G+].

    Cell->meters mapping matches vga_init_heatmap:52-54; with ``refine`` a
    separable quadratic fit over the 3x3 neighborhood adds sub-cell accuracy.

    Works on flat (never reshaped) scores so the grid axis may be sharded
    and/or padded beyond H*W (padded cells must carry -inf-like scores; see
    ``pad_scores_bias``)."""
    h, w = grid_shape
    half_x, half_y = half_cells
    flat_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    row = flat_idx // w
    col = flat_idx % w

    def _take(idx):
        return jnp.take_along_axis(scores, idx[..., None], axis=-1)[..., 0]

    def _frac(center, axis_len, stride):
        c = jnp.clip(center, 1, axis_len - 2)
        base = flat_idx + (c - center) * stride  # clamped center, same line
        vm = _take(base - stride)
        v0 = _take(base)
        vp = _take(base + stride)
        den = vm - 2.0 * v0 + vp
        d = jnp.where(jnp.abs(den) > 1e-20, 0.5 * (vm - vp) / den, 0.0)
        d = jnp.where((center >= 1) & (center <= axis_len - 2), d, 0.0)
        return jnp.clip(d, -0.5, 0.5)

    if refine:
        dx = _frac(col, w, 1)
        dy = _frac(row, h, w)
    else:
        dx = jnp.zeros_like(col, dtype=scores.dtype)
        dy = jnp.zeros_like(row, dtype=scores.dtype)

    return cell_to_xy(flat_idx, w, half_cells, cells_per_m, dx, dy,
                      scores.dtype)


def pad_grid_axis(arr: np.ndarray, multiple: int, axis: int = -1,
                  fill=0.0) -> np.ndarray:
    """Pad the grid axis up to a multiple (for sharding G over a mesh axis)."""
    g = arr.shape[axis]
    pad = (-g) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def pad_scores_bias(num_cells: int, padded: int, dtype=np.float32) -> np.ndarray:
    """Additive bias [padded]: 0 on valid cells, -3e38 on pad cells so they
    can never win the argmax."""
    b = np.zeros((padded,), dtype=dtype)
    b[num_cells:] = -3e38
    return b


def top_k_peaks(
    scores: jnp.ndarray,
    cell_xy: jnp.ndarray,
    k: int,
    min_separation_m: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-source peak extraction (new capability; the reference heatmap
    shows one argmax implicitly).

    Greedy non-maximum suppression: k rounds of (argmax, suppress a
    ``min_separation_m``-radius disc around it).  scores [..., G],
    cell_xy [G, 2] meters.  Returns (peak_xy [..., k, 2], peak_score
    [..., k]); later peaks may repeat suppressed-floor cells if fewer than k
    distinct sources exist (rank by peak_score)."""
    import jax

    neg = jnp.asarray(-3e38, scores.dtype)
    r2 = min_separation_m * min_separation_m

    def round_fn(s, _):
        idx = jnp.argmax(s, axis=-1)  # [...]
        val = jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]
        xy = cell_xy[idx]  # [..., 2]
        d2 = jnp.sum(
            (cell_xy - xy[..., None, :]) ** 2, axis=-1)  # [..., G]
        s = jnp.where(d2 <= r2, neg, s)
        return s, (xy, val)

    _, (xys, vals) = jax.lax.scan(round_fn, scores, None, length=k)
    # scan stacks on axis 0 -> move k next to the batch dims
    xys = jnp.moveaxis(xys, 0, -2)
    vals = jnp.moveaxis(vals, 0, -1)
    return xys, vals


def auto_srp_form(num_pairs: int, num_lags: int, num_cells: int,
                  onehot_budget_bytes: int = 256 * 1024 * 1024) -> str:
    """Pick 'matmul' when the one-hot steering matrix fits the budget,
    else 'gather' (large arrays, e.g. 64 mics -> 2016 pairs)."""
    onehot_bytes = num_pairs * num_lags * num_cells * 4
    return "matmul" if onehot_bytes <= onehot_budget_bytes else "gather"
