"""Fused SRP scoring + grid argmax Pallas kernel.

The unfused path materializes scores [B, G] in HBM (B=16k, G=10201 -> 668 MB
written + read back by the argmax) even when the caller only needs the peak
cell.  This kernel tiles the grid axis, computes each [TB, GT] score block on
the MXU, and carries a running (max, argmax) in VMEM scratch across grid
tiles — scores never exist in HBM.

First-max-wins semantics match jnp.argmax (strictly-greater update keeps the
earliest tile; a min-index reduction picks the earliest column within a
tile), i.e. the reference's ``>`` scan (vga_draw_heatmap:99-108).

Measured honestly: at B = 16k, G = 10201 this is ~8% SLOWER than XLA's
materialized matmul+argmax (3.24 vs 3.00 ms) — XLA hides the HBM round-trip
well at these sizes.  Use it when the [B, G] score buffer itself is the
problem (very large B x G would not fit HBM), not as a speedup.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(corr_ref, onehot_ref, val_ref, idx_ref, vscr, iscr,
            *, num_cells, gt, bf16):
    g = pl.program_id(1)
    ng = pl.num_programs(1)
    a = corr_ref[:]
    w = onehot_ref[:]
    if bf16:
        a = a.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
    scores = jnp.dot(a, w, preferred_element_type=jnp.float32)  # [TB, GT]
    tb = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, gt), 1) + g * gt
    scores = jnp.where(col < num_cells, scores, jnp.float32(-3e38))

    tile_max = jnp.max(scores, axis=-1, keepdims=True)  # [TB, 1]
    is_max = scores == tile_max
    tile_idx = jnp.min(
        jnp.where(is_max, col, num_cells + gt), axis=-1, keepdims=True)

    @pl.when(g == 0)
    def _():
        vscr[:, :1] = tile_max
        iscr[:, :1] = tile_idx

    @pl.when(g > 0)
    def _():
        better = tile_max > vscr[:, :1]
        vscr[:, :1] = jnp.where(better, tile_max, vscr[:, :1])
        iscr[:, :1] = jnp.where(better, tile_idx, iscr[:, :1])

    @pl.when(g == ng - 1)
    def _():
        val_ref[:, :1] = vscr[:, :1]
        idx_ref[:, :1] = iscr[:, :1]
        val_ref[:, 1:] = jnp.zeros_like(val_ref[:, 1:])
        idx_ref[:, 1:] = jnp.zeros_like(idx_ref[:, 1:])


@functools.partial(
    jax.jit, static_argnames=("num_cells", "tile_b", "gt", "bf16",
                              "interpret"))
def _call(corr_flat, onehot_padded, num_cells, tile_b, gt, bf16, interpret):
    b, pl_dim = corr_flat.shape
    g_pad = onehot_padded.shape[1]
    ng = g_pad // gt
    kernel = functools.partial(
        _kernel, num_cells=num_cells, gt=gt, bf16=bf16)
    val, idx = pl.pallas_call(
        kernel,
        grid=(b // tile_b, ng),
        in_specs=[
            pl.BlockSpec((tile_b, pl_dim), lambda bi, gi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl_dim, gt), lambda bi, gi: (0, gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, 128), lambda bi, gi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda bi, gi: (bi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, 128), jnp.float32),
            pltpu.VMEM((tile_b, 128), jnp.int32),
        ],
        interpret=interpret,
    )(corr_flat, onehot_padded)
    return val[:, 0], idx[:, 0]


def srp_argmax(
    correlograms: jnp.ndarray,
    onehot: jnp.ndarray,
    num_cells: int,
    *,
    tile_b: int = 256,
    gt: int = 2048,
    bf16: bool = False,
    interpret: bool = False,
):
    """(best_score [B], best_cell [B]) without materializing [B, G] scores.

    correlograms [B, P, L]; onehot [P*L, G] (G may exceed num_cells due to
    padding — padded cells are masked).  B is padded to tile_b internally."""
    b, p, l = correlograms.shape
    flat = correlograms.reshape(b, p * l)
    pad_b = (-b) % tile_b
    if pad_b:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad_b, p * l), flat.dtype)], axis=0)
    g = onehot.shape[1]
    pad_g = (-g) % gt
    onehot_p = onehot
    if pad_g:
        onehot_p = jnp.concatenate(
            [onehot, jnp.zeros((onehot.shape[0], pad_g), onehot.dtype)],
            axis=1)
    val, idx = _call(flat, onehot_p, num_cells, tile_b, gt, bf16, interpret)
    return val[:b], idx[:b]
