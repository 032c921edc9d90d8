"""Explicit-SPMD execution with shard_map and hand-placed collectives.

`parallel.sharded` lets XLA derive collectives from sharding annotations (the
default, compiler-driven path).  This module is the manually-scheduled
alternative for when you want the collectives in the program text — the
scaling-book progression: annotate first, shard_map when you need control.

``localize_grid_spmd`` partitions the SRP grid over the ``model`` axis: every
device scores only its grid shard (its slice of the steering matrix), finds
its local argmax, and a cross-device argmax reduction (max + where + psum)
selects the global winner — the explicit form of what XLA emits for the
annotated path.  Frames ride the ``data`` axis untouched.
"""

from __future__ import annotations



import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


from ..models import localizer as localizer_mod
from ..ops import srp
from . import mesh as mesh_lib


def make_spmd_grid_localizer(loc: localizer_mod.Localizer, mesh):
    """Returns ``fn(frames) -> {'xy_grid', 'best_cell', 'best_score',
    'tdoa_samples'}`` running under shard_map on the given mesh.

    The steering one-hot is pre-split over the model axis (padded to divide
    evenly); each device holds only its shard."""
    assert loc.srp_form == "matmul", "spmd grid path uses the matmul form"
    model_n = mesh.shape[mesh_lib.MODEL_AXIS]
    onehot = np.asarray(loc.params.onehot)
    g = onehot.shape[1]
    onehot_p = srp.pad_grid_axis(onehot, model_n)
    bias = srp.pad_scores_bias(g, onehot_p.shape[1])
    g_shard = onehot_p.shape[1] // model_n

    cfg = loc.pipeline
    grid_cfg = loc.grid
    params = loc.params
    pairs_static = tuple(
        tuple(int(v) for v in row) for row in np.asarray(params.pairs))

    onehot_dev = jax.device_put(
        jnp.asarray(onehot_p), mesh_lib.onehot_sharding(mesh))
    bias_dev = jax.device_put(
        jnp.asarray(bias),
        jax.sharding.NamedSharding(mesh, P(mesh_lib.MODEL_AXIS)))

    def per_device(frames_shard, onehot_shard, bias_shard):
        """frames_shard [b/data, M, N]; onehot_shard [P*L, G/model]."""
        corr = localizer_mod._conditioned_correlograms(
            params, frames_shard, cfg, pairs_static)
        from ..ops import xcorr as xcorr_ops

        k = cfg.max_shift
        shifts = xcorr_ops.best_lag(corr, k)
        tdoa, _ = xcorr_ops.subsample_peak(corr, k)
        corr_t = xcorr_ops.peak_taper(corr, k, cfg.taper_denom, shifts)

        local_scores = srp.srp_scores_matmul(corr_t, onehot_shard)
        local_scores = local_scores + bias_shard  # -inf on padding
        local_max = jnp.max(local_scores, axis=-1)  # [b]
        local_arg = jnp.argmax(local_scores, axis=-1).astype(jnp.int32)
        # globalize the cell index: offset by this device's grid shard
        my_shard = jax.lax.axis_index(mesh_lib.MODEL_AXIS)
        local_arg = local_arg + my_shard * g_shard

        # cross-device argmax: max-reduce the score, then select the index
        global_max = jax.lax.pmax(local_max, mesh_lib.MODEL_AXIS)
        is_winner = local_max == global_max
        # exactly-one-winner guard: lowest shard id wins ties
        winner_rank = jnp.where(is_winner, my_shard, model_n)
        min_rank = jax.lax.pmin(winner_rank, mesh_lib.MODEL_AXIS)
        contrib = jnp.where(winner_rank == min_rank, local_arg, 0)
        global_arg = jax.lax.psum(contrib, mesh_lib.MODEL_AXIS)

        xy = srp.cell_to_xy(
            global_arg, grid_cfg.width,
            (grid_cfg.half_cells_x, grid_cfg.half_cells_y),
            grid_cfg.cells_per_m)
        return xy, global_arg, global_max, tdoa

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(mesh_lib.DATA_AXIS, None, None),
                  P(None, mesh_lib.MODEL_AXIS),
                  P(mesh_lib.MODEL_AXIS)),
        out_specs=(P(mesh_lib.DATA_AXIS, None), P(mesh_lib.DATA_AXIS),
                   P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS, None)),
        check_vma=False,
    )

    @jax.jit
    def fn(frames):
        xy, cell, score, tdoa = mapped(frames, onehot_dev, bias_dev)
        return {"xy_grid": xy, "best_cell": cell, "best_score": score,
                "tdoa_samples": tdoa}

    return fn


def make_spmd_pair_localizer(loc: localizer_mod.Localizer, mesh):
    """2-D sharding for large arrays (SURVEY §7 hard part (e)): the PAIR axis
    is partitioned over ``model`` while frames ride ``data``.

    Each device DFTs its frame shard once, forms cross-power + correlograms
    for only its pair shard, scores the full grid from those pairs (one-hot
    built on the fly), and a ``psum`` over the model axis completes the sum
    over pairs — SRP's pair sum is associative, so pair-sharding composes
    exactly.  Use when P >> batch (e.g. 64 mics, 2016 pairs)."""
    cfg = loc.pipeline
    grid_cfg = loc.grid
    params = loc.params
    # capture ONLY the window: closing over the whole params would pin the
    # host localizer's own precomputed steering matrix (params.onehot_big,
    # ~589 MB at 2016 pairs) in this wrapper's closure — the SPMD path
    # builds its own pair-sharded copy below
    window = params.window
    model_n = mesh.shape[mesh_lib.MODEL_AXIS]

    pairs_np = np.asarray(params.pairs)
    p = pairs_np.shape[0]
    pad = (-p) % model_n
    # padded pairs are (0, 0): their correlogram is mic0 auto-correlation,
    # masked out of the score sum below
    pairs_padded = np.concatenate(
        [pairs_np, np.zeros((pad, 2), pairs_np.dtype)])
    pair_valid = np.concatenate(
        [np.ones(p, np.float32), np.zeros(pad, np.float32)])
    lut_np = np.asarray(params.lut_flat)
    lut_padded = np.concatenate(
        [lut_np, np.zeros((pad, lut_np.shape[1]), lut_np.dtype)])

    pairs_dev = jax.device_put(
        jnp.asarray(pairs_padded),
        jax.sharding.NamedSharding(mesh, P(mesh_lib.MODEL_AXIS, None)))
    valid_dev = jax.device_put(
        jnp.asarray(pair_valid),
        jax.sharding.NamedSharding(mesh, P(mesh_lib.MODEL_AXIS)))
    lut_dev = jax.device_put(
        jnp.asarray(lut_padded),
        jax.sharding.NamedSharding(mesh, P(mesh_lib.MODEL_AXIS, None)))

    from ..ops import mxu_fft, srp as srp_ops, xcorr as xcorr_ops

    # precomputed steering matrix, PAIR-AXIS SHARDED ([P_shard, L8, G] per
    # device): same r3 fast path as the single-chip large-array scoring —
    # the blocked scan's per-chunk one-hot construction cost ~5x its own
    # matmul (docs/PERFORMANCE.md).  Gated on the PER-DEVICE shard fitting
    # the HBM budget (the full matrix is split over the model axis).
    # Padded pairs select lag 0, but their correlograms are zeroed by the
    # valid mask, so scores are exact.
    g_cells = lut_np.shape[-1]
    l8 = srp_ops.sublane_pad_lags(cfg.num_lags)
    itemsize = 2 if cfg.srp_dtype == "bfloat16" else 4
    shard_bytes = (p + pad) * l8 * g_cells * itemsize // model_n
    oh_dev = None
    if (p > 256 and cfg.srp_big_matmul_budget_bytes > 0
            and shard_bytes <= cfg.srp_big_matmul_budget_bytes):
        # build each device's [P/n, L8, G] steering shard UNDER the target
        # sharding (lut_dev is already pair-sharded, so GSPMD keeps the
        # construction local): materializing the full matrix on one device
        # first would transiently allocate model_n x the per-shard budget
        # the gate checks — an OOM in exactly the large-array regime this
        # path serves
        steer_dt = jnp.bfloat16 if cfg.srp_dtype == "bfloat16" \
            else jnp.float32

        def _steer(lf):
            lanes = jnp.arange(l8, dtype=lf.dtype)
            return (lf[:, None, :] == lanes[None, :, None]).astype(steer_dt)

        oh_dev = jax.jit(
            _steer,
            out_shardings=jax.sharding.NamedSharding(
                mesh, P(mesh_lib.MODEL_AXIS, None, None)))(lut_dev)

    def per_device(frames_shard, pairs_shard, valid_shard, lut_shard,
                   oh_shard=None):
        x = localizer_mod.condition_frames(frames_shard, window, cfg)
        re, im = mxu_fft.forward_spectra(x, cfg.fft_length, cfg.matmul_dtype,
                                         mxu_fft.dft_prec(cfg))
        rr, jj = mxu_fft.cross_power_reim(
            re, im, pairs_shard, phat=cfg.phat, phat_eps=cfg.phat_eps)
        syn_c, syn_s = mxu_fft.lag_synthesis_matrices(
            cfg.fft_length, cfg.max_shift, "float32")
        corr = mxu_fft.lag_correlogram(
            rr, jj, jnp.asarray(syn_c), jnp.asarray(syn_s))
        k = cfg.max_shift
        shifts = xcorr_ops.best_lag(corr, k)
        corr_t = xcorr_ops.peak_taper(corr, k, cfg.taper_denom, shifts)
        corr_t = corr_t * valid_shard[:, None]  # zero padded pairs

        if oh_shard is not None:
            local_scores = srp_ops.srp_scores_matmul_big(
                corr_t, oh_shard.reshape(-1, oh_shard.shape[-1]),
                dtype=cfg.srp_dtype)
        else:
            local_scores = srp_ops.srp_scores_matmul_blocked(
                corr_t, lut_shard, cfg.num_lags,
                pair_chunk=min(128, corr_t.shape[-2]))
        scores = jax.lax.psum(local_scores, mesh_lib.MODEL_AXIS)
        xy = srp_ops.grid_peak_xy(
            scores, (grid_cfg.height, grid_cfg.width),
            (grid_cfg.half_cells_x, grid_cfg.half_cells_y),
            grid_cfg.cells_per_m)
        return scores, xy

    in_specs = [P(mesh_lib.DATA_AXIS, None, None),
                P(mesh_lib.MODEL_AXIS, None),
                P(mesh_lib.MODEL_AXIS),
                P(mesh_lib.MODEL_AXIS, None)]
    if oh_dev is not None:
        in_specs.append(P(mesh_lib.MODEL_AXIS, None, None))
    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(mesh_lib.DATA_AXIS, None), P(mesh_lib.DATA_AXIS, None)),
        check_vma=False,
    )

    @jax.jit
    def fn(frames):
        extra = (oh_dev,) if oh_dev is not None else ()
        scores, xy = mapped(frames, pairs_dev, valid_dev, lut_dev, *extra)
        return {"scores": scores, "xy_grid": xy}

    # let callers (tests, dryrun) see which scoring path was selected
    fn.big_steering = oh_dev is not None
    return fn


def make_fusion_spmd(fus, mesh):
    """Multi-array fusion (``models.fusion``) with the ARRAY axis sharded
    over ``model`` and frames over ``data``.

    Each device holds only its arrays' steering matrices and computes their
    correlograms + partial world-grid scores; a ``psum`` over the model axis
    fuses the score maps, an ``all_gather`` assembles the joint TDOA vector,
    and the joint Gauss-Newton solve runs replicated (it is tiny next to
    the scoring matmuls).  Requires K divisible by the model-axis size."""
    from ..models import fusion as fusion_mod
    from ..ops import solver as solver_ops, srp as srp_ops

    cfg = fus.pipeline
    grid_cfg = fus.grid
    solver_cfg = fus.solver
    params = fus.params
    model_n = mesh.shape[mesh_lib.MODEL_AXIS]
    k = int(params.mic_world.shape[0])
    p = int(params.pairs.shape[0])
    if k % model_n:
        raise ValueError(f"{k} arrays not divisible by model axis {model_n}")
    pairs_static = tuple(
        tuple(int(v) for v in row) for row in np.asarray(params.pairs))

    onehot_dev = jax.device_put(
        params.onehot,
        jax.sharding.NamedSharding(mesh, P(mesh_lib.MODEL_AXIS, None, None)))

    def per_device(frames_shard, onehot_shard, weights_shard):
        """frames_shard [b/data, K/model, M, N]."""
        corr_t, shifts, tdoa, psr = fusion_mod.fusion_correlograms(
            params, frames_shard, cfg, pairs_static)
        partial = fusion_mod.fused_scores(
            corr_t, onehot_shard, weights_shard, cfg.srp_dtype)
        scores = jax.lax.psum(partial, mesh_lib.MODEL_AXIS)      # [b, G]
        xy_grid = srp_ops.grid_peak_xy(
            scores, (grid_cfg.height, grid_cfg.width),
            (grid_cfg.half_cells_x, grid_cfg.half_cells_y),
            grid_cfg.cells_per_m, refine=False)
        # joint solve needs every array's TDOAs and weights
        tdoa_all = jax.lax.all_gather(
            tdoa, mesh_lib.MODEL_AXIS, axis=1, tiled=True)       # [b, K, P]
        w_all = jax.lax.all_gather(
            weights_shard, mesh_lib.MODEL_AXIS, tiled=True)      # [K]
        b = tdoa_all.shape[0]
        tdoa_s = tdoa_all.reshape(b, k * p) / cfg.sample_rate_hz
        xy, rms = solver_ops.solve_tdoa_batched(
            tdoa_s, params.cat_mics, params.cat_pairs,
            speed_of_sound=cfg.speed_of_sound_mps,
            height=grid_cfg.height_m, init_xy=xy_grid,
            weights=jnp.repeat(w_all, p), cfg=solver_cfg)
        return scores, xy_grid, xy, rms, tdoa_all

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS, None, None),
                  P(mesh_lib.MODEL_AXIS, None, None),
                  P(mesh_lib.MODEL_AXIS)),
        out_specs=(P(mesh_lib.DATA_AXIS, None), P(mesh_lib.DATA_AXIS, None),
                   P(mesh_lib.DATA_AXIS, None), P(mesh_lib.DATA_AXIS),
                   P(mesh_lib.DATA_AXIS, None, None)),
        check_vma=False,
    )

    @jax.jit
    def fn(frames, weights=None):
        w = (jnp.ones((k,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        scores, xy_grid, xy, rms, tdoa = mapped(frames, onehot_dev, w)
        return {"scores": scores, "xy_grid": xy_grid, "xy": xy,
                "rms_m": rms, "tdoa_samples": tdoa}

    return fn
