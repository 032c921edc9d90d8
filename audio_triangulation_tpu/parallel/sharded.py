"""Sharded (multi-chip) execution of the localization pipeline.

Strategy (the scaling-book recipe): pick a mesh, annotate input/output
shardings, let XLA insert the collectives.

- **Data parallel**: frames [B, M, N] sharded on batch over the ``data``
  axis; params replicated.  No communication in the forward pass except the
  final (host-bound) outputs — each chip localizes its shard of frames.
- **Grid parallel** (large arrays / dense grids): the steering one-hot
  [P*L, G] and scores [B, G] are additionally partitioned on G over the
  ``model`` axis.  The grid argmax then requires a cross-chip reduction,
  which XLA emits from the sharding annotations alone.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

import jax

from ..models import localizer as localizer_mod
from . import mesh as mesh_lib


def shard_params(params: localizer_mod.LocalizerParams, mesh,
                 grid_parallel: bool = False) -> localizer_mod.LocalizerParams:
    """Place params on the mesh: replicated, except the steering matrix's
    grid axis when grid_parallel.

    Grid-parallel pads the grid axis up to a multiple of the model-axis size
    (zero columns in the steering matrix, -inf score bias so padding never
    wins the argmax)."""
    import numpy as np

    from ..ops import srp as srp_ops

    rep = mesh_lib.replicated(mesh)
    put = lambda x: jax.device_put(x, rep)  # noqa: E731

    onehot = params.onehot
    lut_flat = params.lut_flat
    score_bias = params.score_bias
    if grid_parallel:
        model_n = mesh.shape[mesh_lib.MODEL_AXIS]
        g = lut_flat.shape[-1]
        lut_flat = jnp.asarray(srp_ops.pad_grid_axis(
            np.asarray(lut_flat), model_n))
        g_pad = lut_flat.shape[-1]
        if g_pad != g or score_bias is None:
            score_bias = jnp.asarray(srp_ops.pad_scores_bias(g, g_pad))
        if onehot is not None:
            onehot = jnp.asarray(srp_ops.pad_grid_axis(
                np.asarray(onehot), model_n))
        lut_flat = jax.device_put(lut_flat, mesh_lib.onehot_sharding(mesh))
        score_bias = jax.device_put(
            score_bias,
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(mesh_lib.MODEL_AXIS)))
        if onehot is not None:
            onehot = jax.device_put(onehot, mesh_lib.onehot_sharding(mesh))
    else:
        lut_flat = put(lut_flat)
        if onehot is not None:
            onehot = put(onehot)
        if score_bias is not None:
            score_bias = put(score_bias)

    return localizer_mod.LocalizerParams(
        mic_positions=put(params.mic_positions),
        pairs=put(params.pairs),
        window=put(params.window),
        lut_flat=lut_flat,
        onehot=onehot,
        score_bias=score_bias,
    )


def make_sharded_localize(loc: localizer_mod.Localizer, mesh,
                          grid_parallel: bool = False):
    """Returns (fn, sharded_params): ``fn(params, frames)`` jitted with
    sharding constraints for the given mesh.

    frames must have batch divisible by the data-axis size."""
    params = shard_params(loc.params, mesh, grid_parallel)
    import numpy as np

    fn = functools.partial(
        localizer_mod.localize_frames,
        cfg=loc.pipeline,
        grid_cfg=loc.grid,
        solver_cfg=loc.solver,
        srp_form=loc.srp_form,
        with_solver=loc.with_solver,
        with_heatmap=loc.with_heatmap,
        pairs_static=tuple(
            tuple(int(v) for v in row) for row in np.asarray(loc.params.pairs)),
    )
    jitted = jax.jit(
        fn,
        in_shardings=(None, mesh_lib.frames_sharding(mesh)),
    )
    return jitted, params


def make_sharded_stream_step(sl, mesh):
    """Multi-chip streaming serving: S concurrent streams sharded over the
    mesh's ``data`` axis in ONE device program.

    Returns (fn, init_states) where ``init_states(S)`` places a stacked
    :class:`~...models.streaming.StreamState` for S streams with each leaf
    sharded on its leading (stream) axis, and ``fn(states, chunks)`` — with
    chunks [S, M, C] sharded the same way — advances every stream one step
    (state donated in place, outputs stream-sharded).  Each chip serves its
    shard of streams with zero cross-chip communication: the embarrassingly
    parallel production-serving shape (thousands of real-time arrays per
    chip, scaled linearly by the mesh; the single-chip measured capacity is
    ~2.9k real-time 50 kHz streams, docs/PERFORMANCE.md).

    S must be divisible by the data-axis size.  Analogue of the reference's
    idle second core (pt_cornell_rp2040_v1_3.h:629-682) finally put to
    work — every stream is an independent pipeline instance.
    """
    from ..models import streaming as streaming_mod

    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(mesh_lib.DATA_AXIS))

    one = functools.partial(
        streaming_mod.stream_step,
        params=sl.params,
        cfg=sl.pipeline,
        grid_cfg=sl.grid,
        solver_cfg=sl.solver,
        srp_form=sl.srp_form,
        max_events=sl.stream.max_events_per_chunk,
        refractory=sl.stream.refractory_samples,
        with_solver=sl.with_solver,
        n_sources=sl.stream.n_sources,
        multi_min_separation_m=sl.stream.multi_min_separation_m,
        multi_assoc_window=sl.stream.multi_assoc_window_samples,
        solve_xyz=sl.stream.solve_xyz,
        xyz_z_inits=sl.stream.xyz_z_inits,
        solve_velocity=sl.stream.solve_velocity,
        velocity_v_max=sl.stream.velocity_v_max,
        velocity_n_scales=sl.stream.velocity_n_scales,
    )

    def vstep(states, chunks, caf_resample=None):
        # resample matrices shared (unbatched) across streams; closed over
        # INSIDE the jit so they remain a traced argument
        return jax.vmap(
            lambda s, c: one(s, c, caf_resample=caf_resample)
        )(states, chunks)

    # solve_velocity's resampling matrices ride as a REPLICATED jit argument
    # (the StreamingLocalizer already computes them; as a closure constant
    # they would bake ~138 MB of HLO into the sharded program — the
    # PERFORMANCE.md jit-closure footgun, worst on the multi-chip path)
    caf_resample = sl._caf_resample
    if caf_resample is not None:
        caf_resample = jax.device_put(caf_resample, mesh_lib.replicated(mesh))

    # the single spec is a pytree prefix: every state leaf / the chunk array
    # shards its leading (stream) axis, trailing dims replicated
    jitted = jax.jit(vstep, in_shardings=(spec, spec, None),
                     donate_argnums=(0,))

    def fn(states, chunks):
        return jitted(states, chunks, caf_resample)

    def init_states(n_streams: int):
        data_n = mesh.shape[mesh_lib.DATA_AXIS]
        if n_streams % data_n != 0:
            raise ValueError(
                f"{n_streams} streams not divisible by data axis {data_n}")
        states = sl.init_states(n_streams)
        return jax.tree.map(lambda x: jax.device_put(x, spec), states)

    return fn, init_states
