"""Production serving helpers: portable model export and AOT compilation.

The reference "deploys" by flashing a UF2 image (``CMakeLists.txt:114``,
picotool in ``.vscode/tasks.json``) — the artifact IS the program.  The TPU
analogue: serialize the jitted pipeline to a self-contained StableHLO
artifact (``jax.export``) that a serving process can load and run without
the framework's Python source, plus ahead-of-time compilation and a
persistent compilation cache so restarts never pay the 20-40 s first-jit.

- :func:`export_localizer` / :func:`load_exported`: one-file artifact with
  the array constants (window, steering matrices, geometry) baked in and a
  symbolic batch dimension, so any batch size runs from the same artifact.
- :func:`aot_compile`: lower+compile now, call later (latency-critical
  startup paths); also the place to read cost/memory analyses.
- :func:`enable_compilation_cache`: on-disk XLA executable cache shared
  across processes and restarts.

Note on kernels: an artifact records the lowering for the platforms it was
exported on.  Export on TPU captures the fused Pallas (Mosaic) kernels;
export on CPU captures the portable XLA path.  Pass
``platforms=("cpu", "tpu")`` with ``fused="off"`` to build one artifact
that runs anywhere through the pure-XLA path.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp


def _symbolic_batch(spec: str = "b"):
    from jax import export as jexport

    return jexport.symbolic_shape(spec)[0]


def export_localizer(
    loc,
    path: str | None = None,
    *,
    platforms: tuple[str, ...] | None = None,
    fused: str | None = None,
    with_heatmap: bool | None = None,
) -> bytes:
    """Serialize ``loc``'s full pipeline (frames [b, M, N] -> output dict)
    to a portable ``jax.export`` artifact with a symbolic batch dim.

    The localizer's array constants are closed over, so the artifact is
    self-contained: a server needs only jax and :func:`load_exported`.
    Returns the serialized bytes; also writes them to ``path`` if given.

    ``fused`` overrides PipelineConfig.fused_kernel for the exported
    program (pass "off" for a platform-portable pure-XLA artifact);
    ``with_heatmap`` overrides the heatmap output flag."""
    from jax import export as jexport

    from ..models import localizer as localizer_mod

    cfg = loc.pipeline
    if fused is not None:
        cfg = dataclasses.replace(cfg, fused_kernel=fused)
    heat = loc.with_heatmap if with_heatmap is None else with_heatmap
    params = loc.params
    fn = functools.partial(
        localizer_mod.localize_frames,
        params,
        cfg=cfg,
        grid_cfg=loc.grid,
        solver_cfg=loc.solver,
        srp_form=loc.srp_form,
        with_solver=loc.with_solver,
        with_heatmap=heat,
        pairs_static=tuple(tuple(int(v) for v in row)
                           for row in np.asarray(params.pairs)),
        mics_static=tuple(tuple(float(v) for v in row)
                          for row in np.asarray(params.mic_positions)),
    )
    m = params.mic_positions.shape[0]
    n = cfg.frame_size
    b = _symbolic_batch()
    spec = jax.ShapeDtypeStruct((b, m, n), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jexport.export(jax.jit(fn), **kwargs)(spec)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Load an :func:`export_localizer` artifact -> ``fn(frames)`` callable
    returning the pipeline's output dict.  Works in a process that never
    imports the framework's model code."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)

    def fn(frames):
        return exported.call(jnp.asarray(frames, jnp.float32))

    fn.exported = exported
    return fn


def aot_compile(loc, batch: int):
    """Ahead-of-time compile the pipeline at a fixed batch size.

    Returns the compiled executable (callable with ``(params, frames)``);
    ``.cost_analysis()`` / ``.memory_analysis()`` expose XLA's estimates —
    the programmatic form of docs/PERFORMANCE.md's roofline numbers."""
    m = loc.params.mic_positions.shape[0]
    n = loc.pipeline.frame_size
    spec = jax.ShapeDtypeStruct((batch, m, n), jnp.float32)
    return loc.lower(spec).compile()


def enable_compilation_cache(cache_dir: str) -> None:
    """Persist compiled XLA executables to ``cache_dir`` so subsequent
    processes (or restarts) skip compilation entirely — the deployment
    analogue of shipping the reference's prebuilt UF2."""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # jax initializes its cache backend lazily and then pins it: if any
    # compilation already touched a previously-configured cache in this
    # process, the dir update above would be silently ignored without a
    # reset.
    try:
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc)

        _cc.reset_cache()
    except Exception:
        pass
