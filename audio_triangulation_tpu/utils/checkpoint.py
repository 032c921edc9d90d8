"""Checkpoint / resume.

The reference has none (SURVEY.md §5); its only cross-frame state is the
EMA'd correlogram triple updated in place (``src/components/correlations.c:
38-63``).  Here every stateful object is a pytree, so checkpointing is
generic: stream state (ring context + EMA correlograms + clocks), calibration
parameters and optimizer state all (de)serialize through the same two calls.

Orbax is used when available (async, sharding-aware — the production path);
a plain ``.npz`` fallback keeps checkpoints working anywhere.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def save(path: str, tree: Any, *, use_orbax: bool | None = None) -> str:
    """Serialize a pytree checkpoint.  Returns the written path."""
    if use_orbax is None:
        use_orbax = _orbax_available() and not path.endswith(".npz")
    if use_orbax:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), tree, force=True)
        ckpt.wait_until_finished()
        return path
    if not path.endswith(".npz"):
        path = path + ".npz"
    paths, leaves, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__paths__"] = np.asarray(json.dumps(paths))
    np.savez(path, **arrays)
    return path


def restore(path: str, like: Any, *, partial: bool = False) -> Any:
    """Restore a checkpoint into the structure of ``like`` (a template
    pytree with the right shapes/dtypes).

    npz archives written by :func:`save` carry each leaf's key-path, and
    leaves are matched BY PATH — so a checkpoint saved under a different
    state structure (e.g. a plain stream checkpoint resumed into a
    tracked-stream template after an upgrade) raises a ``ValueError``
    naming the mismatch instead of silently misassigning leaves by index.
    ``partial=True`` instead keeps the template's value for leaves missing
    from the archive and ignores archived extras (resume a subset of a
    grown state)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(os.path.abspath(path), target=like)
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    paths_like, leaves_like, treedef = _flatten_with_paths(like)

    def _cast(arr, ref):
        return (jax.numpy.asarray(arr).astype(ref.dtype)
                if hasattr(ref, "dtype") else arr)

    if "__paths__" in data:
        saved_paths = json.loads(str(data["__paths__"]))
        by_path = {p: data[f"leaf_{i}"] for i, p in enumerate(saved_paths)}
        like_set = set(paths_like)
        missing = [p for p in paths_like if p not in by_path]
        extra = [p for p in saved_paths if p not in like_set]
        if (missing or extra) and not partial:
            raise ValueError(
                f"checkpoint structure mismatch for {path}: "
                f"{len(missing)} template leaves not in archive "
                f"(e.g. {missing[:3]}), {len(extra)} archived leaves not "
                f"in template (e.g. {extra[:3]}); pass partial=True to "
                f"restore the intersection")
        leaves = [
            _cast(by_path[p], ref) if p in by_path else ref
            for p, ref in zip(paths_like, leaves_like)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # legacy archive without key-paths: positional match, guarded
    n_saved = len([k for k in data.files if k.startswith("leaf_")])
    if n_saved != len(leaves_like):
        raise ValueError(
            f"checkpoint {path} has {n_saved} leaves but the template "
            f"expects {len(leaves_like)} — saved under a different "
            f"configuration")
    leaves = [_cast(data[f"leaf_{i}"], ref)
              for i, ref in enumerate(leaves_like)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _orbax_available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:
        return False
