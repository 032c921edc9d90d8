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


def restore(path: str, like: Any) -> Any:
    """Restore a checkpoint into the structure of ``like`` (a template
    pytree with the right shapes/dtypes)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(os.path.abspath(path), target=like)
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        leaves.append(
            jax.numpy.asarray(arr).astype(ref.dtype)
            if hasattr(ref, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _orbax_available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:
        return False
