"""Device mesh construction and sharding specs.

The reference's only multi-processor scaffolding is the unused dual-core
protothreads FIFO/spinlock layer (``pt_cornell_rp2040_v1_3.h:629-682``).  The
TPU-native equivalent is a ``jax.sharding.Mesh`` with named axes:

- ``data``  — frames/batch axis (the analogue of handing alternate captures
  to the second core)
- ``model`` — SRP grid / pair axis for large arrays where the steering
  matrix itself must be partitioned

Shardings are expressed with ``NamedSharding`` + ``PartitionSpec``; XLA
inserts the ICI collectives (psum for the grid argmax, all-gathers for
replicated params).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    mesh_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the data axis (pure DP), model axis size 1.
    ``mesh_shape`` must multiply to the device count when given."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh shape {mesh_shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """[B, M, N] frames: shard batch over data, replicate mics/samples."""
    return NamedSharding(mesh, P(DATA_AXIS, None, None))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading-axis batch sharding for an ndim-dim output."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def onehot_sharding(mesh: Mesh) -> NamedSharding:
    """Steering matrix [P*L, G]: partition the grid axis over model."""
    return NamedSharding(mesh, P(None, MODEL_AXIS))


def scores_sharding(mesh: Mesh) -> NamedSharding:
    """SRP scores [B, G]: data x model."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
