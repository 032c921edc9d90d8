"""Framework interop: zero-copy(ish) bridges to/from PyTorch and NumPy.

For users migrating pipelines: torch CPU tensors exchange with JAX via
dlpack; device placement happens on the JAX side.  Gated so torch is an
optional dependency.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def torch_available() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


def from_torch(tensor) -> jnp.ndarray:
    """torch.Tensor (CPU) -> jax Array (moved to the default device)."""
    import torch

    t = tensor.detach().contiguous()
    if t.device.type != "cpu":
        t = t.cpu()
    try:
        return jnp.from_dlpack(t)
    except Exception:
        return jnp.asarray(np.asarray(t))


def to_torch(array: jnp.ndarray):
    """jax Array -> torch.Tensor (CPU)."""
    import torch

    try:
        return torch.from_dlpack(jax.device_get(array))
    except Exception:
        # copy: jax buffers are immutable and torch warns on non-writable
        return torch.from_numpy(np.array(array, copy=True))
