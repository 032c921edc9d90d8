"""Small linear-algebra helpers for TPU-unsupported dtypes.

The TPU backend has no complex LU factorization — ``jnp.linalg.solve`` on
complex operands fails with ``UNIMPLEMENTED: TPU backend error``.  The
standard remedy is the real block embedding: for R = A + iB and
b = u + iv,

    [ A  -B ] [x_r]   [u]
    [ B   A ] [x_i] = [v]

is an ordinary real solve of twice the size, which the TPU supports.  For
the Hermitian (A symmetric, B antisymmetric) covariances the beamformers
use, the block matrix is symmetric — LU handles it fine at these sizes.
"""

from __future__ import annotations

import jax.numpy as jnp


def complex_solve(r: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``jnp.linalg.solve`` for complex systems, TPU-compatible.

    r: [..., M, M] complex; b: [..., M, K] complex (K may be 1).
    Returns [..., M, K] complex64/128 matching the promoted input dtype."""
    a_r, a_i = jnp.real(r), jnp.imag(r)
    b_r, b_i = jnp.real(b), jnp.imag(b)
    top = jnp.concatenate([a_r, -a_i], axis=-1)
    bot = jnp.concatenate([a_i, a_r], axis=-1)
    block = jnp.concatenate([top, bot], axis=-2)   # [..., 2M, 2M] real
    rhs = jnp.concatenate([b_r, b_i], axis=-2)     # [..., 2M, K] real
    x = jnp.linalg.solve(block, rhs)
    m = r.shape[-1]
    return x[..., :m, :] + 1j * x[..., m:, :]
