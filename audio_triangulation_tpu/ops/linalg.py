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


def complex_eigh(r: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``jnp.linalg.eigh`` for complex Hermitian matrices, TPU-compatible.

    The TPU backend has no complex eigendecomposition; for Hermitian
    R = A + iB (A symmetric, B antisymmetric) the real block embedding
    E = [[A, -B], [B, A]] is real symmetric and spectrally equivalent:
    every eigenpair (lam, v = p + iq) of R yields two real eigenpairs of E,
    (lam, [p; q]) and (lam, [-q; p]) — multiplication by i is an orthogonal
    map of the embedding that preserves each eigenspace.  So eigh(E) gives
    each eigenvalue of R twice, and a real eigenvector w = [p; q] maps back
    to a complex eigenvector p + iq.

    r: [..., M, M] complex Hermitian.  Returns (w, v): eigenvalues
    [..., M] ascending and eigenvectors [..., M, M] complex with
    ``r @ v[..., k] == w[..., k] * v[..., k]``.  NOTE: for eigenVALUE-
    degenerate R the returned per-column vectors are an arbitrary basis of
    each eigenspace (exactly as with ``numpy.linalg.eigh``); subspace
    projectors built from them (see ``subspace_projector_terms``) are
    well-defined regardless.
    """
    a_r, a_i = jnp.real(r), jnp.imag(r)
    top = jnp.concatenate([a_r, -a_i], axis=-1)
    bot = jnp.concatenate([a_i, a_r], axis=-1)
    block = jnp.concatenate([top, bot], axis=-2)   # [..., 2M, 2M] real sym
    w2, v2 = jnp.linalg.eigh(block)                # ascending
    m = r.shape[-1]
    # each eigenvalue of R appears (at least) twice consecutively in the
    # ascending w2; take every other copy.  The matching columns of v2 map
    # to complex eigenvectors of the SAME eigenvalues (any real eigenvector
    # of E with eigenvalue lam maps to a complex eigenvector of R for lam).
    w = w2[..., ::2]
    v = v2[..., :m, ::2] + 1j * v2[..., m:, ::2]
    # columns of v2 are unit-norm in R^{2M}, hence unit-norm in C^M
    return w, v


def subspace_projector_quadform(
    vecs_real_top: jnp.ndarray,
    vecs_real_bot: jnp.ndarray,
    a_re: jnp.ndarray,
    a_im: jnp.ndarray,
) -> jnp.ndarray:
    """||P_S a||^2 for the complex subspace S encoded by REAL embedding
    eigenvectors, without complex dtypes (all-real einsums; TPU-friendly).

    For an orthonormal real basis W = [W_top; W_bot] ([..., 2M, K]) of the
    embedded subspace, the complex map U = W_top + i W_bot satisfies
    (1/2) U U^H = P_S (each complex basis vector v contributes the pair
    [p;q], [-q;p], and v v^H + (iv)(iv)^H = 2 v v^H).  So

        a^H P_S a = 0.5 * || U^H a ||^2

    with || U^H a ||^2 expanded into four real contractions.
    vecs_real_*: [..., M, K]; a_re/a_im: [..., M, G].  Returns [..., G].
    """
    # U^H a = (W_top^T - i W_bot^T)(a_re + i a_im)
    re = (jnp.einsum("...mk,...mg->...kg", vecs_real_top, a_re)
          + jnp.einsum("...mk,...mg->...kg", vecs_real_bot, a_im))
    im = (jnp.einsum("...mk,...mg->...kg", vecs_real_top, a_im)
          - jnp.einsum("...mk,...mg->...kg", vecs_real_bot, a_re))
    return 0.5 * (jnp.sum(re * re, axis=-2) + jnp.sum(im * im, axis=-2))


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
