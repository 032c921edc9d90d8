"""Stream -> overlapped frames (the batch analogue of the rolling capture).

The reference captures one frame per detected event; the batched offline
equivalent is dense 50%-overlap framing of a long stream (BASELINE config 3).
A naive strided gather of [n_frames, frame] indices is slow on TPU; when the
hop divides the frame size, framing decomposes into ``frame/hop`` contiguous
reshapes interleaved along a new axis — pure layout ops that XLA handles at
memcpy speed.
"""

from __future__ import annotations

import jax.numpy as jnp


def frame_stream(
    stream: jnp.ndarray, frame_size: int, hop: int
) -> jnp.ndarray:
    """stream [..., T] -> frames [..., n_frames, frame_size] with the given
    hop; n_frames = (T - frame_size) // hop + 1.

    Fast path (reshape-interleave) when hop divides frame_size; general
    gather otherwise."""
    t = stream.shape[-1]
    n_frames = (t - frame_size) // hop + 1
    if n_frames <= 0:
        raise ValueError("stream shorter than one frame")

    if frame_size % hop == 0:
        r = frame_size // hop  # interleave factor
        # lane k holds frames k, k+r, k+2r, ... (those starting at
        # k*hop + i*frame_size)
        lanes = []
        n_per_lane = []
        for k in range(r):
            start = k * hop
            n_k = (t - start) // frame_size
            n_k = min(n_k, (n_frames - 1 - k) // r + 1 if k < n_frames else 0)
            n_per_lane.append(n_k)
            lane = stream[..., start: start + n_k * frame_size]
            lanes.append(lane.reshape(*stream.shape[:-1], n_k, frame_size))
        n_max = max(n_per_lane)
        padded = [
            jnp.concatenate(
                [ln, jnp.zeros((*ln.shape[:-2], n_max - ln.shape[-2],
                                frame_size), ln.dtype)], axis=-2)
            if ln.shape[-2] < n_max else ln
            for ln in lanes
        ]
        inter = jnp.stack(padded, axis=-2)  # [..., n_max, r, N]
        frames = inter.reshape(*stream.shape[:-1], n_max * r, frame_size)
        return frames[..., :n_frames, :]

    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(frame_size)[None, :])
    return stream[..., idx]


def frame_multichannel(
    stream: jnp.ndarray, frame_size: int, hop: int
) -> jnp.ndarray:
    """[M, T] -> [n_frames, M, frame_size] (pipeline-ready ordering)."""
    f = frame_stream(stream, frame_size, hop)  # [M, F, N]
    return jnp.moveaxis(f, -3, -2) if f.ndim == 3 else f
