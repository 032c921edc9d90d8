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


def frame_multichannel_lanes(stream: jnp.ndarray, frame_size: int,
                             hop: int):
    """[M, T] -> (frames [n_frames, M, frame_size] in LANE order,
    time_order [n_frames] numpy).

    Throughput form of :func:`frame_multichannel` for hop | frame_size:
    frames are grouped by start-offset residue (lane k = frames starting
    at k*hop mod frame_size), so each lane is a FREE contiguous reshape of
    the stream plus one [M, F_k, N] -> [F_k, M, N] transpose — the
    interleave/pad/slice chain of the time-ordered form is gone (it was
    64% of config 3's device time, r4 trace: 2.27 of 3.56 ms/iter).

    Per-frame outputs come back in lane order; restore stream order on the
    SMALL outputs (``xy[order]``), not the frames: ``frames[order]`` would
    re-materialize the big array and give the copies right back.
    """
    if frame_size % hop != 0:
        raise ValueError("lane framing needs hop | frame_size "
                         f"(got {hop} vs {frame_size})")
    import numpy as np

    t = stream.shape[-1]
    n_frames = (t - frame_size) // hop + 1
    if n_frames <= 0:
        raise ValueError("stream shorter than one frame")
    r = frame_size // hop
    lanes, order_src = [], []
    for k in range(min(r, n_frames)):
        start = k * hop
        n_k = (n_frames - 1 - k) // r + 1
        lane = stream[..., start: start + n_k * frame_size]
        lane = lane.reshape(*stream.shape[:-1], n_k, frame_size)
        lanes.append(jnp.moveaxis(lane, -3, -2))  # [F_k, M, N]
        order_src.extend(k + i * r for i in range(n_k))
    frames = jnp.concatenate(lanes, axis=-3) if len(lanes) > 1 else lanes[0]
    # frames[order] is time order <=> order = argsort(lane-order starts)
    order = np.argsort(np.asarray(order_src, np.int64), kind="stable")
    return frames, order
