"""Frame conditioning: DC removal, gain / dynamic-range normalization.

Reference semantics:

- DC removal happens during ring write-out: ``offset = total >> 10`` then
  subtract (``src/components/rolling_buffer.c:64-66``).
- ``buffer_normalize_range`` is in practice a fixed ``<<8`` gain (8-bit ADC ->
  16-bit range); its true peak-normalization body is dead code
  (``src/components/buffer.c:13-49``).  Both behaviors are provided here, the
  dead one implemented properly as an option.

Float versions for the hot path, integer versions for bit-exact validation.
"""

from __future__ import annotations

import jax.numpy as jnp


# ----------------------------------------------------------------------
# Float path
# ----------------------------------------------------------------------

def dc_remove(frames: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Subtract the per-frame mean."""
    return frames - jnp.mean(frames, axis=axis, keepdims=True)


def normalize(frames: jnp.ndarray, mode: str = "shift8",
              axis: int = -1) -> jnp.ndarray:
    """Float analogue of buffer_normalize_range.

    'shift8'     -> multiply by 256 (the live reference gain)
    'full_range' -> scale each frame so its peak |value| is 32767
    'none'       -> unchanged
    """
    if mode == "shift8":
        return frames * 256.0
    if mode == "full_range":
        peak = jnp.max(jnp.abs(frames), axis=axis, keepdims=True)
        return frames * (32767.0 / jnp.maximum(peak, 1e-20))
    if mode == "none":
        return frames
    raise ValueError(f"unknown normalize mode: {mode}")


def frame_power(frames: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Sum of squares per frame (buffer_t.power analogue)."""
    return jnp.sum(frames * frames, axis=axis)


# ----------------------------------------------------------------------
# Bit-exact integer path
# ----------------------------------------------------------------------

def dc_remove_int(frames: jnp.ndarray, frame_size_bits: int,
                  axis: int = -1) -> jnp.ndarray:
    """DC removal with the reference's integer semantics:
    offset = int16(sum >> bits) (arithmetic shift = floor), subtracted from
    int16 samples (rolling_buffer.c:57-66)."""
    total = jnp.sum(frames.astype(jnp.int64), axis=axis, keepdims=True)
    offset = (total >> frame_size_bits).astype(jnp.int16)
    return (frames.astype(jnp.int16) - offset).astype(jnp.int16)


def normalize_shift8_int(frames: jnp.ndarray) -> jnp.ndarray:
    """int16 <<= 8 with wraparound, exactly buffer.c:15-16."""
    return (frames.astype(jnp.int32) << 8).astype(jnp.int16)


def normalize_full_range_int(frames: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """The dead peak-normalizer (buffer.c:20-48), integer-exact:
    scale = (32767 << 15) / max|x|; x = clamp(int64(x * scale) >> 15)."""
    x32 = frames.astype(jnp.int32)
    m = jnp.max(jnp.abs(x32), axis=axis, keepdims=True)
    scale = jnp.where(m > 0, (32767 << 15) // jnp.maximum(m, 1), 0).astype(jnp.int64)
    tmp = (frames.astype(jnp.int64) * scale) >> 15
    return jnp.clip(tmp, -32768, 32767).astype(jnp.int16)


def frame_power_int(frames: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """int64 sum of squares (rolling_buffer.c:68-70)."""
    x = frames.astype(jnp.int64)
    return jnp.sum(x * x, axis=axis)
