"""Analysis windows.

The reference applies a Q15 DPSS (Slepian) window generated offline by
``window.ipynb`` and baked into ``src/components/window_function.h``; the
multiply is ``int16((int32(x) * w) >> 15)`` (``src/components/buffer.c:4-11``).

Here the window is generated at setup time with the same recipe and applied
either in float (hot path) or with the exact Q15 integer semantics
(validation path).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def dpss_window(length: int, nw: float = 2.0, dtype=np.float32) -> np.ndarray:
    """Unit-peak DPSS window [length], the window.ipynb recipe before
    quantization.

    Note: for ``length < 1024`` this generates ``dpss(length)`` directly,
    which is the mathematically correct window but differs from the firmware,
    whose ``buffer_window`` strides its fixed 1024-entry table
    (``src/components/buffer.c:8``: ``WINDOW_FUNCTION[i << (10 - BITS)]``) —
    and ``dpss(512) != dpss(1024)[::2]``.  Use :func:`dpss_window_strided`
    for firmware-exact semantics at non-default frame sizes."""
    from scipy.signal import windows

    w = windows.dpss(length, nw)
    w = w / np.max(w)
    return w.astype(dtype)


def dpss_window_strided(length: int, nw: float = 2.0,
                        table_bits: int = 10,
                        dtype=np.float32) -> np.ndarray:
    """Firmware-exact window for ``length <= 2**table_bits``: stride the
    fixed ``2**table_bits``-entry DPSS table the way ``buffer_window`` does
    (``src/components/buffer.c:8``: index ``i << (table_bits - frame_bits)``).

    Identical to :func:`dpss_window` at the full table length."""
    table_len = 1 << table_bits
    if length > table_len:
        raise ValueError(
            f"length {length} exceeds the {table_len}-entry window table")
    if table_len % length != 0:
        raise ValueError(
            f"length {length} must divide the table length {table_len}")
    table = dpss_window(table_len, nw, dtype)
    return table[:: table_len // length]


def window_for(cfg, dtype=np.float32) -> np.ndarray:
    """The pipeline's analysis window per ``cfg.window_mode``
    ('direct' | 'strided' -- see :func:`dpss_window_strided`)."""
    if getattr(cfg, "window_mode", "direct") == "strided":
        return dpss_window_strided(cfg.frame_size, cfg.window_nw, dtype=dtype)
    return dpss_window(cfg.frame_size, cfg.window_nw, dtype=dtype)


def q15_quantize(window: np.ndarray) -> np.ndarray:
    """Round a unit-peak window to Q15 int32 (window.ipynb ``to_int16``)."""
    w = window / np.max(np.abs(window))
    return np.round(w * 32767).astype(np.int32)


def apply_window(frames: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Float windowing of frames [..., N] by window [N]."""
    return frames * window


def apply_window_q15(frames: jnp.ndarray, window_q15: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact integer windowing: int16((int32(x) * w) >> 15).

    ``>> 15`` on int32 is an arithmetic shift in both C and XLA, and the final
    int16 conversion truncates — matching buffer.c:8-9.
    """
    tmp = frames.astype(jnp.int32) * window_q15.astype(jnp.int32)
    return (tmp >> 15).astype(jnp.int16)
