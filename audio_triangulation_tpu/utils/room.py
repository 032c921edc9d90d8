"""Shoebox (rectangular-room) image-source acoustic simulator.

The reference firmware is tested empirically with claps in a real room
(SURVEY.md §4 — it has no simulator at all); ``utils/synth.py`` covers the
anechoic/free-field case plus a crude random-echo model.  This module is the
physical counterpart: the classic Allen & Berkley image-source method (ISM)
for a rectangular room with per-wall reflection coefficients, giving
geometrically-consistent echoes and physically meaningful reverberation
times.  It is the data source for reverberation-robustness tests and for
large-scale training-data generation (see ``models/neural.py``).

Two implementations share one image enumeration:

- :func:`simulate` — NumPy, float64, for tests and small scenes.
- :func:`simulate_batch` — JAX, jittable, batched over sources, for
  on-device data generation (the transfer-function accumulation is a real
  cos/sin contraction over images — no complex dtype enters the XLA module;
  see ops/srp_freq.mvdr_spectrum for why that matters on TPU).

Conventions match :func:`audio_triangulation_tpu.utils.synth.synth_scene`:
delays are taken relative to the source→array-center distance so the direct
wavefront lands where the anechoic generator would put it, and the direct
path has gain ``amplitude`` (images are attenuated by their reflection
products and relative 1/r spreading).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class ShoeboxRoom:
    """Rectangular room [0, Lx] x [0, Ly] x [0, Lz].

    absorption: scalar alpha for all six walls, or a 6-sequence
    (x0, x1, y0, y1, z0, z1); energy absorption coefficient in (0, 1].
    max_order: maximum total reflection count per image (Allen & Berkley
    truncation).
    """

    size: tuple[float, float, float] = (6.0, 5.0, 3.0)
    absorption: float | tuple[float, ...] = 0.3
    max_order: int = 4

    def wall_reflections(self) -> np.ndarray:
        """Pressure reflection coefficients beta = sqrt(1 - alpha), [6]."""
        a = np.asarray(
            self.absorption
            if np.ndim(self.absorption) else [self.absorption] * 6,
            np.float64)
        if a.shape != (6,):
            raise ValueError(f"absorption must be scalar or 6 values, "
                             f"got shape {a.shape}")
        if np.any(a <= 0) or np.any(a > 1):
            raise ValueError(f"absorption must be in (0, 1], got {a}")
        return np.sqrt(1.0 - a)

    @property
    def volume(self) -> float:
        lx, ly, lz = self.size
        return lx * ly * lz

    @property
    def surface_areas(self) -> np.ndarray:
        """Areas of the six walls (x0, x1, y0, y1, z0, z1)."""
        lx, ly, lz = self.size
        return np.asarray(
            [ly * lz, ly * lz, lx * lz, lx * lz, lx * ly, lx * ly])


def rt60_sabine(room: ShoeboxRoom, *, speed_of_sound: float = 343.0) -> float:
    """Sabine reverberation time 24 ln(10) V / (c sum S_i alpha_i) seconds
    (the familiar 0.161 V / A at c = 343 m/s)."""
    a = np.asarray(
        room.absorption
        if np.ndim(room.absorption) else [room.absorption] * 6, np.float64)
    sabine_area = float(np.sum(room.surface_areas * a))
    return 24.0 * np.log(10.0) * room.volume / (speed_of_sound * sabine_area)


def absorption_for_rt60(size: tuple[float, float, float], rt60: float,
                        *, speed_of_sound: float = 343.0) -> float:
    """Uniform wall absorption giving the requested Sabine RT60."""
    room = ShoeboxRoom(size=size, absorption=0.5)
    alpha = (24.0 * np.log(10.0) * room.volume
             / (speed_of_sound * rt60 * float(np.sum(room.surface_areas))))
    if alpha >= 1.0:
        raise ValueError(
            f"room {size} cannot be that dead: RT60 {rt60} s needs "
            f"alpha {alpha:.2f} >= 1")
    return float(alpha)


def image_sources(
    source_xyz: np.ndarray,
    room: ShoeboxRoom,
) -> tuple[np.ndarray, np.ndarray]:
    """All image-source positions [K, 3] and pressure gains [K] up to
    ``room.max_order`` total reflections.

    Standard ISM enumeration: per dimension d with length L, source
    coordinate s, integer n and parity q in {0, 1}, the image coordinate is
    (-1)^q s + 2 n L with |n - q| reflections off the wall at 0 and |n|
    off the wall at L.  A 3-D image is a product over dimensions; kept if
    its total reflection count is <= max_order.  The q = 0, n = 0 triple is
    the direct source with gain 1.
    """
    src = np.asarray(source_xyz, np.float64).reshape(3)
    beta = room.wall_reflections()  # [6] as (x0, x1, y0, y1, z0, z1)
    per_dim = []
    n_max = room.max_order // 2 + 1
    for d in range(3):
        length = room.size[d]
        if not 0.0 <= src[d] <= length:
            raise ValueError(
                f"source coordinate {d} = {src[d]} outside room "
                f"[0, {length}]")
        coords, gains, counts = [], [], []
        for n in range(-n_max, n_max + 1):
            for q in (0, 1):
                r_lo = abs(n - q)
                r_hi = abs(n)
                if r_lo + r_hi > room.max_order:
                    continue
                coords.append((1 - 2 * q) * src[d] + 2 * n * length)
                gains.append(beta[2 * d] ** r_lo * beta[2 * d + 1] ** r_hi)
                counts.append(r_lo + r_hi)
        per_dim.append(
            (np.asarray(coords), np.asarray(gains),
             np.asarray(counts, np.int64)))

    (cx, gx, rx), (cy, gy, ry), (cz, gz, rz) = per_dim
    total = (rx[:, None, None] + ry[None, :, None] + rz[None, None, :])
    keep = total <= room.max_order
    ix, iy, iz = np.nonzero(keep)
    pos = np.stack([cx[ix], cy[iy], cz[iz]], axis=-1)  # [K, 3]
    gain = gx[ix] * gy[iy] * gz[iz]                    # [K]
    # direct source first (deterministic order helps tests)
    order = np.lexsort((gain * -1.0, total[keep]))
    return pos[order], gain[order]


def _transfer_accumulate_np(sig_spec, freqs, delays, gains):
    """Y_m(f) = S(f) * sum_k g_mk e^{-2 pi i f d_mk}; numpy complex path.
    freqs in cycles/sample, delays in samples."""
    phase = np.exp(-2j * np.pi * freqs[None, None, :]
                   * delays[..., None])          # [M, K, F]
    h = np.einsum("mk,mkf->mf", gains, phase)    # [M, F]
    return sig_spec[None, :] * h


def simulate(
    source_xyz: np.ndarray,
    mic_positions: np.ndarray,
    room: ShoeboxRoom,
    *,
    n: int = 1024,
    fs: float = 50_000.0,
    speed_of_sound: float = 343.0,
    signal: np.ndarray | None = None,
    amplitude: float = 0.8,
    noise_rms: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Per-mic received frames [1, M, N] float64 for one source in the room.

    The signal (default: ``synth.chirp_burst``) propagates from every image
    source; image k at distance d reaches mic m delayed by
    (d_mk - d_ref)/c and scaled by g_k * d_ref/d_mk (relative spherical
    spreading; the direct path at the array center has gain ``amplitude``).
    The frame length must cover the reverberant tail you care about —
    energy arriving after n/fs seconds wraps circularly (FFT convolution),
    so pick n >= fs * (RT60 + direct delay) for clean tails.
    """
    from . import synth

    src = np.asarray(source_xyz, np.float64).reshape(3)
    mics = np.asarray(mic_positions, np.float64)
    mic3 = np.zeros((mics.shape[0], 3))
    mic3[:, : mics.shape[1]] = mics

    if signal is None:
        signal = synth.chirp_burst(n, fs)
    sig = np.zeros(n)
    sig[: len(signal)] = signal[:n]

    pos, gain = image_sources(src, room)          # [K, 3], [K]
    d = np.linalg.norm(pos[None, :, :] - mic3[:, None, :], axis=-1)  # [M, K]
    d_ref = float(np.linalg.norm(src - mic3.mean(axis=0)))
    delays = (d - d_ref) / speed_of_sound * fs    # samples
    g = amplitude * gain[None, :] * (d_ref / np.maximum(d, 1e-6))

    spec = np.fft.rfft(sig)
    freqs = np.fft.rfftfreq(n)  # cycles/sample
    y_spec = _transfer_accumulate_np(spec, freqs, delays, g)
    out = np.fft.irfft(y_spec, n=n, axis=-1)[None]  # [1, M, N]

    if noise_rms > 0:
        rng = np.random.default_rng(seed)
        out = out + rng.normal(0.0, noise_rms, out.shape)
    return out


def simulate_batch(
    source_xyz,
    mic_positions: np.ndarray,
    room: ShoeboxRoom,
    *,
    n: int = 1024,
    fs: float = 50_000.0,
    speed_of_sound: float = 343.0,
    signal: np.ndarray | None = None,
    amplitude: float = 0.8,
):
    """JAX batched ISM: sources [B, 3] -> frames [B, M, N] float32, jitted.

    Image GEOMETRY (positions/gains as a function of the source point) is
    differentiable-free host work only in the sense of the enumeration
    pattern; the positions themselves are computed inside the traced
    function from the source coordinates (images are affine in the source),
    so the whole generator jits and vmaps — one fused device program
    produces an entire training batch.  The per-mic transfer function is
    accumulated as real cos/sin contractions (no complex dtype on TPU).
    """
    import jax
    import jax.numpy as jnp

    from . import synth

    mics = np.asarray(mic_positions, np.float64)
    mic3 = np.zeros((mics.shape[0], 3), np.float32)
    mic3[:, : mics.shape[1]] = mics

    if signal is None:
        signal = synth.chirp_burst(n, fs)
    sig = np.zeros(n, np.float32)
    sig[: len(signal)] = signal[:n]
    spec = np.fft.rfft(sig.astype(np.float64))
    spec_re = jnp.asarray(np.real(spec), jnp.float32)   # [F]
    spec_im = jnp.asarray(np.imag(spec), jnp.float32)
    freqs = jnp.asarray(np.fft.rfftfreq(n), jnp.float32)

    # images are affine in the source coordinate: (-1)^q s + 2 n L per dim.
    # Enumerate the (sign, offset, gain) triples host-side; positions are
    # computed in-trace so one jit serves every batch.
    probe = np.asarray([s / 2 for s in room.size])
    pos_probe, gain = image_sources(probe, room)
    # recover per-dim (sign, offset): pos = sign * probe + offset
    sign = np.ones_like(pos_probe)
    offset = np.zeros_like(pos_probe)
    for d in range(3):
        # sign = +-1; offset = 2 n L.  probe_d > 0 so sign is recoverable
        # from pos modulo 2L: pos - 2nL in {probe, -probe}
        rem = np.mod(pos_probe[:, d], 2 * room.size[d])
        is_pos = np.isclose(rem, probe[d])
        sign[:, d] = np.where(is_pos, 1.0, -1.0)
        offset[:, d] = pos_probe[:, d] - sign[:, d] * probe[d]
    assert np.allclose(sign * probe[None, :] + offset, pos_probe), (
        "image affine decomposition failed")
    sign_j = jnp.asarray(sign, jnp.float32)         # [K, 3]
    offset_j = jnp.asarray(offset, jnp.float32)     # [K, 3]
    gain_j = jnp.asarray(gain, jnp.float32)         # [K]
    mics_j = jnp.asarray(mic3)                      # [M, 3]
    center = jnp.mean(mics_j, axis=0)

    @jax.jit
    def run(src):
        src = jnp.atleast_2d(jnp.asarray(src, jnp.float32))  # [B, 3]

        def one(s):
            pos = sign_j * s[None, :] + offset_j             # [K, 3]
            d = jnp.linalg.norm(
                pos[None, :, :] - mics_j[:, None, :], axis=-1)  # [M, K]
            d_ref = jnp.linalg.norm(s - center)
            delays = (d - d_ref) / speed_of_sound * fs       # samples
            g = amplitude * gain_j[None, :] * (d_ref / jnp.maximum(d, 1e-6))
            ang = (2.0 * jnp.pi) * delays[..., None] * freqs  # [M, K, F]
            # H = sum_k g (cos - i sin);  Y = S * H, all real components
            h_re = jnp.einsum("mk,mkf->mf", g, jnp.cos(ang))
            h_im = jnp.einsum("mk,mkf->mf", g, -jnp.sin(ang))
            y_re = spec_re[None, :] * h_re - spec_im[None, :] * h_im
            y_im = spec_re[None, :] * h_im + spec_im[None, :] * h_re
            return y_re, y_im

        y_re, y_im = jax.vmap(one)(src)                      # [B, M, F]
        return jnp.fft.irfft(y_re + 1j * y_im, n=n, axis=-1).astype(
            jnp.float32)

    return run(source_xyz)
