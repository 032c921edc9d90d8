"""Per-mic echo detection: band-limited autocorrelation + peak extraction.

Foundation of acoustic reflector mapping (``models/mapping.py``) — a new
capability with no reference equivalent (the firmware treats echoes purely
as a nuisance its peak taper suppresses, ``correlations.c:26-33``).

Physics: a mic receives ``s(t - t_dir) + a s(t - t_ref)``; its
autocorrelation therefore carries a cross term at lag
``D = t_ref - t_dir``, the per-mic *echo delay*.  For a broadband source
(the test scenes use chirps) the compressed source autocorrelation decays
within a few samples of lag 0, so the echo term stands out cleanly —
measured far more robust than localizing the mirror image via pairwise
TDOA (the image's GCC peak scales with the *squared* echo amplitude and
drowns at realistic wall distances; the autocorrelation term is linear in
it).  Restricting the spectrum to the source band keeps out-of-band noise
from flattening the peak.

TPU shape: the autocorrelation is one rFFT -> |X|^2 * band mask -> irFFT
over the frame axis — the same transform economy as the GCC path; peak
extraction is a static top-K loop of masked argmax + parabolic refinement
(no data-dependent shapes).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.config import PipelineConfig


def echo_profile(
    frames: jnp.ndarray,
    cfg: PipelineConfig,
    *,
    band_hz: tuple | None = None,
) -> jnp.ndarray:
    """Normalized band-limited autocorrelation [..., M, N] of frames
    [..., M, N] (r[0] = 1 per channel; lags are circular).

    ``band_hz`` defaults to ``cfg.band_hz`` (full band if unset).  DC is
    always excluded (frame means carry no echo information).
    """
    n = frames.shape[-1]
    x = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # zero-pad to 2N: LINEAR autocorrelation — circular lags alias
    # (r[q] == r[N - q]), which would fold echoes beyond N/2 onto wrong
    # delays; padded, every lag up to N-1 is unambiguous
    spec = jnp.abs(jnp.fft.rfft(x, n=2 * n, axis=-1)) ** 2  # [..., M, F]
    band = band_hz if band_hz is not None else cfg.band_hz
    f = np.fft.rfftfreq(2 * n, 1.0 / cfg.sample_rate_hz)
    mask = f > 0.0
    if band is not None:
        lo, hi = band
        mask &= (f >= lo) & (f <= hi)
    r = jnp.fft.irfft(spec * jnp.asarray(mask, spec.dtype), axis=-1)
    r0 = jnp.maximum(r[..., :1], 1e-30)
    return (r / r0)[..., :n]


def top_delays(
    profile: jnp.ndarray,
    *,
    q_min: int,
    q_max: int,
    n_echoes: int = 1,
    min_separation: int = 16,
):
    """Top-K autocorrelation peaks per channel with sub-sample refinement.

    profile: [..., N] (normalized autocorrelation; any leading dims).
    Searches lags in [q_min, q_max) — q_min excludes the source
    autocorrelation mainlobe/sidelobes near 0, q_max bounds the echo
    range of interest (e.g. the frame's clean, non-wrapped region).

    Returns (delays [..., K] float32 — parabolic sub-sample lags,
    amps [..., K]) ordered strongest first; slots beyond the number of
    real peaks hold whatever residual maxima remain (filter by amp).
    Greedy NMS: each extracted peak suppresses ±``min_separation`` lags.
    """
    n = profile.shape[-1]
    q = jnp.arange(n)
    valid = (q >= q_min) & (q < q_max)
    p = jnp.where(valid, profile, -jnp.inf)
    delays, amps = [], []
    for _ in range(n_echoes):
        i = jnp.argmax(p, axis=-1)  # [...]
        amp = jnp.take_along_axis(profile, i[..., None], axis=-1)[..., 0]
        # parabolic 3-point refinement on the (unmasked) profile
        im = jnp.clip(i - 1, 0, n - 1)
        ip = jnp.clip(i + 1, 0, n - 1)
        ym = jnp.take_along_axis(profile, im[..., None], axis=-1)[..., 0]
        yp = jnp.take_along_axis(profile, ip[..., None], axis=-1)[..., 0]
        denom = ym - 2.0 * amp + yp
        frac = jnp.where(jnp.abs(denom) > 1e-12,
                         0.5 * (ym - yp) / denom, 0.0)
        frac = jnp.clip(frac, -0.5, 0.5)
        delays.append(i.astype(jnp.float32) + frac)
        amps.append(amp)
        # suppress the extracted peak's neighborhood
        p = jnp.where(jnp.abs(q - i[..., None]) <= min_separation,
                      -jnp.inf, p)
    return (jnp.stack(delays, axis=-1), jnp.stack(amps, axis=-1))
