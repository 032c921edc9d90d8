"""Multi-channel dereverberation: WPE in the STFT domain (new capability).

The reference firmware has no reverberation defense beyond EMA correlogram
smoothing (reference ``src/components/correlations.c:38-49``); in a live
room, late reflections bias GCC peaks and smear the SRP map.  This module
adds the standard multi-channel remedy — **weighted prediction error**
(WPE) delayed linear prediction (Nakatani et al., IEEE TASLP 2010): per
STFT bin, the late tail of each channel is predicted from frames at least
``delay`` hops in the past and subtracted, leaving the direct path and
early reflections (which carry the TDOA information) untouched.

TPU-first design:

- Analysis/synthesis are plain XLA rFFT/irFFT over reshape-interleaved
  frames (:func:`ops.framing.frame_stream`) — no gathers.
- Every frequency bin is an independent ``MK x MK`` Hermitian system; all
  bins solve as ONE batched real-block solve (``ops.linalg.complex_solve``
  — the TPU backend has no complex LU).  No per-bin loops.
- The adaptive variant (:func:`wpe_rls`) is the RLS recursion of
  Caroselli et al. (Interspeech 2017): per STFT frame, rank-1 updates of
  the inverse tap covariance, batched over bins as complex einsums inside
  one ``lax.scan`` — the streaming-friendly form (O(taps^2 M^2) per frame,
  no solves).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import framing, linalg


# ---------------------------------------------------------------------------
# STFT analysis / synthesis
# ---------------------------------------------------------------------------

def sqrt_hann(frame: int) -> np.ndarray:
    """Square root of the periodic Hann window (analysis == synthesis
    window gives COLA at hop = frame / 2^k)."""
    n = np.arange(frame)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / frame)
    return np.sqrt(hann).astype(np.float32)


def stft(x: jnp.ndarray, frame: int, hop: int,
         window: np.ndarray | None = None) -> jnp.ndarray:
    """x [..., T] real -> [..., n_frames, F] complex64 (F = frame//2 + 1).

    Windowed rFFT over ``frame_stream`` frames; with the default sqrt-Hann
    pair, ``istft(stft(x))`` reconstructs x except within one frame of the
    edges (no padding is added here — WPE wants honest frames)."""
    w = jnp.asarray(sqrt_hann(frame) if window is None else window,
                    x.dtype)
    frames = framing.frame_stream(x, frame, hop)        # [..., Tf, frame]
    return jnp.fft.rfft(frames * w, axis=-1)


def istft(spec: jnp.ndarray, frame: int, hop: int,
          window: np.ndarray | None = None) -> jnp.ndarray:
    """[..., n_frames, F] complex -> [..., T] real, weighted overlap-add.

    T = (n_frames - 1) * hop + frame.  The synthesis window is applied and
    the output divided by the accumulated window^2 sum, so any COLA window
    / hop pair reconstructs (edges included, down to the first/last hop)."""
    w = jnp.asarray(sqrt_hann(frame) if window is None else window,
                    jnp.float32)
    frames = jnp.fft.irfft(spec, n=frame, axis=-1) * w  # [..., Tf, frame]
    tf = frames.shape[-2]
    out_len = (tf - 1) * hop + frame

    def fold(fr):
        # fr [..., Tf, frame] -> overlap-add [..., out_len]; when the
        # frame is r*hop this is r shifted flattenings summed — pure
        # reshape/pad ops, no scatter.
        if frame % hop == 0:
            r = frame // hop
            parts = fr.reshape(fr.shape[:-1] + (r, hop))  # [..., Tf, r, hop]
            acc = jnp.zeros(fr.shape[:-2] + (out_len,), fr.dtype)
            for u in range(r):
                flat = parts[..., u, :].reshape(fr.shape[:-2] + (tf * hop,))
                pad = [(0, 0)] * (flat.ndim - 1) + [
                    (u * hop, out_len - u * hop - tf * hop)]
                acc = acc + jnp.pad(flat, pad)
            return acc
        acc = jnp.zeros(fr.shape[:-2] + (out_len,), fr.dtype)
        for i in range(tf):  # general fallback (static Tf)
            pad = [(0, 0)] * (fr.ndim - 2) + [
                (i * hop, out_len - i * hop - frame)]
            acc = acc + jnp.pad(fr[..., i, :], pad)
        return acc

    num = fold(frames)
    wsum = fold(jnp.broadcast_to(w * w, frames.shape[-2:])[None])[0]
    return num / jnp.maximum(wsum, 1e-8)


# ---------------------------------------------------------------------------
# Block (offline) WPE
# ---------------------------------------------------------------------------

def _tap_stack(y: jnp.ndarray, taps: int, delay: int) -> jnp.ndarray:
    """y [..., F, M, T] -> delayed tap stack [..., F, M*taps, T] where
    stack[..., k*M + m, t] = y[..., m, t - delay - k] (zeros before t=0)."""
    outs = []
    t = y.shape[-1]
    for k in range(taps):
        s = delay + k
        pad = [(0, 0)] * (y.ndim - 1) + [(s, 0)]
        outs.append(jnp.pad(y, pad)[..., :t])
    return jnp.concatenate(outs, axis=-2)


def wpe_stft(y: jnp.ndarray, *, taps: int = 10, delay: int = 2,
             iters: int = 3, eps: float = 1e-6) -> jnp.ndarray:
    """Block WPE on an STFT tensor y [..., F, M, T] complex -> same shape.

    Per bin (batched over F and any leading dims):
        lam_t   = mean_m |X[m, t]|^2            (X = current dereverbed est)
        R       = sum_t ytil_t ytil_t^H / lam_t
        P       = sum_t ytil_t y_t^H / lam_t
        G       = R^{-1} P                       [MK, M]
        X       = Y - G^H ytil
    iterated ``iters`` times (lam from Y on the first pass).  ``delay``
    hops protect the direct path + early reflections; ``eps`` floors the
    PSD weight and loads R's diagonal."""
    ytil = _tap_stack(y, taps, delay)                 # [..., F, MK, T]
    x = y
    for _ in range(iters):
        p2 = jnp.mean(jnp.abs(x) ** 2, axis=-2)       # [..., F, T]
        floor = eps * jnp.mean(p2, axis=-1, keepdims=True) + 1e-30
        inv_lam = 1.0 / jnp.maximum(p2, floor)        # [..., F, T]
        ytw = ytil * inv_lam[..., None, :]
        r = jnp.einsum("...it,...jt->...ij", ytw, jnp.conj(ytil))
        p = jnp.einsum("...it,...mt->...im", ytw, jnp.conj(y))
        mk = r.shape[-1]
        tr = jnp.trace(jnp.real(r), axis1=-2, axis2=-1)
        ridge = (eps * tr / mk + 1e-12)[..., None, None]
        r = r + ridge * jnp.eye(mk, dtype=r.dtype)
        g = linalg.complex_solve(r, p)                # [..., F, MK, M]
        x = y - jnp.einsum("...im,...it->...mt", jnp.conj(g), ytil)
    return x


def wpe(x: jnp.ndarray, *, frame: int = 512, hop: int | None = None,
        taps: int = 10, delay: int = 2, iters: int = 3,
        eps: float = 1e-6) -> jnp.ndarray:
    """Time-domain WPE: x [..., M, T] real -> dereverbed [..., M, T].

    STFT -> :func:`wpe_stft` -> iSTFT; the output is trimmed/zero-padded
    back to the input length (the last partial frame's samples pass
    through unprocessed as zeros — feed whole multiples of ``hop`` for
    gapless output)."""
    hop = frame // 4 if hop is None else hop
    t = x.shape[-1]
    spec = stft(x, frame, hop)                        # [..., M, Tf, F]
    spec = jnp.moveaxis(spec, -1, -3)                 # [..., F, M, Tf]
    out = wpe_stft(spec, taps=taps, delay=delay, iters=iters, eps=eps)
    out = jnp.moveaxis(out, -3, -1)                   # [..., M, Tf, F]
    y = istft(out, frame, hop)                        # [..., M, T']
    if y.shape[-1] >= t:
        return y[..., :t].astype(x.dtype)
    pad = [(0, 0)] * (y.ndim - 1) + [(0, t - y.shape[-1])]
    return jnp.pad(y, pad).astype(x.dtype)


# ---------------------------------------------------------------------------
# Adaptive (streaming) WPE — RLS recursion
# ---------------------------------------------------------------------------

class WpeState(NamedTuple):
    """Per-bin RLS state, batched over frequency.

    kinv: [F, MK, MK] complex64 — inverse weighted tap covariance
    g:    [F, MK, M] complex64  — prediction filter
    hist: [F, M, taps + delay - 1] complex64 — most-recent STFT frames
          (hist[..., -1] is 1 frame ago; hist[..., 0] is delay+taps-1 ago,
          so hist[..., :taps] is exactly the delayed tap window)
    """
    kinv: jnp.ndarray
    g: jnp.ndarray
    hist: jnp.ndarray


def wpe_rls_init(n_bins: int, n_mics: int, *, taps: int = 10,
                 delay: int = 2, delta: float = 1e-2) -> WpeState:
    """Fresh RLS state: kinv = I/delta, zero filter, zero history."""
    if delay < 1:
        raise ValueError("adaptive WPE needs delay >= 1 (the current "
                         "frame must never predict itself)")
    mk = n_mics * taps
    eye = jnp.eye(mk, dtype=jnp.complex64) / delta
    return WpeState(
        kinv=jnp.broadcast_to(eye, (n_bins, mk, mk)).copy(),
        g=jnp.zeros((n_bins, mk, n_mics), jnp.complex64),
        hist=jnp.zeros((n_bins, n_mics, taps + delay - 1), jnp.complex64),
    )


def wpe_rls_step(state: WpeState, y: jnp.ndarray, *, alpha: float = 0.99,
                 eps: float = 1e-6) -> tuple[WpeState, jnp.ndarray]:
    """One adaptive-WPE update.  y [F, M] complex (one STFT frame);
    returns (new_state, dereverbed [F, M]).

    Caroselli et al. 2017: with tap vector ytil (frames delay..delay+taps-1
    in the past, so the CURRENT frame never predicts itself),
        e    = y - G^H ytil                       (output)
        lam  = mean_m |y|^2
        nu   = Kinv ytil
        k    = nu / (alpha * lam + ytil^H nu)
        G   += k e^H
        Kinv = (Kinv - k (nu^H)) / alpha
    All bins update in parallel; everything is elementwise/matvec —
    scan-friendly, no solves."""
    taps = state.g.shape[-2] // state.hist.shape[-2]
    # hist[..., i] is (taps + delay - 1 - i) frames ago, so the taps oldest
    # entries are exactly frames delay .. delay+taps-1 ago
    ytil = state.hist[..., :taps]                     # [F, M, taps]
    f = ytil.shape[0]
    ytil = jnp.swapaxes(ytil, -1, -2).reshape(f, -1)  # [F, taps*M] k-major
    lam = jnp.mean(jnp.abs(y) ** 2, axis=-1)          # [F]
    lam = jnp.maximum(lam, eps * jnp.mean(lam) + 1e-30)
    e = y - jnp.einsum("fim,fi->fm", jnp.conj(state.g), ytil)  # [F, M]
    nu = jnp.einsum("fij,fj->fi", state.kinv, ytil)   # [F, MK]
    denom = alpha * lam + jnp.real(
        jnp.einsum("fi,fi->f", jnp.conj(ytil), nu))
    k = nu / denom[:, None]                           # [F, MK]
    g = state.g + k[:, :, None] * jnp.conj(e)[:, None, :]
    # Kinv' = (Kinv - k nu^H) / alpha  (nu^H = ytil^H Kinv: Kinv Hermitian)
    kinv = (state.kinv - k[:, :, None] * jnp.conj(nu)[:, None, :]) / alpha
    hist = jnp.concatenate([state.hist[..., 1:], y[..., None]], axis=-1)
    return WpeState(kinv=kinv, g=g, hist=hist), e


class DereverbState(NamedTuple):
    """Chunk-streaming WOLA state around the RLS recursion.

    wpe:      per-bin RLS state (:class:`WpeState`)
    in_tail:  [M, frame - hop] trailing input samples (STFT continuity)
    out_tail: [M, frame - hop] synthesis overlap carry
    """
    wpe: WpeState
    in_tail: jnp.ndarray
    out_tail: jnp.ndarray


class StreamingDereverb:
    """Continuous multi-channel dereverberation for the live path.

    Mirrors :class:`models.extraction.StreamingExtractor`'s WOLA carry
    (in-tail for analysis continuity, out-tail for synthesis overlap), so
    feeding a stream chunk-by-chunk produces exactly the same samples as
    one long :func:`wpe_rls` pass — the chunking is invisible to the RLS
    recursion.  Output lags the input by ``frame - hop`` samples.  Insert
    in front of a :class:`models.streaming.StreamingLocalizer` to feed it
    dereverbed chunks (``stream --dereverb`` wires this up).
    """

    def __init__(self, n_mics: int, *, frame: int = 1024,
                 hop: int | None = None, taps: int = 10, delay: int = 4,
                 alpha: float = 0.998, delta: float = 1e-2,
                 eps: float = 1e-6):
        self.n_mics = int(n_mics)
        self.frame = int(frame)
        self.hop = int(frame // 4 if hop is None else hop)
        if self.frame % self.hop != 0:
            raise ValueError("hop must divide frame")
        self.taps, self.delay = int(taps), int(delay)
        self.alpha, self.delta, self.eps = float(alpha), float(delta), float(eps)
        self.n_bins = self.frame // 2 + 1
        self._win = jnp.asarray(sqrt_hann(self.frame))
        # analysis * synthesis = hann; its OLA at this hop is the constant
        # WOLA gain (frame/hop * 0.5 for periodic hann when hop | frame/2)
        w2 = np.asarray(self._win, np.float64) ** 2
        r = self.frame // self.hop
        ola = np.zeros(self.hop)
        for u in range(r):
            ola += w2[u * self.hop:(u + 1) * self.hop]
        if not np.allclose(ola, ola[0], atol=1e-6):
            raise ValueError(
                f"frame/hop = {self.frame}/{self.hop} violates COLA")
        self._gain = float(ola[0])
        self._step = None

    @property
    def latency_samples(self) -> int:
        return self.frame - self.hop

    def init_state(self) -> DereverbState:
        lat = self.frame - self.hop
        return DereverbState(
            wpe=wpe_rls_init(self.n_bins, self.n_mics, taps=self.taps,
                             delay=self.delay, delta=self.delta),
            in_tail=jnp.zeros((self.n_mics, lat), jnp.float32),
            out_tail=jnp.zeros((self.n_mics, lat), jnp.float32),
        )

    def init_states(self, n_streams: int) -> DereverbState:
        """Stacked fresh states for ``step_many`` ([n_streams] leading)."""
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams, *x.shape)).copy(),
            self.init_state())

    def step(self, state: DereverbState, chunk: jnp.ndarray):
        """chunk [M, C] (C a multiple of hop) -> (state, y [M, C])."""
        if self._step is None:
            self._step = jax.jit(self._make_step())
        return self._step(state, chunk)

    def step_many(self, states: DereverbState, chunks: jnp.ndarray):
        """Vmapped step: states/chunks with a leading stream axis — the
        multi-stream serving form (pairs with ``StreamingLocalizer.
        step_many`` / ``make_sharded_stream_step``, where the stream axis
        is sharded over the mesh's data axis)."""
        if getattr(self, "_step_many", None) is None:
            self._step_many = jax.jit(jax.vmap(self._make_step()))
        return self._step_many(states, chunks)

    def _make_step(self):
        f, h = self.frame, self.hop
        r = f // h
        win = self._win
        gain = self._gain
        alpha, eps = self.alpha, self.eps

        def step(state: DereverbState, chunk: jnp.ndarray):
            chunk = chunk.astype(jnp.float32)
            c = chunk.shape[-1]
            if c % h != 0:
                raise ValueError(f"chunk {c} not a multiple of hop {h}")
            k = c // h

            z = jnp.concatenate([state.in_tail, chunk], axis=-1)
            frames = framing.frame_multichannel(z, f, h)      # [K, M, f]
            spec = jnp.fft.rfft(frames * win, axis=-1)        # [K, M, F]

            def body(st, y_km):                               # y_km [M, F]
                return wpe_rls_step(st, y_km.T, alpha=alpha, eps=eps)

            wst, out = jax.lax.scan(body, state.wpe, spec)    # out [K, F, M]
            y = jnp.fft.irfft(jnp.transpose(out, (0, 2, 1)),
                              n=f, axis=-1)                   # [K, M, f]
            y = y * (win / gain)

            total = (k + r - 1) * h
            acc = jnp.zeros((z.shape[0], total), jnp.float32)
            seg = jnp.transpose(y, (1, 0, 2)).reshape(
                z.shape[0], k, r, h)                          # [M, K, r, h]
            for u in range(r):
                acc = acc.at[:, u * h:(u + k) * h].add(
                    seg[:, :, u, :].reshape(z.shape[0], k * h))
            acc = acc.at[:, : f - h].add(state.out_tail)

            new_state = DereverbState(
                wpe=wst, in_tail=z[:, -(f - h):], out_tail=acc[:, c:])
            return new_state, acc[:, :c]

        return step

    def run(self, stream, chunk_size: int = 1024) -> np.ndarray:
        """Offline helper: stream [M, T] -> dereverbed [M, T], chunked
        internally and latency-compensated (trailing zeros flush the
        WOLA pipeline)."""
        stream = np.asarray(stream, np.float32)
        m, t = stream.shape
        lat = self.latency_samples
        pad = (-t) % chunk_size + (-(-lat // chunk_size)) * chunk_size
        stream = np.pad(stream, [(0, 0), (0, pad)])
        state = self.init_state()
        outs = []
        for i in range(stream.shape[-1] // chunk_size):
            state, y = self.step(
                state, stream[:, i * chunk_size:(i + 1) * chunk_size])
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=-1)[:, lat:lat + t]


def wpe_rls(x: jnp.ndarray, *, frame: int = 512, hop: int | None = None,
            taps: int = 10, delay: int = 2, alpha: float = 0.99,
            delta: float = 1e-2, eps: float = 1e-6,
            state: WpeState | None = None,
            ) -> tuple[jnp.ndarray, WpeState]:
    """Adaptive WPE over a signal block x [M, T] -> (dereverbed [M, T],
    final state).  Scan of :func:`wpe_rls_step` over STFT frames; pass the
    returned state back in to continue seamlessly on the next block (the
    streaming usage).  Early output (before the RLS has seen ~taps/alpha
    frames) is essentially the input."""
    hop = frame // 4 if hop is None else hop
    t = x.shape[-1]
    spec = stft(x, frame, hop)                        # [M, Tf, F]
    spec = jnp.transpose(spec, (2, 0, 1))             # [F, M, Tf]
    if state is None:
        state = wpe_rls_init(spec.shape[0], spec.shape[1],
                             taps=taps, delay=delay, delta=delta)

    def body(st, y):                                  # y [F, M]
        return wpe_rls_step(st, y, alpha=alpha, eps=eps)

    state, out = jax.lax.scan(body, state,
                              jnp.transpose(spec, (2, 0, 1)))  # [Tf, F, M]
    out = jnp.transpose(out, (1, 2, 0))               # [F, M, Tf]
    y = istft(jnp.moveaxis(out, -3, -1), frame, hop)  # [M, T']
    if y.shape[-1] >= t:
        y = y[..., :t]
    else:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, t - y.shape[-1])])
    return y.astype(x.dtype), state
