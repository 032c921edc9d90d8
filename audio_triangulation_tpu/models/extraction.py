"""Streaming source extraction: a continuous "virtual microphone".

After the streaming pipeline says WHERE (``StreamingLocalizer`` /
``Tracker``), this model recovers WHAT — a continuous, chunk-rate
enhanced waveform of the source at the steered position — by running the
batch beamformers (:mod:`..ops.beamform`) under a stateful weighted
overlap-add (WOLA) harness.  New capability with no reference equivalent
(the firmware localizes only; reference scope: src/sample_compute.h).

TPU-shaped by construction:

- every step is a pure function of (state, chunk, xy) with static shapes
  — jit once, run forever; ``step_many`` is the same function vmapped
  over a stream axis;
- framing is the reshape-interleave fast path (``ops.framing``), the
  per-frame steering is a linear-phase rFFT multiply, and overlap-add is
  r static strided adds — no gathers, no data-dependent control flow;
- steering moves ONCE per chunk and is linearly interpolated per frame
  inside the chunk, so a tracked source glides without clicks (the
  sqrt-Hann synthesis window cross-fades neighboring frames).

Reconstruction: sqrt-Hann analysis x sqrt-Hann synthesis at 50% overlap
satisfies COLA exactly, so a zero-delay steer reproduces the input
bit-accurately (up to f32 FFT round-trip) after the fixed
``frame - hop`` sample latency.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import PipelineConfig
from ..ops import beamform, framing


class ExtractorState(NamedTuple):
    """Carried WOLA state (all per-stream; vmap adds the stream axis)."""

    in_tail: jnp.ndarray   # [M, frame - hop] trailing input samples
    out_tail: jnp.ndarray  # [frame - hop] synthesis overlap carry
    delays: jnp.ndarray    # [M] current steering delays (seconds)


class StreamingExtractor:
    """Chunk-rate beamformed extraction at a (moving) steered position.

    >>> ex = StreamingExtractor.create(mics)
    >>> state = ex.init_state()
    >>> state, y = ex.step(state, chunk, xy)   # y: [chunk] enhanced audio

    ``y`` lags the input by ``frame - hop`` samples (the WOLA synthesis
    latency; 256 samples = 5.1 ms at the default geometry).  Typical use
    feeds ``StreamingLocalizer`` outputs (``xy`` / ``xy_grid``) or a
    ``Tracker`` posterior mean as the steer; a constant ``xy`` gives the
    static beamformer.
    """

    def __init__(self, mic_positions, cfg, frame, hop, method, height,
                 constrain_sphere, mvdr_kwargs):
        self.mic_positions = np.asarray(mic_positions, np.float32)
        self.pipeline = cfg
        self.frame = int(frame)
        self.hop = int(hop)
        self.method = method
        self.height = height
        self.constrain_sphere = constrain_sphere
        self.mvdr_kwargs = dict(mvdr_kwargs)
        if self.frame % self.hop != 0:
            raise ValueError("hop must divide frame")
        # periodic sqrt-Hann: hann(F, periodic) overlap-adds to exactly 1
        # at hop = F / 2^k, so analysis*synthesis reconstructs perfectly
        n = np.arange(self.frame)
        hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / self.frame)
        self._win = jnp.asarray(np.sqrt(hann), jnp.float32)
        r = self.frame // self.hop
        ola = np.zeros(self.hop)
        for u in range(r):
            ola += hann[u * self.hop:(u + 1) * self.hop]
        if not np.allclose(ola, ola[0]):
            raise ValueError(
                f"frame/hop = {self.frame}/{self.hop} violates COLA")
        self._ola_gain = float(ola[0])
        self._step = None

    @classmethod
    def create(
        cls,
        mic_positions,
        cfg: PipelineConfig | None = None,
        *,
        frame: int = 512,
        hop: int | None = None,
        method: str = "das",
        height: float | None = None,
        constrain_sphere: bool = True,
        **mvdr_kwargs,
    ) -> "StreamingExtractor":
        """``method`` is 'das' (delay-and-sum) or 'mvdr' (adaptive,
        frequency-smoothed Capon — extra kwargs forwarded, see
        :func:`..ops.beamform.extract_mvdr`)."""
        if method not in ("das", "mvdr"):
            raise ValueError(f"unknown method {method!r}")
        if method == "das" and mvdr_kwargs:
            raise TypeError(
                f"method='das' takes no extra kwargs, got "
                f"{sorted(mvdr_kwargs)} (MVDR-only knobs)")
        allowed = {"smooth_bins", "diagonal_loading"}
        unknown = set(mvdr_kwargs) - allowed
        if unknown:
            raise TypeError(
                f"unknown extract_mvdr kwargs {sorted(unknown)}; "
                f"allowed: {sorted(allowed)}")
        return cls(mic_positions, cfg or PipelineConfig(), frame,
                   hop if hop is not None else frame // 2, method, height,
                   constrain_sphere, mvdr_kwargs)

    # -- state ----------------------------------------------------------
    def init_state(self) -> ExtractorState:
        m = self.mic_positions.shape[0]
        lat = self.frame - self.hop
        return ExtractorState(
            in_tail=jnp.zeros((m, lat), jnp.float32),
            out_tail=jnp.zeros((lat,), jnp.float32),
            delays=jnp.zeros((m,), jnp.float32),
        )

    def init_states(self, n_streams: int) -> ExtractorState:
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams, *x.shape)),
            self.init_state())

    @property
    def latency_samples(self) -> int:
        return self.frame - self.hop

    # -- stepping -------------------------------------------------------
    def step(self, state: ExtractorState, chunk: jnp.ndarray,
             xy: jnp.ndarray):
        """One chunk [M, C] (C a multiple of hop) steered at ``xy``
        ([2] position, or [3]; broadcastable) -> (state, y [C])."""
        if self._step is None:
            self._step = jax.jit(self._make_step())
        return self._step(state, chunk, jnp.asarray(xy, jnp.float32))

    def step_many(self, states: ExtractorState, chunks: jnp.ndarray,
                  xys: jnp.ndarray):
        """Vmapped step: states/chunks/xys with a leading stream axis."""
        if getattr(self, "_step_many", None) is None:
            self._step_many = jax.jit(jax.vmap(self._make_step()))
        return self._step_many(states, chunks,
                               jnp.asarray(xys, jnp.float32))

    def _make_step(self):
        cfg = self.pipeline
        mics = self.mic_positions
        f, h = self.frame, self.hop
        r = f // h
        win = self._win
        gain = self._ola_gain
        method = self.method
        mvdr_kwargs = self.mvdr_kwargs
        height = self.height
        sphere = self.constrain_sphere

        def step(state: ExtractorState, chunk: jnp.ndarray, xy):
            chunk = chunk.astype(jnp.float32)
            c = chunk.shape[-1]
            if c % h != 0:
                raise ValueError(f"chunk {c} not a multiple of hop {h}")
            k = c // h

            z = jnp.concatenate([state.in_tail, chunk], axis=-1)
            frames = framing.frame_multichannel(z, f, h)      # [K, M, F]
            xw = frames * win

            # steer: glide linearly from the carried delays to xy's over
            # the chunk's frames (cross-faded by the synthesis overlap)
            tgt = beamform.source_delays(
                xy, mics, cfg, height=height, constrain_sphere=sphere)
            alpha = (jnp.arange(1, k + 1, dtype=jnp.float32) / k)[:, None]
            dly = (1.0 - alpha) * state.delays[None, :] + alpha * tgt

            if method == "das":
                y = beamform.extract_das(xw, dly, cfg)        # [K, F]
            else:
                y = beamform.extract_mvdr(xw, dly, cfg, **mvdr_kwargs)
            y = y * (win / gain)

            # overlap-add: r static strided adds (frames start at
            # multiples of h; segment u of frame k lands at (k + u) h)
            total = (k + r - 1) * h
            acc = jnp.zeros((total,), jnp.float32)
            seg = y.reshape(k, r, h)
            for u in range(r):
                acc = acc.at[u * h:(u + k) * h].add(
                    seg[:, u, :].reshape(k * h))
            acc = acc.at[: f - h].add(state.out_tail)

            new_state = ExtractorState(
                in_tail=z[:, -(f - h):],
                out_tail=acc[c:],
                delays=tgt,
            )
            return new_state, acc[:c]

        return step

    # -- convenience ----------------------------------------------------
    def run(self, stream, xys, chunk_size: int = 512):
        """Offline helper: stream [M, T] + per-chunk steers [T/chunk, 2]
        -> enhanced [T] (latency-compensated by zero-padding the input
        with ``latency_samples`` trailing zeros internally)."""
        stream = np.asarray(stream, np.float32)
        m, t = stream.shape
        if t % chunk_size != 0:
            pad = chunk_size - t % chunk_size
            stream = np.pad(stream, [(0, 0), (0, pad)])
        lat = self.latency_samples
        # flush: enough whole chunks to push the last `lat` delayed samples
        # out of the WOLA pipeline (one chunk only suffices when
        # lat <= chunk_size)
        flush = -(-lat // chunk_size) * chunk_size
        stream = np.pad(stream, [(0, 0), (0, flush)])
        n_chunks = stream.shape[-1] // chunk_size
        xys = np.asarray(xys, np.float32)
        if xys.ndim == 1:
            xys = np.broadcast_to(xys, (n_chunks, xys.shape[0]))
        state = self.init_state()
        outs = []
        for i in range(n_chunks):
            steer = xys[min(i, len(xys) - 1)]
            state, y = self.step(
                state, stream[:, i * chunk_size:(i + 1) * chunk_size],
                steer)
            outs.append(np.asarray(y))
        full = np.concatenate(outs)
        return full[lat:lat + t]
