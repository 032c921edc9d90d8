"""Acoustic event detection over sample streams.

The reference detects events sequentially: a 1024-deep ring per mic keeps O(1)
running sums/sum-of-squares of its newest 512 ("incoming") and previous 512
("outgoing") samples; an event triggers when the summed outgoing variance
exceeds the incoming variance plus a threshold — i.e. when a transient has
fully entered the older half (``src/components/rolling_buffer.c:16-85``,
``src/sample_compute.h:78-90``).

TPU-native re-expression: the per-sample recurrences are prefix sums, so the
detector statistic at EVERY sample position is computed at once with two
cumsums — no sequential scan, fully batched over streams and mics:

    incoming_power(t) = H * S2[t-H+1 .. t]   - S1[t-H+1 .. t]^2
    outgoing_power(t) = H * S2[t-2H+1 .. t-H] - S1[t-2H+1 .. t-H]^2

with H = frame/2, matching the reference's ``512 * sum(x^2) - sum(x)^2``
(un-normalized variance * 512^2).  Integer-exact in int64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import PipelineConfig

_CUMSUM_BLOCK = 128


def _blocked_cumsum_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the last axis, MXU-friendly.

    ``jnp.cumsum`` lowers to a serial while loop carrying the FULL array on
    TPU — traced at 0.87 ms/step for the [1024 streams, 3, 1535] detector
    window, ~30% of the whole streaming step.  This version computes
    in-block prefixes as ONE triangular matmul (128-wide blocks on the MXU,
    ``Precision.HIGHEST`` so the adds are true f32) plus an exclusive
    cumsum over the ~dozen block totals — no full-array loop carry.

    Float-only: summation ORDER differs from the serial cumsum at the ulp
    level, fine for the detector's float path (trigger margins are ~2^19
    against ulp-scale differences) but not for the bit-exact int64 oracle
    path, which keeps ``jnp.cumsum`` (integer adds are order-independent,
    and int64 matmuls don't map to the MXU anyway)."""
    t_len = x.shape[-1]
    nb = -(-t_len // _CUMSUM_BLOCK)
    pad = nb * _CUMSUM_BLOCK - t_len
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xb = xp.reshape(*x.shape[:-1], nb, _CUMSUM_BLOCK)
    # tri[j, i] = 1 for j <= i: out[..., i] = sum_{j<=i} x[..., j]
    tri = jnp.triu(jnp.ones((_CUMSUM_BLOCK, _CUMSUM_BLOCK), x.dtype))
    inblk = jnp.einsum("...bj,ji->...bi", xb, tri,
                       precision=jax.lax.Precision.HIGHEST)
    totals = inblk[..., -1]  # [..., nb]
    offsets = jnp.cumsum(totals, axis=-1) - totals  # exclusive, tiny axis
    out = inblk + offsets[..., None]
    return out.reshape(*x.shape[:-1], nb * _CUMSUM_BLOCK)[..., :t_len]


def _windowed_sums(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Trailing-window sums: out[t] = sum(x[t-win+1 .. t]), defined for
    t >= win-1 (earlier positions contain partial sums; callers mask)."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        c = _blocked_cumsum_f32(x)
    else:
        c = jnp.cumsum(x, axis=-1)
    shifted = jnp.pad(c[..., :-win], [(0, 0)] * (x.ndim - 1) + [(win, 0)])
    return c - shifted


def half_window_powers(
    streams: jnp.ndarray, frame_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(incoming, outgoing) detector powers at every sample position.

    streams: [..., T] integer or float samples.
    Returns two [..., T] arrays; positions t < frame_size - 1 are partial
    (the reference's is_full gate masks them, see ``trigger_mask``).

    Integer inputs use the reference's exact int64 arithmetic:
    power = (sum_sq << (bits-1)) - sum^2  (rolling_buffer.c:73-85).

    Numerical note: the float path computes prefix sums in the input dtype;
    float32 cumsums lose integer precision beyond ~2^24 accumulated
    magnitude, so for LONG offline streams pass integer samples (the int64
    path, exact) — as ADC sample streams naturally are.  The streaming
    model's windows are only ~frame_size + chunk long, well inside float32
    range."""
    half = frame_size // 2
    is_int = jnp.issubdtype(streams.dtype, jnp.integer)
    x = streams.astype(jnp.int64 if is_int else streams.dtype)
    s1 = _windowed_sums(x, half)
    s2 = _windowed_sums(x * x, half)
    inc = half * s2 - s1 * s1
    # outgoing window ends half samples earlier
    pad = [(0, 0)] * (x.ndim - 1) + [(half, 0)]
    out = jnp.pad(half * s2 - s1 * s1, pad)[..., : x.shape[-1]]
    # shift: outgoing[t] is incoming at t-half
    return inc, out


def trigger_mask(
    streams: jnp.ndarray,
    cfg: PipelineConfig,
    mic_axis: int = -2,
) -> jnp.ndarray:
    """Boolean [..., T] mask of trigger positions.

    streams: [..., M, T].  A position triggers when the mic-summed outgoing
    power exceeds threshold + mic-summed incoming power AND the full frame
    window is populated (t >= frame_size - 1), matching
    sample_compute.h:78-90."""
    inc, out = half_window_powers(streams, cfg.frame_size)
    inc_sum = inc.sum(axis=mic_axis)
    out_sum = out.sum(axis=mic_axis)
    t = jnp.arange(streams.shape[-1])
    is_full = t >= cfg.frame_size - 1
    if cfg.trigger_mode == "relative":
        # CFAR-style: the incoming half is the local noise-floor estimate.
        # Compared in float32 — the ratio rule is a heuristic (no bit-exact
        # reference to match), and f32's 7 digits dwarf any sane margin.
        fire = (out_sum.astype(jnp.float32)
                > jnp.float32(cfg.detect_threshold)
                + jnp.float32(cfg.trigger_ratio)
                * inc_sum.astype(jnp.float32))
    elif cfg.trigger_mode == "absolute":
        fire = out_sum > cfg.detect_threshold + inc_sum
    else:
        raise ValueError(f"unknown trigger_mode {cfg.trigger_mode!r}")
    return fire & is_full


def first_trigger(
    streams: jnp.ndarray,
    cfg: PipelineConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(index [..., ], found [...]) of the first trigger along the last axis.

    Matches the sequential loop's first-break semantics.  index is 0 when no
    trigger (check ``found``)."""
    mask = trigger_mask(streams, cfg)
    found = jnp.any(mask, axis=-1)
    idx = jnp.argmax(mask, axis=-1)
    return jnp.where(found, idx, 0), found


def extract_window_mm(
    window: jnp.ndarray,  # [M, W]
    start: jnp.ndarray,  # scalar int, in [0, max_start]
    n: int,
    max_start: int,
    block: int = 128,
) -> jnp.ndarray:
    """Gather-free ``dynamic_slice_in_dim(window, start, n, axis=-1)``.

    A vmapped dynamic_slice lowers to a serial per-stream while loop on TPU
    (traced: 0.87 ms of a 2.94 ms streaming step at 1,024 streams, plus
    ~0.9 ms of attendant slice/DUS fusions).  This form decomposes
    ``start = block*q + r`` and

    - coarse-selects among ceil((max_start+1)/block) statically shifted
      views with a `jnp.where` chain (pure VPU selects), then
    - applies the fine shift ``r`` as a per-stream one-hot [2*block, block]
      matmul at ``Precision.HIGHEST`` — bit-exact (each output element is
      1.0 * x plus exact zeros; verified equal to dynamic_slice).

    Written unbatched ([M, W] + scalar start) so ``vmap`` batches it over
    streams and event slots; the one-hot becomes one batched MXU
    contraction instead of a serialized loop."""
    import jax as _jax

    if not jnp.issubdtype(window.dtype, jnp.floating):
        # int paths keep the exact-slice formulation (int64 matmuls don't
        # map to the MXU; the bit-exact oracle path never batches streams)
        return _jax.lax.dynamic_slice_in_dim(
            window, jnp.clip(start, 0, max_start), n, axis=-1)
    w_len = window.shape[-1]
    m = window.shape[0]
    start = jnp.clip(start, 0, max_start)
    nq = -(-(max_start + 1) // block)
    q = start // block
    r = start - q * block
    # views shifted by block*q; pad so the last view is full-length (the
    # padding is never selected: start + n - 1 <= max_start + n - 1 < W
    # when max_start <= W - n, which dynamic_slice's clamp guarantees too)
    wpad = jnp.pad(window, [(0, 0), (0, nq * block + n - w_len)])
    w_c = wpad[:, :n + block]
    for k in range(1, nq):
        w_c = jnp.where(q == k, wpad[:, k * block: k * block + n + block],
                        w_c)
    nb = n // block
    if nb * block != n:  # tiny/odd frame sizes: the slice was never hot
        return _jax.lax.dynamic_slice_in_dim(window, start, n, axis=-1)
    wb = w_c.reshape(m, nb + 1, block)
    pair = jnp.concatenate([wb[:, :-1], wb[:, 1:]], axis=-1)  # [M, nb, 2B]
    j = jnp.arange(2 * block)[:, None]
    k = jnp.arange(block)[None, :]
    sel = (j == k + r).astype(jnp.float32)  # [2B, B] one-hot
    out = jnp.einsum("mbj,jk->mbk", pair, sel,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(m, n).astype(window.dtype)


def extract_frames_at(
    streams: jnp.ndarray,
    trigger_idx: jnp.ndarray,
    frame_size: int,
) -> jnp.ndarray:
    """Gather the frame_size-sample window ENDING at trigger_idx per batch.

    streams: [B, M, T]; trigger_idx: [B].  Returns [B, M, frame_size] — the
    ring contents the reference captures at its break
    (sample_compute.h:105-107: the newest 1024 samples, oldest first).
    Positions before stream start clamp to 0 (callers should ensure the
    trigger is >= frame_size - 1, which ``trigger_mask`` guarantees)."""
    start = jnp.maximum(trigger_idx - (frame_size - 1), 0)
    offs = jnp.arange(frame_size)
    gather_idx = start[:, None] + offs[None, :]  # [B, N]
    return jnp.take_along_axis(
        streams, gather_idx[:, None, :], axis=-1
    )


def all_triggers_capped(
    streams: jnp.ndarray,
    cfg: PipelineConfig,
    max_events: int,
    refractory: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Up to ``max_events`` trigger indices per stream with a refractory
    holdoff (new capability: the reference handles one event per capture
    cycle).  Returns (indices [B, max_events], valid [B, max_events]).

    Static shapes: absent events are masked, not dropped."""
    mask = trigger_mask(streams, cfg)  # [B, T]
    t_len = mask.shape[-1]
    hold = refractory if refractory > 0 else cfg.frame_size

    def body(carry, _):
        m, = carry
        found = jnp.any(m, axis=-1)
        idx = jnp.argmax(m, axis=-1)
        # suppress the holdoff window after each taken trigger
        t = jnp.arange(t_len)
        within = (t[None, :] >= idx[:, None]) & (
            t[None, :] < idx[:, None] + hold)
        m = m & ~(within & found[:, None])
        return (m,), (jnp.where(found, idx, 0), found)

    import jax

    (_,), (idxs, valids) = jax.lax.scan(
        body, (mask,), None, length=max_events)
    return jnp.moveaxis(idxs, 0, -1), jnp.moveaxis(valids, 0, -1)
