"""TDOA cycle-consistency: denoising, residuals, and mic-fault diagnosis.

Pairwise TDOAs are redundant: any cycle must close (tau_ij + tau_jk =
tau_ik).  Projecting measured TDOAs onto the consistent subspace — the
image of the pair-difference operator S (tau = S t for per-mic arrival
times t) — averages that redundancy away (the graph-TDOA idea of
arXiv:2507.07087, solved in closed form here), and the projection
RESIDUAL attributes inconsistency to individual microphones: a mic whose
correlations are garbage (dead channel, saturated ADC, loose cable)
poisons exactly the pairs that touch it, while a merely-delayed mic stays
perfectly consistent (the delay is absorbed into its arrival time).

New capability — the reference has no health monitoring at all; its only
quality gate is the shift-sum heuristic (sample_compute.h:124-134).

All ops are batched/jittable; the solve is on the M-dim arrival-time
space (the same sufficient-statistics trick as ops.solver), never on the
P-dim pair space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def pair_selection(pairs: jnp.ndarray, n_mics: int, dtype) -> jnp.ndarray:
    """The +-1 pair-difference matrix S [P, M]: tau = S t with
    tau_p = t_j - t_i (ops.solver convention: positive lag = mic j lags
    mic i).  Shared by the GN solver's sufficient statistics, the
    covariance estimate, and the consistency projection — a matmul with S
    instead of two gathers (TPU gathers over the pair axis are
    pathological at large P; see ops/srp.py)."""
    return (jax.nn.one_hot(pairs[:, 1], n_mics, dtype=dtype)
            - jax.nn.one_hot(pairs[:, 0], n_mics, dtype=dtype))


def project_consistent(
    tdoas: jnp.ndarray,
    pairs: jnp.ndarray,
    n_mics: int,
    weights: jnp.ndarray | None = None,
):
    """Least-squares projection onto the cycle-consistent subspace.

    tdoas: [..., P] (any time unit); optional per-pair weights [..., P]
    (e.g. peak confidence).  Returns (tau_consistent [..., P],
    arrival_times [..., M] zero-mean, residual [..., P] = measured -
    consistent).

    Solves min_t sum_p w_p (tau_p - (t_j - t_i))^2 with the mean-t gauge
    fixed by augmenting the (singular) graph Laplacian S^T W S with the
    rank-one 11^T/M term — exact because the solution is orthogonal to 1.
    """
    dt = tdoas.dtype
    sel = pair_selection(pairs, n_mics, dt)  # [P, M]
    if weights is None:
        lap = jnp.matmul(sel.T, sel, precision=_HI)  # [M, M]
        rhs = jnp.einsum("pm,...p->...m", sel, tdoas, precision=_HI)
    else:
        w = weights.astype(dt)
        lap = jnp.einsum("pm,pn,...p->...mn", sel, sel, w, precision=_HI)
        rhs = jnp.einsum("pm,...p,...p->...m", sel, w, tdoas, precision=_HI)
    gauge = jnp.ones((n_mics, n_mics), dt) / n_mics
    t = jnp.linalg.solve(
        jnp.broadcast_to(lap + gauge, rhs.shape + (n_mics,)),
        rhs[..., None])[..., 0]
    tau_c = jnp.einsum("pm,...m->...p", sel, t, precision=_HI)
    return tau_c, t, tdoas - tau_c


def mic_consistency_scores(
    residual: jnp.ndarray,
    pairs: jnp.ndarray,
    n_mics: int,
) -> jnp.ndarray:
    """Per-mic mean |residual| over the pairs touching each mic [..., M].

    A healthy array scores near the TDOA noise floor on every mic; a mic
    producing garbage correlations scores high on ALL its pairs."""
    touch = (jax.nn.one_hot(pairs[:, 0], n_mics, dtype=residual.dtype)
             + jax.nn.one_hot(pairs[:, 1], n_mics, dtype=residual.dtype))
    num = jnp.einsum("pm,...p->...m", touch, jnp.abs(residual))
    return num / touch.sum(axis=0)


def mic_weights(
    scores: jnp.ndarray,
    *,
    ratio: float = 3.0,
    floor: float = 1e-9,
) -> jnp.ndarray:
    """Per-mic down-weights [..., M] from consistency scores [..., M].

    Cauchy weight on the score measured in units of the median-of-mics
    (the healthy-array scale, so the weighting is scale-free):
    ``w = 1 / (1 + (s / (ratio * max(median, floor)))^2)``.  A healthy
    array — every score near the common noise floor — gets near-uniform
    weights (~1/(1 + 1/ratio^2) each, and only relative weights matter to
    a least-squares solve); a channel producing garbage correlations
    collapses toward ``(ratio * med / s)^2``.  ``floor`` bounds the scale
    when the array is nearly perfectly consistent (units = the scores').
    """
    med = jnp.median(scores, axis=-1, keepdims=True)
    r = scores / (ratio * jnp.maximum(med, floor))
    return 1.0 / (1.0 + r * r)


def pair_weights(
    w_mic: jnp.ndarray,
    pairs: jnp.ndarray,
    n_mics: int,
) -> jnp.ndarray:
    """Per-pair weights ``w_i * w_j`` [..., P] from per-mic weights
    [..., M] — two one-hot matmuls instead of pair-axis gathers (TPU
    gathers over large P are pathological; see ops/srp.py)."""
    dt = w_mic.dtype
    oi = jax.nn.one_hot(pairs[:, 0], n_mics, dtype=dt)
    oj = jax.nn.one_hot(pairs[:, 1], n_mics, dtype=dt)
    wi = jnp.einsum("pm,...m->...p", oi, w_mic)
    wj = jnp.einsum("pm,...m->...p", oj, w_mic)
    return wi * wj


def mic_exclusion_weights(
    tdoas: jnp.ndarray,
    pairs: jnp.ndarray,
    n_mics: int,
    *,
    ratio: float = 3.0,
    floor: float = 1e-9,
) -> jnp.ndarray:
    """Per-mic weights [..., M] by leave-one-mic-out consistency testing.

    Pure per-pair IRLS cannot reliably kill ALL of a dead channel's pairs:
    the dead mic's arrival time is a free parameter fit to its own garbage
    TDOAs, so whichever 1-2 of them land near that consensus-of-garbage
    get small residuals and survive.  The exclusion test is unambiguous
    instead: project M times, each time with one mic's pairs (near-)zeroed,
    and measure the residual RMS over the surviving pairs.  Excluding a
    healthy mic leaves the bad pairs in (RMS stays high); excluding the
    dead mic drops the RMS to the noise floor.  The weight is Cauchy in
    the ratio ``median(rms_excl) / rms_excl[m]`` — ~1 for every mic on a
    healthy array (w ~ 0.9 uniform), large exactly for a faulty mic.

    One fault is identified exactly; coincident multi-mic faults only
    partially (pair with the IRLS stage, which handles lone bad pairs).
    ``floor``: RMS floor in the tdoas' units.  Cost: M tiny [M, M] solves,
    batched — negligible.
    """
    dt = tdoas.dtype
    touch = (jax.nn.one_hot(pairs[:, 0], n_mics, dtype=dt)
             + jax.nn.one_hot(pairs[:, 1], n_mics, dtype=dt))  # [P, M]
    # 1e-6 instead of 0 keeps the excluded mic's arrival time weakly tied
    # (a zero row would isolate that vertex of the pair graph and make the
    # gauge-augmented Laplacian singular)
    w_excl = jnp.maximum(1.0 - touch.T, 1e-6)  # [M, P]
    tau_b = jnp.broadcast_to(
        tdoas[..., None, :], tdoas.shape[:-1] + w_excl.shape)  # [..., M, P]
    _, _, resid = project_consistent(tau_b, pairs, n_mics, weights=w_excl)
    keep = 1.0 - touch.T  # exact 0/1 mask for the RMS itself
    rms = jnp.sqrt(
        jnp.sum(keep * resid * resid, axis=-1)
        / jnp.sum(keep, axis=-1))  # [..., M]
    med = jnp.median(rms, axis=-1, keepdims=True)
    score = med / jnp.maximum(rms, floor)
    r = score / ratio
    return 1.0 / (1.0 + r * r)


def fault_weights(
    tdoas: jnp.ndarray,
    pairs: jnp.ndarray,
    n_mics: int,
    *,
    rounds: int = 3,
    ratio: float = 3.0,
    floor: float = 1e-9,
):
    """Full fault-tolerant weighting: leave-one-mic-out mic weights (dead
    channels) seeding per-pair IRLS (lone multipath pairs).

    Returns ``(w_pair [..., P], tau_consistent [..., P], w_mic [..., M])``:
    ``w_pair`` multiplies squared residuals (pass its sqrt as the solver's
    std-style ``weights``); ``tau_consistent`` is the denoised TDOA set
    from the final weighted projection — every pair re-synthesized from
    arrival times fitted essentially to the healthy pairs alone.
    """
    w_mic = mic_exclusion_weights(
        tdoas, pairs, n_mics, ratio=ratio, floor=floor)
    w0 = pair_weights(w_mic, pairs, n_mics)
    w = w0
    tau_c = tdoas
    for _ in range(rounds):
        tau_c, _, resid = project_consistent(tdoas, pairs, n_mics, weights=w)
        med = jnp.median(jnp.abs(resid), axis=-1, keepdims=True)
        r = resid / (ratio * jnp.maximum(med, floor))
        w = w0 / (1.0 + r * r)
    return w, tau_c, w_mic


def diagnose_mics(
    tdoas: jnp.ndarray,
    pairs: jnp.ndarray,
    n_mics: int,
    *,
    weights: jnp.ndarray | None = None,
    ratio_thresh: float = 3.0,
    floor: float = 1e-9,
):
    """Flag faulty microphones from TDOA inconsistency.

    Returns a dict:
    - 'scores'   [..., M]: per-mic mean |cycle residual|
    - 'faulty'   [..., M] bool: score > ratio_thresh * median(others)
    - 'residual_rms' [...]: overall consistency (0 = perfectly consistent)

    Note a constant per-mic DELAY is invisible here by design (it is a
    valid arrival-time shift); this detects mics whose pair measurements
    are mutually inconsistent — noise-only channels, dropouts, saturation.
    """
    _, _, resid = project_consistent(tdoas, pairs, n_mics, weights)
    scores = mic_consistency_scores(resid, pairs, n_mics)
    med = jnp.median(scores, axis=-1, keepdims=True)
    faulty = scores > ratio_thresh * jnp.maximum(med, floor)
    rms = jnp.sqrt(jnp.mean(resid * resid, axis=-1))
    return {"scores": scores, "faulty": faulty, "residual_rms": rms}
