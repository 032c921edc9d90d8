"""Closed-form / iterative TDOA source solvers.

New capability: the reference's only "solver" is the SRP grid argmax
(``src/components/vga/vga_heatmap.h``).  Here the grid peak seeds a damped
Gauss-Newton refinement of the hyperbolic TDOA equations

    r_p(x) = (||x - m_j|| - ||x - m_i||) - c * tau_p

over a source constrained either to the z = h plane or to the radius-h sphere
around the array center (the reference's geometric model,
vga_heatmap.h:57-60).  Fixed iteration count, forward-mode Jacobian, written
unbatched — callers ``jax.vmap`` over frames (see models.localizer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SolverConfig
from . import consistency

# TPU's default matmul precision computes f32 contractions via bf16 MXU
# passes — enough to stall Gauss-Newton cm-level away from the optimum
# (measured: 5 cm max error at default precision vs 2e-6 at HIGHEST on the
# same inputs; CPU f32 matches HIGHEST).  Every contraction in the solvers
# is tiny (M <= 64), so full precision is free.
_HI = jax.lax.Precision.HIGHEST


def lift_to_model(xy: jnp.ndarray, height: float,
                  constrain_sphere: bool) -> jnp.ndarray:
    """Lift planar coords [..., 2] to the 3-D source model.

    'sphere' scales (x, y, h) onto the radius-``height`` sphere — exactly the
    reference's equidistant projection (vga_heatmap.h:57-60)."""
    x, y = xy[..., 0], xy[..., 1]
    raw = jnp.stack([x, y, jnp.full_like(x, height)], axis=-1)
    if constrain_sphere:
        r = jnp.linalg.norm(raw, axis=-1, keepdims=True)
        return raw * (height / jnp.maximum(r, 1e-12))
    return raw


def predicted_tdoas(
    xy: jnp.ndarray,
    mic_pos3: jnp.ndarray,
    pairs: jnp.ndarray,
    speed_of_sound: float,
    height: float,
    constrain_sphere: bool = True,
) -> jnp.ndarray:
    """Model TDOAs [..., P] (seconds) for planar source coords [..., 2]."""
    p3 = lift_to_model(xy, height, constrain_sphere)  # [..., 3]
    diff = p3[..., None, :] - mic_pos3  # [..., M, 3]
    d = jnp.linalg.norm(diff, axis=-1)  # [..., M]
    dt = (jnp.take(d, pairs[:, 1], axis=-1)
          - jnp.take(d, pairs[:, 0], axis=-1))
    return dt / speed_of_sound


def solve_tdoa(
    tdoas: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    *,
    speed_of_sound: float,
    height: float,
    init_xy: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    cfg: SolverConfig = SolverConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Damped Gauss-Newton TDOA solve (unbatched; vmap over frames).

    tdoas: [P] measured TDOAs in seconds; init_xy: [2] (typically the SRP
    grid peak).  Returns (xy [2], rms residual scalar in meters)."""
    mic_pos3 = jnp.zeros((mic_positions.shape[0], 3), dtype=init_xy.dtype)
    mic_pos3 = mic_pos3.at[:, : mic_positions.shape[1]].set(mic_positions)
    c = speed_of_sound

    def residual(xy):
        pred = predicted_tdoas(
            xy, mic_pos3, pairs, c, height, cfg.constrain_to_sphere
        )
        r = (pred - tdoas) * c  # meters
        if weights is not None:
            r = r * weights
        return r

    def gn_step(_, xy):
        r = residual(xy)  # [P]
        jac = jax.jacfwd(residual)(xy)  # [P, 2]
        jtj = jnp.matmul(jac.T, jac, precision=_HI)
        jtr = jnp.matmul(jac.T, r, precision=_HI)
        damp = cfg.damping * jnp.eye(2, dtype=xy.dtype)
        delta = jnp.linalg.solve(jtj + damp, jtr)
        return (xy - delta).astype(xy.dtype)

    xy = jax.lax.fori_loop(0, cfg.iterations, gn_step, init_xy)
    r = residual(xy)
    rms = jnp.sqrt(jnp.mean(r * r))
    return xy, rms


def solve_tdoa_batched(
    tdoas: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    *,
    speed_of_sound: float,
    height: float,
    init_xy: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    cfg: SolverConfig = SolverConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fully batched damped Gauss-Newton (the TPU hot path).

    Same math as :func:`solve_tdoa` but with an analytic Jacobian and a
    closed-form damped 2x2 solve, vectorized over the batch — a handful of
    large elementwise ops per iteration instead of per-sample autodiff and
    tiny linear solves (which dominate wall-clock when batched via vmap).

    tdoas: [B, P] seconds; init_xy: [B, 2].  Returns (xy [B, 2], rms [B]).

    The GN iteration never touches the pair axis: with pair differencing
    written as r = S d - t (S the [P, M] +-1 selection matrix), the normal
    equations J^T J and J^T r only need the sufficient statistics
    Q = S^T W S ([M, M], constant) and t2 = S^T W t ([B, M], computed once
    per solve) — so per-iteration cost is O(B M^2) instead of O(B P M),
    a ~30x FLOP cut for 64-mic/2016-pair arrays.  Only the final RMS
    evaluates an explicit [B, P] residual (once), avoiding the f32
    cancellation a quadratic-form RMS would have.

    With ``cfg.robust`` set ('huber'/'cauchy'), IRLS rounds follow the
    plain solve: per-pair robust weights from the residuals (adaptive MAD
    scale by default), per-batch sufficient statistics, GN re-run — so
    multipath-corrupted pairs are down-weighted instead of dragging the
    fit (new capability; no reference analogue)."""
    dt = init_xy.dtype
    m = mic_positions.shape[0]
    mic3 = jnp.zeros((m, 3), dt).at[:, : mic_positions.shape[1]].set(
        mic_positions.astype(dt))
    c = jnp.asarray(speed_of_sound, dt)
    h = jnp.asarray(height, dt)
    target = tdoas.astype(dt) * c  # [B, P] meters
    damp = jnp.asarray(cfg.damping, dt)
    # pair differencing as a +-1 selection matmul instead of two gathers:
    # TPU gathers over the pair axis are pathological at large P (the same
    # finding as ops/srp.py's one-hot scoring); S is exact in f32
    sel = consistency.pair_selection(pairs, m, dt)  # [P, M]
    w2 = None if weights is None else (weights * weights).astype(dt)  # [P]
    sel_w = sel if w2 is None else sel * w2[:, None]
    q = jnp.matmul(sel.T, sel_w, precision=_HI)           # [M, M]
    t2 = jnp.einsum("pm,...p->...m", sel_w, target,
                precision=_HI)                        # [B, M]

    def dist_grad(xy):
        v = jnp.concatenate(
            [xy, jnp.full(xy.shape[:-1] + (1,), h, dt)], axis=-1)  # [B, 3]
        if cfg.constrain_to_sphere:
            nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
            vhat = v / jnp.maximum(nv, 1e-12)
            s = h * vhat  # [B, 3]
            # J_s = h/|v| (I - vhat vhat^T) E,  E = d v / d xy = [[1,0],[0,1],[0,0]]
            scale = h / jnp.maximum(nv, 1e-12)  # [B, 1]
            e = jnp.zeros((3, 2), dt).at[0, 0].set(1.0).at[1, 1].set(1.0)
            js = scale[..., None] * (
                e - vhat[..., None] * vhat[..., :2][..., None, :])  # [B, 3, 2]
        else:
            s = v
            js = jnp.broadcast_to(
                jnp.zeros((3, 2), dt).at[0, 0].set(1.0).at[1, 1].set(1.0),
                xy.shape[:-1] + (3, 2))
        diff = s[..., None, :] - mic3  # [B, M, 3]
        d = jnp.linalg.norm(diff, axis=-1)  # [B, M]
        u = diff / jnp.maximum(d[..., None], 1e-12)  # [B, M, 3]
        gd = jnp.einsum("...mi,...ij->...mj", u, js,
                        precision=_HI)  # [B, M, 2]
        return d, gd

    def gn_loop(q_, t2_, xy0):
        # q_ may be the shared [M, M] statistic or a per-batch [B, M, M]
        # (robust IRLS rounds); the einsums broadcast either way
        def gn_step(_, xy):
            d, gd = dist_grad(xy)
            # normal equations from the M-space sufficient statistics:
            # a = gd^T Q gd, b = gd^T (Q d - t2) — no [B, P] tensors
            qgd = jnp.einsum("...mn,...nj->...mj", q_, gd, precision=_HI)
            a = jnp.einsum("...mi,...mj->...ij", gd, qgd,
                           precision=_HI)  # [B, 2, 2]
            qd = jnp.einsum("...mn,...n->...m", q_, d, precision=_HI)
            b = jnp.einsum("...mi,...m->...i", gd, qd - t2_,
                           precision=_HI)  # [B, 2]
            a00 = a[..., 0, 0] + damp
            a11 = a[..., 1, 1] + damp
            a01 = a[..., 0, 1]
            det = a00 * a11 - a01 * a01
            inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
            dx = (a11 * b[..., 0] - a01 * b[..., 1]) * inv_det
            dy = (a00 * b[..., 1] - a01 * b[..., 0]) * inv_det
            return xy - jnp.stack([dx, dy], axis=-1)

        # statically unrolled: a fori_loop here lowers to a while op whose
        # per-iteration bookkeeping and fusion barrier cost ~0.3 ms at
        # B = 1024 in the streaming step (trace r3); the body is a handful
        # of small einsums, so a flat graph is strictly better
        if cfg.iterations > 32:  # keep compile bounded for unusual configs
            return jax.lax.fori_loop(0, cfg.iterations, gn_step, xy0)
        xy_it = xy0
        for i in range(cfg.iterations):
            xy_it = gn_step(i, xy_it)
        return xy_it

    def pair_residual(xy, weighted=True):
        d, _ = dist_grad(xy)
        r = jnp.einsum("pm,...m->...p", sel, d,
                       precision=_HI) - target  # [B, P] meters
        return r if (weights is None or not weighted) else r * weights

    xy = gn_loop(q, t2, init_xy.astype(dt))

    if cfg.robust != "none":
        # IRLS: reweight pairs by their residuals and re-run the GN loop.
        # Each round rebuilds PER-BATCH sufficient statistics ([B, M, M])
        # from the robust weights — the one place the pair axis re-enters,
        # once per round, as a single einsum.
        base_w2 = jnp.ones(pairs.shape[0], dt) if w2 is None else w2
        for _ in range(cfg.irls_iterations):
            # robust weights and the MAD scale come from the RAW residual:
            # a confidence-weighted residual would conflate a pair's
            # outlier-ness with its confidence (a low-confidence gross
            # outlier would look small and escape down-weighting)
            r = pair_residual(xy, weighted=False)  # [B, P] meters
            ar = jnp.abs(r)
            if cfg.robust_scale_m > 0:
                delta = jnp.asarray(cfg.robust_scale_m, dt)
            else:
                # adaptive: 1.4826 * MAD, the standard robust sigma
                delta = jnp.asarray(1.345 * 1.4826, dt) * jnp.maximum(
                    jnp.median(ar, axis=-1, keepdims=True), 1e-6)
            if cfg.robust == "huber":
                w_rob = jnp.minimum(1.0, delta / jnp.maximum(ar, 1e-12))
            elif cfg.robust == "cauchy":
                w_rob = 1.0 / (1.0 + (ar / delta) ** 2)
            else:
                raise ValueError(f"unknown robust mode {cfg.robust!r}")
            w2_tot = base_w2 * w_rob  # [B, P]
            q_b = jnp.einsum("pm,pn,...p->...mn", sel, sel, w2_tot,
                             precision=_HI)  # [B, M, M]
            t2_b = jnp.einsum("pm,...p,...p->...m", sel, w2_tot, target,
                              precision=_HI)  # [B, M]
            xy = gn_loop(q_b, t2_b, xy)

    r = pair_residual(xy)  # final only
    rms = jnp.sqrt(jnp.mean(r * r, axis=-1))
    return xy, rms


def solution_covariance(
    xy: jnp.ndarray,
    rms: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    *,
    height: float,
    n_pairs: int | None = None,
    cfg: SolverConfig = SolverConfig(),
    min_sigma_m: float = 1e-4,
) -> jnp.ndarray:
    """Position covariance [..., 2, 2] of a GN solution (meters^2).

    The standard nonlinear-least-squares estimate: Cov = sigma^2 (J^T J)^-1
    evaluated at the solution, with the unit-weight variance
    sigma^2 = ||r||^2 / (P - 2) taken from the solver's residual RMS (for
    robust fits the RMS still includes the down-weighted outlier pairs, so
    the reported covariance is CONSERVATIVE — it overstates rather than
    hides the uncertainty an outlier injected).  The
    same M-space sufficient statistic Q = S^T S as solve_tdoa_batched —
    no [B, P] tensors.  ``min_sigma_m`` floors sigma (a perfectly-fitting
    solve still has at least quantization-level uncertainty).

    This is what a downstream tracker should use as its per-measurement
    noise R (models.tracking step(..., z_cov=...)): events with weak
    geometry (far off-axis, degenerate TDOAs) get honest, larger
    ellipses instead of the global scalar default.
    """
    dt = xy.dtype
    m = mic_positions.shape[0]
    mic3 = jnp.zeros((m, 3), dt).at[:, : mic_positions.shape[1]].set(
        mic_positions.astype(dt))
    h = jnp.asarray(height, dt)
    p_count = int(pairs.shape[0]) if n_pairs is None else int(n_pairs)
    sel = consistency.pair_selection(pairs, m, dt)
    q = jnp.matmul(sel.T, sel, precision=_HI)

    v = jnp.concatenate(
        [xy, jnp.full(xy.shape[:-1] + (1,), h, dt)], axis=-1)
    if cfg.constrain_to_sphere:
        nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
        vhat = v / jnp.maximum(nv, 1e-12)
        s = h * vhat
        scale = h / jnp.maximum(nv, 1e-12)
        e = jnp.zeros((3, 2), dt).at[0, 0].set(1.0).at[1, 1].set(1.0)
        js = scale[..., None] * (
            e - vhat[..., None] * vhat[..., :2][..., None, :])
    else:
        s = v
        js = jnp.broadcast_to(
            jnp.zeros((3, 2), dt).at[0, 0].set(1.0).at[1, 1].set(1.0),
            xy.shape[:-1] + (3, 2))
    diff = s[..., None, :] - mic3
    d = jnp.linalg.norm(diff, axis=-1)
    u = diff / jnp.maximum(d[..., None], 1e-12)
    gd = jnp.einsum("...mi,...ij->...mj", u, js,
                    precision=_HI)                    # [..., M, 2]
    qgd = jnp.einsum("mn,...nj->...mj", q, gd, precision=_HI)
    a = jnp.einsum("...mi,...mj->...ij", gd, qgd,
                   precision=_HI)                     # [..., 2, 2] = J^T J
    # sigma^2 = sum r^2 / (P - 2) = P * rms^2 / (P - 2)
    dof = max(p_count - 2, 1)
    sigma2 = jnp.maximum(rms, min_sigma_m) ** 2 * (p_count / dof)
    a00 = a[..., 0, 0] + cfg.damping
    a11 = a[..., 1, 1] + cfg.damping
    a01 = a[..., 0, 1]
    det = jnp.maximum(a00 * a11 - a01 * a01, 1e-20)
    inv = jnp.stack([
        jnp.stack([a11, -a01], axis=-1),
        jnp.stack([-a01, a00], axis=-1)], axis=-2) / det[..., None, None]
    return sigma2[..., None, None] * inv


def solve_tdoa_xyz(
    tdoas: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    *,
    speed_of_sound: float,
    init_xyz: jnp.ndarray,
    iterations: int = 8,
    damping: float = 1e-3,
    z_min: float = 0.05,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Free 3-D damped Gauss-Newton TDOA solve (batched).

    Unlike :func:`solve_tdoa_batched` the source is unconstrained in
    (x, y, z) — this resolves range/height from the fractional part of the
    sub-sample TDOAs, fixing the one-cell radial bias inherent to integer-lag
    SRP grids.  z is clamped to >= z_min each step (planar arrays cannot
    distinguish +-z; keep the physical half-space).

    tdoas: [B, P] seconds; init_xyz: [B, 3].  Returns (xyz [B, 3], rms [B]).
    """
    dt = init_xyz.dtype
    m = mic_positions.shape[0]
    mic3 = jnp.zeros((m, 3), dt).at[:, : mic_positions.shape[1]].set(
        mic_positions.astype(dt))
    c = jnp.asarray(speed_of_sound, dt)
    target = tdoas.astype(dt) * c
    damp = jnp.asarray(damping, dt)
    # +-1 selection matmul over pairs; the iteration uses only the M-space
    # sufficient statistics Q = S^T S and t2 = S^T target (see
    # solve_tdoa_batched) — per-iteration cost O(B M^2), pair-count-free
    sel = consistency.pair_selection(pairs, m, dt)  # [P, M]
    q = jnp.matmul(sel.T, sel, precision=_HI)            # [M, M]
    t2 = jnp.einsum("pm,...p->...m", sel, target,
                    precision=_HI)                       # [B, M]

    def dist_grad(xyz):
        diff = xyz[..., None, :] - mic3  # [B, M, 3]
        d = jnp.linalg.norm(diff, axis=-1)
        u = diff / jnp.maximum(d[..., None], 1e-12)  # [B, M, 3]
        return d, u

    def gn_step(_, xyz):
        d, u = dist_grad(xyz)
        qu = jnp.einsum("mn,...nj->...mj", q, u, precision=_HI)
        a = jnp.einsum("...mi,...mj->...ij", u, qu, precision=_HI) \
            + damp * jnp.eye(3, dtype=dt)
        qd = jnp.einsum("mn,...n->...m", q, d, precision=_HI)
        b = jnp.einsum("...mi,...m->...i", u, qd - t2, precision=_HI)
        delta = jnp.linalg.solve(a, b[..., None])[..., 0]
        xyz = xyz - delta
        return xyz.at[..., 2].set(jnp.maximum(xyz[..., 2], z_min))

    # statically unrolled, same rationale as solve_tdoa_batched's gn_loop
    xyz = init_xyz.astype(dt)
    if iterations > 32:
        xyz = jax.lax.fori_loop(0, iterations, gn_step, xyz)
    else:
        for i in range(iterations):
            xyz = gn_step(i, xyz)
    d, _ = dist_grad(xyz)
    r = jnp.einsum("pm,...m->...p", sel, d,
                   precision=_HI) - target  # [B, P], final only
    rms = jnp.sqrt(jnp.mean(r * r, axis=-1))
    return xyz, rms


def solve_tdoa_xyz_multistart(
    tdoas: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    *,
    speed_of_sound: float,
    init_xy: jnp.ndarray,
    z_inits: tuple = (0.4, 1.2, 2.0),
    iterations: int = 40,
    damping: float = 1e-4,
    z_min: float = 0.05,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Free 3-D solve without a volumetric grid: multi-start over a few z
    initializations, keeping the lowest-residual branch per batch item.

    Rationale: from a single plane-height init, GN stalls on nearly
    overhead sources (range enters only through wavefront curvature, so
    the z gradient is tiny — measured 0.36 m residual error after 12
    iterations); three z starts with light damping converge everywhere
    (measured <1 cm on exact TDOAs, incl. the overhead case).  Cost is
    len(z_inits) small batched solves — the streaming-step-friendly
    alternative to scoring a full VolumeConfig grid.

    tdoas: [B, P] seconds; init_xy: [B, 2].  Returns (xyz [B, 3], rms [B]).
    """
    outs = []
    for z0 in z_inits:
        init = jnp.concatenate(
            [init_xy,
             jnp.full(init_xy.shape[:-1] + (1,), z0, init_xy.dtype)],
            axis=-1)
        outs.append(solve_tdoa_xyz(
            tdoas, mic_positions, pairs,
            speed_of_sound=speed_of_sound, init_xyz=init,
            iterations=iterations, damping=damping, z_min=z_min))
    xyzs = jnp.stack([o[0] for o in outs])  # [Z, B, 3]
    rmss = jnp.stack([o[1] for o in outs])  # [Z, B]
    pick = jnp.argmin(rmss, axis=0)  # [B]
    take = jax.nn.one_hot(pick, len(z_inits), dtype=xyzs.dtype)  # [B, Z]
    xyz = jnp.einsum("bz,zbi->bi", take, xyzs)
    rms = jnp.einsum("bz,zb->b", take, rmss)
    return xyz, rms


def solve_tdoa_sync(
    tdoas: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    mic_array_id: jnp.ndarray,
    n_arrays: int,
    *,
    speed_of_sound: float,
    height: float,
    init_xy: jnp.ndarray,
    init_offsets_s: jnp.ndarray | None = None,
    weights: jnp.ndarray | None = None,
    event_times_s: jnp.ndarray | None = None,
    iterations: int = 12,
    damping: float = 1e-3,
):
    """Joint localization + clock synchronization across arrays.

    Multi-array fusion with independent ADC clocks: a TDOA between mics of
    DIFFERENT arrays carries the unknown inter-array clock offset,

        tau_p = (||s - m_j|| - ||s - m_i||) / c + (delta_a(j) - delta_a(i)),

    while intra-array TDOAs are offset-free.  This solves ALL events'
    positions and the shared per-array offsets jointly by damped
    Gauss-Newton with the classic bundle-adjustment structure: the normal
    matrix is block-diagonal in the E per-event 2x2 position blocks plus a
    dense shared block, so each iteration eliminates the positions by a
    batched closed-form 2x2 inverse and solves only the small shared Schur
    complement (array 0 is the time reference, delta_0 = 0).
    New capability — the reference is a single synchronous array
    (src/components/constants.h ADC channel map); cross-array baselines
    are exactly what fixes its range ambiguity, and offsets are what a
    real distributed deployment must estimate to use them.

    With ``event_times_s`` [E] given, each array's clock error is modeled
    as offset PLUS skew, delta_k + rho_k * (t - t_mean) — free-running
    ADC crystals drift tens of ppm, i.e. tens of samples per minute, so
    any session longer than a few seconds needs the linear term.  The
    shared block then has 2(K-1) unknowns and the drift rate rho
    (seconds of clock error per second) is returned too.

    tdoas: [E, P] seconds over pairs into the CONCATENATED mic set;
    mic_array_id: [Mall] array index per mic; init_xy: [E, 2] (plane model
    at z = height, world frame).  weights: optional [P] per-pair.
    Returns (xy [E, 2], offsets_s [K-1], rms [E]) — plus drift [K-1]
    before rms when ``event_times_s`` is given:
    (xy, offsets_s, drift_s_per_s, rms).
    """
    if n_arrays < 2:
        raise ValueError("solve_tdoa_sync needs >= 2 arrays")
    dt = init_xy.dtype
    m = mic_positions.shape[0]
    mic3 = jnp.zeros((m, 3), dt).at[:, : mic_positions.shape[1]].set(
        mic_positions.astype(dt))
    c = jnp.asarray(speed_of_sound, dt)
    h = jnp.asarray(height, dt)
    target = tdoas.astype(dt) * c  # [E, P] meters
    damp = jnp.asarray(damping, dt)
    kk = n_arrays - 1
    with_drift = event_times_s is not None
    n_shared = 2 * kk if with_drift else kk

    sel = consistency.pair_selection(pairs, m, dt)  # [P, M] +-1
    # offset-difference design D [P, K-1]: row p reads
    # delta_a(j_p) - delta_a(i_p) with delta_0 fixed at 0
    a_of = jnp.asarray(mic_array_id, jnp.int32)
    aj = jnp.take(a_of, pairs[:, 1])  # [P]
    ai = jnp.take(a_of, pairs[:, 0])
    ks = jnp.arange(1, n_arrays, dtype=jnp.int32)
    d_mat = ((aj[:, None] == ks).astype(dt)
             - (ai[:, None] == ks).astype(dt))  # [P, K-1]
    w = None if weights is None else weights.astype(dt)  # [P]
    # per-event shared-block Jacobian jd [E, P, S]: c*D for the offsets,
    # c*D*(t_e - t_mean) for the drift columns (centered times keep the
    # two column groups near-orthogonal)
    e_events = tdoas.shape[0]
    if with_drift:
        t = event_times_s.astype(dt)
        t = t - jnp.mean(t)  # [E]
        jd = jnp.concatenate([
            jnp.broadcast_to(c * d_mat, (e_events,) + d_mat.shape),
            c * d_mat * t[:, None, None]], axis=-1)  # [E, P, 2(K-1)]
    else:
        jd = jnp.broadcast_to(
            c * d_mat, (e_events,) + d_mat.shape)  # [E, P, K-1]
    jd_w = jd if w is None else jd * w[:, None]

    def dist_grad(xy):
        """plane model: source (x, y, height); d [E, M], grad [E, M, 2]."""
        s = jnp.concatenate(
            [xy, jnp.full(xy.shape[:-1] + (1,), h, dt)], axis=-1)
        diff = s[..., None, :] - mic3  # [E, M, 3]
        d = jnp.linalg.norm(diff, axis=-1)
        u = diff / jnp.maximum(d[..., None], 1e-12)
        return d, u[..., :2]

    def raw_residual(xy, shared):
        d, gd = dist_grad(xy)
        r = (jnp.einsum("pm,em->ep", sel, d, precision=_HI)
             + jnp.einsum("eps,s->ep", jd, shared, precision=_HI)
             - target)  # [E, P] meters
        return r, gd

    def step(xy, shared):
        r, gd = raw_residual(xy, shared)
        jp = jnp.einsum("pm,emj->epj", sel, gd, precision=_HI)  # [E, P, 2]
        if w is not None:
            r = r * w
            jp = jp * w[:, None]
        # normal-equation blocks
        a = jnp.einsum("epi,epj->eij", jp, jp, precision=_HI)  # [E, 2, 2]
        b = jnp.einsum("epi,eps->eis", jp, jd_w, precision=_HI)  # [E, 2, S]
        bp = jnp.einsum("epi,ep->ei", jp, r, precision=_HI)  # [E, 2]
        cmat = jnp.einsum("eps,epq->sq", jd_w, jd_w, precision=_HI)  # [S, S]
        bd = jnp.einsum("eps,ep->s", jd_w, r, precision=_HI)  # [S]
        # closed-form damped 2x2 inverses
        a00 = a[:, 0, 0] + damp
        a11 = a[:, 1, 1] + damp
        a01 = a[:, 0, 1]
        det = jnp.maximum(jnp.abs(a00 * a11 - a01 * a01), 1e-20)
        inv = jnp.stack([
            jnp.stack([a11, -a01], axis=-1),
            jnp.stack([-a01, a00], axis=-1)], axis=-2) / det[:, None, None]
        ainv_b = jnp.einsum("eij,ejs->eis", inv, b,
                            precision=_HI)  # [E, 2, S]
        ainv_bp = jnp.einsum("eij,ej->ei", inv, bp, precision=_HI)  # [E, 2]
        # shared-block Schur complement
        schur = (cmat - jnp.einsum("eis,eiq->sq", b, ainv_b, precision=_HI)
                 + damp * jnp.eye(n_shared, dtype=dt))
        rhs = bd - jnp.einsum("eis,ei->s", b, ainv_bp, precision=_HI)
        d_sh = jnp.linalg.solve(schur, rhs[:, None])[:, 0]  # [S]
        d_xy = ainv_bp - jnp.einsum("eis,s->ei", ainv_b, d_sh,
                                    precision=_HI)  # [E, 2]
        return xy - d_xy, shared - d_sh

    xy = init_xy.astype(dt)
    shared = jnp.zeros((n_shared,), dt)
    if init_offsets_s is not None:
        shared = shared.at[:kk].set(init_offsets_s.astype(dt))
    for _ in range(iterations):  # statically unrolled (small graphs)
        xy, shared = step(xy, shared)

    r, _ = raw_residual(xy, shared)
    if w is not None:
        r = r * w
    rms = jnp.sqrt(jnp.mean(r * r, axis=-1))
    if with_drift:
        return xy, shared[:kk], shared[kk:], rms
    return xy, shared, rms


def farfield_bearing(
    tdoas: jnp.ndarray,
    mic_positions: jnp.ndarray,
    pairs: jnp.ndarray,
    speed_of_sound: float,
) -> jnp.ndarray:
    """Linear far-field direction estimate (new capability, for DoA configs).

    Least-squares unit vector u from (m_j - m_i) . u ~= -c * tau_p.
    Dimension-generic: mic_positions [M, dim] (dim 2 or 3) -> bearings
    [..., dim] (unit), batched over leading tdoa axes.  For a coplanar
    [M, 3] array the z row of the normal equations is rank-deficient; the
    damping keeps it solvable and the z component collapses to ~0 (the
    caller resolves the +-z ambiguity, e.g. Doa3dEstimator's hemisphere
    grid)."""
    d = (jnp.take(mic_positions, pairs[:, 1], axis=0)
         - jnp.take(mic_positions, pairs[:, 0], axis=0))  # [P, dim]
    rhs = -speed_of_sound * tdoas  # [..., P]
    ata = jnp.matmul(d.T, d, precision=_HI)  # [dim, dim]
    atb = jnp.einsum("pi,...p->...i", d, rhs, precision=_HI)
    u = jnp.linalg.solve(
        ata + 1e-9 * jnp.eye(d.shape[1], dtype=d.dtype), atb[..., None]
    )[..., 0]
    norm = jnp.linalg.norm(u, axis=-1, keepdims=True)
    return u / jnp.maximum(norm, 1e-12)
