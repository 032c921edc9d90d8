"""Acoustic reflector mapping: estimate wall positions from echoes.

New capability with no reference equivalent (the firmware's peak taper
exists precisely to *suppress* echoes, ``correlations.c:26-33``; here they
become signal).  Given events from a few source positions, the mapper
recovers the geometry of nearby acoustic reflectors (walls):

1. localize the direct source (the flagship single-source pipeline);
2. measure each mic's *echo delay* — the lag of the reflected arrival
   behind the direct one — from its band-limited autocorrelation
   (``ops/echo``; linear in the echo amplitude, unlike the image source's
   pairwise-GCC peak which scales with its square and is unusably weak at
   realistic wall distances);
3. convert delays to per-mic *ranges* of the mirror image source
   (``range_k = |src - mic_k| + c * delay_k``) and multilaterate the
   image position — absolute ranges localize a distant image far better
   than TDOA curvature across a small aperture;
4. the wall is the perpendicular bisector of (source, image) — Allen &
   Berkley image-source geometry run backwards;
5. wall hypotheses from multiple events/echoes are clustered (normal
   direction + distance) into the final map with per-wall support counts.

TPU shape: steps 1-3 are jitted/batched (autocorrelation rides the same
rFFT economy as GCC; the image solve is a bearing-scan-initialized batched
Gauss-Newton on fixed [M] shapes with presence masks).  Steps 4-5 are
tiny host-side geometry on a handful of numbers per event, like the
tracker's association logic.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import PipelineConfig
from ..ops import echo as echo_ops


# ---------------------------------------------------------------- solves
@functools.partial(jax.jit, static_argnames=("n_angles", "iterations"))
def solve_image_from_ranges(
    mic_xy: jnp.ndarray,  # [M, 2]
    ranges: jnp.ndarray,  # [..., M] meters (mic -> image, 3-D)
    weights: jnp.ndarray,  # [..., M] presence/confidence (0 = ignore mic)
    dz: float = 0.0,  # source-plane height above the mic plane
    *,
    n_angles: int = 72,
    iterations: int = 8,
):
    """Multilaterate a (mirror-image) source from per-mic ranges.

    Minimizes ``sum_k w_k (sqrt(|p - m_k|^2 + dz^2) - d_k)^2`` over the
    in-plane position p.  Init: bearing scan at the weighted mean range
    (ranges give the radius almost directly; the scan resolves the
    direction), then damped Gauss-Newton.  Returns (p [..., 2],
    rms [...] meters, weighted by ``weights``).
    """
    dt = ranges.dtype
    w = weights.astype(dt)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    rbar = jnp.sum(w * ranges, axis=-1, keepdims=True) / wsum  # [..., 1]
    rho = jnp.sqrt(jnp.maximum(rbar * rbar - dz * dz, 1e-6))  # in-plane
    ang = jnp.linspace(0.0, 2.0 * np.pi, n_angles, endpoint=False)
    cand = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # [A, 2]
    p0 = rho[..., None] * cand  # [..., A, 2]

    def cost(p):
        # p: [..., A?, 2] -> scalar per candidate
        d = jnp.sqrt(
            jnp.sum((p[..., None, :] - mic_xy) ** 2, axis=-1) + dz * dz)
        r = d - ranges[..., None, :] if p.ndim > ranges.ndim else d - ranges
        ww = w[..., None, :] if p.ndim > ranges.ndim else w
        return jnp.sum(ww * r * r, axis=-1)

    best = jnp.argmin(cost(p0), axis=-1)  # [...]
    p = jnp.take_along_axis(
        p0, best[..., None, None].repeat(2, axis=-1), axis=-2)[..., 0, :]

    damp = jnp.asarray(1e-6, dt)
    for _ in range(iterations):
        diff = p[..., None, :] - mic_xy  # [..., M, 2]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + dz * dz)  # [..., M]
        r = d - ranges  # [..., M]
        jmat = diff / jnp.maximum(d, 1e-9)[..., None]  # [..., M, 2]
        a = jnp.einsum("...mi,...mj,...m->...ij", jmat, jmat, w)
        g = jnp.einsum("...mi,...m,...m->...i", jmat, w, r)
        a = a + damp * jnp.eye(2, dtype=dt)
        det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
        inv = jnp.stack([
            jnp.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1),
            jnp.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1),
        ], axis=-2) / jnp.maximum(det, 1e-18)[..., None, None]
        p = p - jnp.einsum("...ij,...j->...i", inv, g)

    diff = p[..., None, :] - mic_xy
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + dz * dz)
    rms = jnp.sqrt(
        jnp.sum(w * (d - ranges) ** 2, axis=-1) / wsum[..., 0])
    return p, rms


def wall_from_image(src_xy: np.ndarray, img_xy: np.ndarray):
    """Perpendicular-bisector wall of a (source, mirror image) pair.

    Returns (normal [2] unit, distance float): the wall line is
    ``normal . x = distance``, with the normal pointing from the source
    toward the wall."""
    src = np.asarray(src_xy, np.float64)
    img = np.asarray(img_xy, np.float64)
    v = img - src
    nv = np.linalg.norm(v)
    n = v / max(nv, 1e-12)
    mid = 0.5 * (src + img)
    return n, float(n @ mid)


@dataclasses.dataclass
class WallEstimate:
    """One mapped reflector: the line ``normal . x = distance`` (array
    frame; normal points from the sources toward the wall)."""

    normal: np.ndarray  # [2] unit
    distance: float  # meters from the array origin along the normal
    support: int  # wall hypotheses merged into this estimate
    rms_m: float  # mean image-multilateration residual of its hypotheses


def cluster_walls(
    hypotheses,  # iterable of (normal [2], distance, rms)
    *,
    angle_tol_deg: float = 10.0,
    dist_tol_m: float = 0.3,
    min_support: int = 1,
):
    """Greedy merge of per-event wall hypotheses into wall estimates."""
    cos_tol = np.cos(np.deg2rad(angle_tol_deg))
    clusters = []  # list of [list of (n, d, rms)]
    for n, d, rms in hypotheses:
        placed = False
        for c in clusters:
            n0, d0 = c[0][0], c[0][1]
            if n @ n0 >= cos_tol and abs(d - d0) <= dist_tol_m:
                c.append((n, d, rms))
                placed = True
                break
        if not placed:
            clusters.append([(n, d, rms)])
    walls = []
    for c in clusters:
        if len(c) < min_support:
            continue
        ns = np.stack([h[0] for h in c])
        nbar = ns.mean(axis=0)
        nbar /= max(np.linalg.norm(nbar), 1e-12)
        walls.append(WallEstimate(
            normal=nbar,
            distance=float(np.mean([h[1] for h in c])),
            support=len(c),
            rms_m=float(np.mean([h[2] for h in c])),
        ))
    walls.sort(key=lambda w: -w.support)
    return walls


def _hough_associate(
    cand,  # list of (mic_index, range_3d_m, amp)
    mic_xy: np.ndarray,  # [M, 2]
    dz: float,
    *,
    n_angles: int,
    r_bin: float,
    min_mics: int,
):
    """Group per-mic image-range measurements into image hypotheses.

    Polar Hough accumulator over the image's in-plane (bearing, range):
    a measurement ``r`` from mic k predicts, at bearing theta, center
    range ``R ~ r_ip + u(theta) . m_k`` (first-order far-field; the
    second-order error aperture^2/2R is far below ``r_bin``).  Cells
    where >= ``min_mics`` DISTINCT mics vote become hypotheses; each
    takes, per mic, the candidate nearest its prediction.  Returns a list
    of {mic: range_3d} dicts, strongest cells first.
    """
    if not cand:
        return []
    m = mic_xy.shape[0]
    ang = np.linspace(0.0, 2.0 * np.pi, n_angles, endpoint=False)
    u = np.stack([np.cos(ang), np.sin(ang)], axis=-1)  # [A, 2]
    proj = u @ mic_xy.T  # [A, M]
    r3 = np.array([r for _, r, _ in cand])
    r_ip = np.sqrt(np.maximum(r3 * r3 - dz * dz, 1e-6))  # in-plane range
    mi_idx = np.array([mi for mi, _, _ in cand])
    rp = r_ip[:, None] + proj[:, mi_idx].T  # [C, A] predicted center range
    n_r = int(np.ceil(rp.max() / r_bin)) + 2
    presence = np.zeros((n_angles, n_r, m), bool)
    rb = np.clip(np.round(rp / r_bin).astype(int), 0, n_r - 1)  # [C, A]
    for ci in range(len(cand)):
        presence[np.arange(n_angles), rb[ci], mi_idx[ci]] = True
        # absorb binning edges
        presence[np.arange(n_angles),
                 np.clip(rb[ci] + 1, 0, n_r - 1), mi_idx[ci]] = True
    votes = presence.sum(-1)  # [A, n_r]

    groups = []
    votes_work = votes.copy()
    while True:
        a, rbn = np.unravel_index(np.argmax(votes_work), votes_work.shape)
        if votes_work[a, rbn] < min_mics:
            break
        center_r = rbn * r_bin
        # per-mic nearest candidate to this cell's prediction
        pred = center_r - proj[a]  # [M] expected in-plane range per mic
        per_mic = {}
        for mi in range(m):
            best, err = None, 1.5 * r_bin
            for ci in range(len(cand)):
                if mi_idx[ci] != mi:
                    continue
                e = abs(r_ip[ci] - pred[mi])
                if e < err:
                    best, err = ci, e
            if best is not None:
                per_mic[mi] = float(r3[best])
        if len(per_mic) >= min_mics:
            groups.append(per_mic)
        # suppress the cell neighborhood (wrapping in angle)
        da = max(2, n_angles // 24)
        for aa in range(a - da, a + da + 1):
            votes_work[aa % n_angles,
                       max(0, rbn - 3): rbn + 4] = 0
    return groups


# ---------------------------------------------------------------- mapper
@dataclasses.dataclass(frozen=True)
class ReflectorMapper:
    """End-to-end mapping around an existing :class:`..localizer.Localizer`
    (whose grid/solver configs define the source-plane geometry — use a
    ``projection='plane'`` grid for in-plane scenes).

    >>> mapper = ReflectorMapper(loc)
    >>> result = mapper.map(frames)          # [E, M, N] event frames
    >>> result["walls"][0].distance
    """

    localizer: object
    n_echoes: int = 2
    q_min: int = 40  # min echo lag (samples; excludes the source mainlobe)
    q_max: int = 512  # max echo lag (samples; keep within the clean frame)
    min_separation: int = 16  # NMS window between echoes of one mic
    amp_min: float = 0.05  # min normalized autocorrelation peak amplitude
    # Hough association resolution: image candidates vote in a polar
    # (bearing, range) accumulator — range to mic k of an image at
    # (R, theta) is ~ R - u(theta).m_k to first order, so each per-mic
    # range measurement traces a sinusoid; >= min_mics distinct mics
    # agreeing in one cell is an image hypothesis.  Gap/threshold
    # clustering cannot do this job: two walls' echo ranges overlap
    # whenever the source sits between them.
    hough_angles: int = 72
    hough_r_bin_m: float = 0.1
    min_mics: int = 4  # mics required to multilaterate an image
    band_hz: tuple | None = None  # autocorrelation band (None -> cfg's)

    @property
    def _cfg(self) -> PipelineConfig:
        return self.localizer.pipeline

    def echo_delays(self, frames: jnp.ndarray):
        """Per-mic echo candidates: (delays [..., M, K] samples,
        amps [..., M, K])."""
        prof = echo_ops.echo_profile(frames, self._cfg, band_hz=self.band_hz)
        return echo_ops.top_delays(
            prof, q_min=self.q_min, q_max=self.q_max,
            n_echoes=self.n_echoes, min_separation=self.min_separation)

    def map(self, frames: jnp.ndarray) -> dict:
        """frames [E, M, N] (one detected event each) -> wall map.

        Returns {'walls': [WallEstimate...] (strongest support first),
        'source_xy': [E, 2], 'images': list of per-event image arrays}.
        """
        loc = self.localizer
        out = loc(frames)
        src_xy = np.asarray(out["xy"], np.float64)  # [E, 2]
        delays, amps = self.echo_delays(frames)
        delays = np.asarray(delays, np.float64)  # [E, M, K]
        amps = np.asarray(amps, np.float64)
        mic_xy = np.asarray(loc.params.mic_positions, np.float64)[:, :2]
        cfg = self._cfg
        fs, c = float(cfg.sample_rate_hz), float(cfg.speed_of_sound_mps)
        dz = (0.0 if loc.grid.projection == "plane"
              and loc.grid.height_m == 0.0 else float(loc.grid.height_m))
        e, m, _ = delays.shape

        hypotheses, images = [], []
        for ei in range(e):
            # direct ranges from the localized source
            d_dir = np.sqrt(
                np.sum((src_xy[ei] - mic_xy) ** 2, axis=-1) + dz * dz)
            # gather (mic, image-range) candidates above the amplitude
            # floor and associate them across mics by Hough voting
            cand = [(mi, d_dir[mi] + c * delays[ei, mi, k] / fs,
                     amps[ei, mi, k])
                    for mi in range(m) for k in range(delays.shape[-1])
                    if amps[ei, mi, k] >= self.amp_min]
            groups = _hough_associate(
                cand, mic_xy, dz,
                n_angles=self.hough_angles, r_bin=self.hough_r_bin_m,
                min_mics=self.min_mics)
            ev_images = []
            for per_mic in groups:
                w = np.zeros(m)
                rng = np.zeros(m)
                for mi, rg in per_mic.items():
                    w[mi] = 1.0
                    rng[mi] = rg
                img, rms = solve_image_from_ranges(
                    jnp.asarray(mic_xy, jnp.float32),
                    jnp.asarray(rng, jnp.float32),
                    jnp.asarray(w, jnp.float32), dz)
                img = np.asarray(img, np.float64)
                rms = float(rms)
                nvec, dist = wall_from_image(src_xy[ei], img)
                hypotheses.append((nvec, dist, rms))
                ev_images.append(img)
            images.append(np.asarray(ev_images).reshape(-1, 2))
        walls = cluster_walls(hypotheses)
        return {"walls": walls, "source_xy": src_xy, "images": images}
