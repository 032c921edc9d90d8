"""Microphone-array geometry.

Re-implements (and generalizes to N mics) the reference's geometry layer:

- 3-mic triangle from pairwise distances via the law of cosines, centroid
  centering, optional Y-mirror and rotate-A-to-+X
  (reference ``src/components/microphones.c:9-61``)
- pair enumeration (the reference hard-codes AB/AC/BC,
  ``src/sample_compute.h:120-122``)
- per-grid-cell expected TDOA lags for SRP scoring
  (reference ``src/components/vga/vga_heatmap.h:48-93``)

Everything here is NumPy at setup time (runs once, feeds constants into jitted
functions); nothing is traced.
"""

from __future__ import annotations

import numpy as np

from .config import GridConfig, PipelineConfig, VolumeConfig


# ----------------------------------------------------------------------
# Array construction
# ----------------------------------------------------------------------

def triangle_from_distances(
    d_ab: float,
    d_bc: float,
    d_ca: float,
    *,
    mirror: bool = True,
    rotate: bool = False,
    dtype=np.float32,
) -> np.ndarray:
    """3-mic positions [3, 2] from pairwise distances.

    Mirrors ``microphones_init`` (microphones.c:9-61): law of cosines places
    C', the triangle is centroid-centered, optionally Y-mirrored (before
    centering, as in the reference) and rotated so mic A lies on +X.
    """
    d_ab = dtype(d_ab)
    d_bc = dtype(d_bc)
    d_ca = dtype(d_ca)

    x_c = (d_ab * d_ab + d_ca * d_ca - d_bc * d_bc) / (dtype(2.0) * d_ab)
    y_c = np.sqrt(np.maximum(dtype(0.0), d_ca * d_ca - x_c * x_c))
    if mirror:
        y_c = -y_c

    pts = np.array(
        [[0.0, 0.0], [d_ab, 0.0], [x_c, y_c]], dtype=dtype
    )
    pts = pts - pts.mean(axis=0, dtype=dtype)

    if rotate:
        theta = np.arctan2(pts[0, 1], pts[0, 0])
        c, s = np.cos(-theta, dtype=dtype), np.sin(-theta, dtype=dtype)
        rot = np.array([[c, -s], [s, c]], dtype=dtype)
        pts = pts @ rot.T

    return pts.astype(dtype)


def circular_array(n_mics: int, radius_m: float, *, phase_deg: float = 0.0,
                   dtype=np.float32) -> np.ndarray:
    """Uniform circular array [n, 2] (for the 8-mic SRP-PHAT config)."""
    ang = np.deg2rad(phase_deg) + 2 * np.pi * np.arange(n_mics) / n_mics
    return np.stack([radius_m * np.cos(ang), radius_m * np.sin(ang)],
                    axis=-1).astype(dtype)


def square_array(side_m: float, *, dtype=np.float32) -> np.ndarray:
    """4-mic square array [4, 2] centered at origin (baseline config 3)."""
    h = side_m / 2.0
    return np.array(
        [[-h, -h], [h, -h], [h, h], [-h, h]], dtype=dtype
    )


def grid_array(nx: int, ny: int, pitch_m: float, *, dtype=np.float32) -> np.ndarray:
    """nx x ny rectangular grid array (for the 64-mic config)."""
    xs = (np.arange(nx) - (nx - 1) / 2.0) * pitch_m
    ys = (np.arange(ny) - (ny - 1) / 2.0) * pitch_m
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    return np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(dtype)


def tetrahedral_array(radius_m: float, *, dtype=np.float32) -> np.ndarray:
    """Regular-tetrahedron array [4, 3] with vertices ``radius_m`` from the
    centroid — the minimal NON-COPLANAR array.  Planar arrays cannot
    resolve elevation sign and have poor z sensitivity near their plane;
    volumetric localization (VolumeConfig / VolumeLocalizer) wants z
    diversity in the array itself."""
    v = np.array([[1.0, 1.0, 1.0], [1.0, -1.0, -1.0],
                  [-1.0, 1.0, -1.0], [-1.0, -1.0, 1.0]])
    return (v / np.sqrt(3.0) * radius_m).astype(dtype)


def reference_array(dtype=np.float32) -> np.ndarray:
    """The exact mic layout the reference firmware computes at boot."""
    from .config import REFERENCE_DISTANCES, REFERENCE_MIRROR, REFERENCE_ROTATE

    d_ab, d_bc, d_ca = REFERENCE_DISTANCES
    return triangle_from_distances(
        d_ab, d_bc, d_ca, mirror=REFERENCE_MIRROR, rotate=REFERENCE_ROTATE,
        dtype=dtype,
    )


# ----------------------------------------------------------------------
# Pairs
# ----------------------------------------------------------------------

def mic_pairs(n_mics: int) -> np.ndarray:
    """All unordered pairs [(i, j) with i < j] as an int32 array [P, 2].

    For 3 mics this yields (0,1), (0,2), (1,2) == the reference's AB, AC, BC
    ordering (sample_compute.h:120-122).
    """
    idx = [(i, j) for i in range(n_mics) for j in range(i + 1, n_mics)]
    return np.asarray(idx, dtype=np.int32)


def pair_distances(positions: np.ndarray, pairs: np.ndarray) -> np.ndarray:
    """Euclidean distance per pair [P]."""
    d = positions[pairs[:, 1]] - positions[pairs[:, 0]]
    return np.linalg.norm(d, axis=-1)


def max_lag_for_array(positions: np.ndarray, pipeline: PipelineConfig,
                      margin: int = 1) -> int:
    """Smallest lag window covering the array aperture (new capability; the
    reference hard-codes +-46 via constants.h:12)."""
    pairs = mic_pairs(positions.shape[0])
    aperture = float(pair_distances(positions, pairs).max())
    return int(np.ceil(aperture / pipeline.speed_of_sound_mps
                       * pipeline.sample_rate_hz)) + margin


# ----------------------------------------------------------------------
# SRP grid geometry
# ----------------------------------------------------------------------

def grid_points(grid: GridConfig, dtype=np.float32) -> np.ndarray:
    """Candidate source points [H, W, 3] in meters.

    Cell (y, x) maps to plane coordinates exactly as vga_init_heatmap does
    (vga_heatmap.h:52-60): x_m = (x - half_w) / cells_per_m,
    y_m = (half_h - y) / cells_per_m, z = height; then (reference behavior)
    the point is scaled onto the sphere of radius ``height_m`` so every
    candidate is equidistant from the array center.
    """
    xs = (np.arange(grid.width, dtype=dtype) - grid.half_cells_x) / dtype(grid.cells_per_m)
    ys = (grid.half_cells_y - np.arange(grid.height, dtype=dtype)) / dtype(grid.cells_per_m)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")  # [H, W]
    gz = np.full_like(gx, dtype(grid.height_m))
    pts = np.stack([gx, gy, gz], axis=-1)  # [H, W, 3]

    if grid.projection == "sphere":
        r = np.sqrt((pts * pts).sum(-1, keepdims=True, dtype=dtype))
        pts = pts * (dtype(grid.height_m) / r)
    return pts.astype(dtype)


def expected_tdoas(
    points: np.ndarray,
    positions: np.ndarray,
    pairs: np.ndarray,
    speed_of_sound: float,
) -> np.ndarray:
    """Expected TDOA in seconds for each (point, pair): (d_j - d_i) / c.

    points: [..., 3]; positions: [M, 2 or 3] (z assumed 0 if 2-D).
    Returns [..., P].  Sign convention matches the reference
    (vga_heatmap.h:68-70): positive when the second mic of the pair is
    farther from the source.
    """
    pos3 = np.zeros((positions.shape[0], 3), dtype=points.dtype)
    pos3[:, : positions.shape[1]] = positions
    # [..., M] distances
    diff = points[..., None, :] - pos3  # [..., M, 3]
    dists = np.sqrt((diff * diff).sum(-1))
    dt = dists[..., pairs[:, 1]] - dists[..., pairs[:, 0]]
    return (dt / points.dtype.type(speed_of_sound)).astype(points.dtype)


def lag_lut(
    grid: GridConfig,
    positions: np.ndarray,
    pairs: np.ndarray,
    pipeline: PipelineConfig,
) -> np.ndarray:
    """Integer lag-index lookup table [P, H, W] for SRP scoring.

    Port of the precompute in vga_init_heatmap (vga_heatmap.h:48-93): expected
    TDOA -> round to integer sample shift (half away from zero, matching C
    ``roundf``) -> clamp to +-max_shift -> offset by +max_shift so the value
    indexes a [num_lags] correlogram.
    """
    pts = grid_points(grid)  # [H, W, 3]
    dt = expected_tdoas(pts, positions, pairs, pipeline.speed_of_sound_mps)
    v = dt * np.float32(pipeline.sample_rate_hz)
    # round half away from zero, matching C roundf (vga_heatmap.h:72-74)
    shifts = np.trunc(v + np.copysign(np.float32(0.5), v)).astype(np.int32)
    k = pipeline.max_shift
    shifts = np.clip(shifts, -k, k)
    return np.transpose(shifts + k, (2, 0, 1)).astype(np.int32)  # [P, H, W]


def volume_points(vol: VolumeConfig, dtype=np.float32) -> np.ndarray:
    """Candidate source points [D, H, W, 3] for the volumetric grid.

    x/y follow the same cell->meters mapping as :func:`grid_points`
    (vga_heatmap.h:52-60); z sweeps [z_min_m, z_max_m] in ``z_cells``
    steps — a true 3-D search box, no sphere/plane projection."""
    xs = (np.arange(vol.width, dtype=dtype)
          - vol.half_cells_x) / dtype(vol.cells_per_m)
    ys = (vol.half_cells_y
          - np.arange(vol.height, dtype=dtype)) / dtype(vol.cells_per_m)
    zs = (np.float64(vol.z_min_m)
          + np.arange(vol.depth, dtype=np.float64) * vol.z_step_m)
    gz, gy, gx = np.meshgrid(zs.astype(dtype), ys, xs, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).astype(dtype)  # [D, H, W, 3]


def volume_lag_lut(
    vol: VolumeConfig,
    positions: np.ndarray,
    pairs: np.ndarray,
    pipeline: PipelineConfig,
) -> np.ndarray:
    """Integer lag-index LUT [P, D, H, W] for volumetric SRP scoring —
    :func:`lag_lut` generalized to the 3-D box (same roundf/clamp/offset
    semantics as the reference's vga_heatmap.h:48-93 precompute)."""
    pts = volume_points(vol)  # [D, H, W, 3]
    dt = expected_tdoas(pts, positions, pairs, pipeline.speed_of_sound_mps)
    v = dt * np.float32(pipeline.sample_rate_hz)
    shifts = np.trunc(v + np.copysign(np.float32(0.5), v)).astype(np.int32)
    k = pipeline.max_shift
    shifts = np.clip(shifts, -k, k)
    return np.transpose(shifts + k, (3, 0, 1, 2)).astype(np.int32)


def lag_onehot(lut: np.ndarray, num_lags: int, dtype=np.float32) -> np.ndarray:
    """One-hot steering matrix [P * num_lags, G] for matmul-form SRP.

    SRP scoring (a gather per cell in the reference, vga_heatmap.h:99-108)
    becomes a single MXU matmul: scores[B, G] = corr[B, P*L] @ onehot[P*L, G].
    """
    p, h, w = lut.shape
    g = h * w
    flat = lut.reshape(p, g)  # [P, G] lag index per cell
    out = np.zeros((p, num_lags, g), dtype=dtype)
    pp = np.repeat(np.arange(p), g)
    ll = flat.ravel()
    gg = np.tile(np.arange(g), p)
    out[pp, ll, gg] = 1.0
    return out.reshape(p * num_lags, g)
