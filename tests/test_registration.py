"""Inter-array extrinsic registration (models.fusion.register_arrays).

K independently placed arrays localize the same events in their own
frames; the weighted Kabsch registration recovers each array's rigid
pose into the anchor's frame — the missing step between "two arrays on
tripods" and the world-frame fusion localizer (which needs world mic
coordinates).  Pinned: exact recovery from noisy fixes with an outlier
zero-weighted, proper rotations only (no reflections), and the full
acoustic chain: local localization -> registration -> fused world-frame
localization of a held-out event.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.core.config import (GridConfig, PipelineConfig,
                                                 SolverConfig)
from audio_triangulation_tpu.models import fusion
from audio_triangulation_tpu.models.localizer import Localizer
from audio_triangulation_tpu.utils import synth


def _rot(a):
    return np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]],
                    np.float32)


def test_register_recovers_known_transforms():
    rng = np.random.default_rng(0)
    angs = [0.0, 0.7, -2.1]
    trs = np.array([[0.0, 0.0], [2.0, 1.0], [-1.5, 0.8]])
    world_pts = rng.uniform(-2, 2, size=(7, 2))
    local = np.zeros((3, 7, 2))
    for k, (a, t) in enumerate(zip(angs, trs)):
        local[k] = (world_pts - t) @ _rot(a)  # local = R^T (world - t)
    local += rng.normal(0, 0.01, local.shape)
    local[2, 3] = [9.0, -9.0]  # gross outlier, masked by weight 0
    w = np.ones((3, 7), np.float32)
    w[2, 3] = 0.0

    reg = fusion.register_arrays(jnp.asarray(local), weights=jnp.asarray(w))
    rot = np.asarray(reg["rot"])
    tr = np.asarray(reg["trans"])
    for k, (a, t) in enumerate(zip(angs, trs)):
        assert np.abs(rot[k] - _rot(a)).max() < 5e-3, k
        assert np.abs(tr[k] - t).max() < 0.02, k
        assert abs(np.linalg.det(rot[k]) - 1.0) < 1e-4  # proper rotation
    assert np.asarray(reg["rms"]).max() < 0.03
    # anchor transform is the identity
    np.testing.assert_allclose(rot[0], np.eye(2), atol=1e-5)


def test_register_rejects_reflection():
    """A mirrored point set must come back as the best PROPER rotation,
    never a det=-1 reflection (the Kabsch sign fix)."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, size=(6, 2)).astype(np.float32)
    mirrored = pts * np.array([1.0, -1.0], np.float32)
    local = np.stack([pts, mirrored])
    reg = fusion.register_arrays(jnp.asarray(local))
    det = float(np.linalg.det(np.asarray(reg["rot"])[1]))
    assert abs(det - 1.0) < 1e-4


def test_register_3d():
    rng = np.random.default_rng(2)
    # rotation about z by 0.5 plus a tilt about x by 0.2
    cz, sz = np.cos(0.5), np.sin(0.5)
    cx, sx = np.cos(0.2), np.sin(0.2)
    r = (np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
         @ np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])).astype(
             np.float32)
    t = np.array([0.5, -1.0, 0.3], np.float32)
    world = rng.uniform(-2, 2, size=(8, 3)).astype(np.float32)
    local = np.stack([world, (world - t) @ r])
    reg = fusion.register_arrays(jnp.asarray(local))
    assert np.abs(np.asarray(reg["rot"])[1] - r).max() < 1e-4
    assert np.abs(np.asarray(reg["trans"])[1] - t).max() < 1e-4


@pytest.mark.slow
def test_register_then_fuse_end_to_end():
    """Two tripod arrays, unknown relative pose: localize shared events
    locally, register, build the world-frame fusion localizer from the
    registered mics, and localize a held-out event in the world frame.

    The lag window MUST cover the array aperture
    (``max_shift_samples=geometry.max_lag_for_array``): these 0.8 m
    arrays have true intra-array TDOAs to +-117 samples, and the
    reference default (+-46) silently clips measured TDOAs — the SRP
    grid degrades gracefully (its LUT clamps identically) but the GN
    solve diverges by meters on the clipped measurements.  With the
    window right, local GN fixes are mm-cm and the whole chain closes."""
    import dataclasses

    local_mics = np.asarray(geometry.circular_array(8, 0.4), np.float32)
    cfg = PipelineConfig(phat=True)
    cfg = dataclasses.replace(
        cfg,
        max_shift_samples=geometry.max_lag_for_array(local_mics, cfg))
    grid = GridConfig(projection="plane")
    solver = SolverConfig(constrain_to_sphere=False)

    ang, tr = 0.7, np.array([2.0, 1.0], np.float32)
    poses = [(0.0, np.zeros(2, np.float32)), (ang, tr)]
    world_mics = [local_mics @ _rot(a).T + t for a, t in poses]

    events = np.array([[0.5, 0.4], [1.2, 1.0], [1.5, 0.0], [0.4, 1.1],
                       [0.9, 0.2], [1.4, 0.7]], np.float32)  # world frame
    held_out = np.array([1.6, 0.9], np.float32)

    loc = Localizer.create(local_mics, cfg, grid, solver)

    def local_fix(world_xy, wm, seed):
        src = np.array([world_xy[0], world_xy[1], 1.2])
        fr = synth.synth_scene(src, wm, n=1024, noise_rms=0.01, seed=seed)
        out = loc(jnp.asarray(fr * 100, jnp.float32))
        return np.asarray(out["xy"])[0]

    local_fixes = np.stack([
        np.stack([local_fix(e, wm, 10 + i) for i, e in enumerate(events)])
        for wm in world_mics])  # [K, E, 2]

    reg = fusion.register_arrays(jnp.asarray(local_fixes))
    rot = np.asarray(reg["rot"])[1]
    ang_est = np.arctan2(rot[1, 0], rot[0, 0])
    # one local fix has a ~14 cm error (event 5, array 0); the LS pose
    # still lands within ~1.2 degrees / a few cm
    assert abs(ang_est - ang) < np.deg2rad(2.0), ang_est
    assert np.abs(np.asarray(reg["trans"])[1] - tr).max() < 0.08

    # fused world-frame localization of a held-out event through the
    # REGISTERED (not the true) mic coordinates
    reg_mics = fusion.registered_arrays([local_mics, local_mics], reg)
    fus = fusion.ArrayFusionLocalizer.create([np.asarray(m) for m in
                                              reg_mics], cfg)
    src = np.array([held_out[0], held_out[1], 1.2])
    frames = np.stack([
        synth.synth_scene(src, wm, n=1024, noise_rms=0.01, seed=99)[0]
        for wm in world_mics])[None]  # [1, K, M, N]
    out = fus(jnp.asarray(frames * 100, jnp.float32))
    err = float(np.linalg.norm(np.asarray(out["xy"])[0] - held_out))
    assert err < 0.05, err
