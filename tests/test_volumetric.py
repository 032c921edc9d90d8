"""3-D volumetric SRP localization over a z-stack of plane grids."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.volumetric import VolumetricLocalizer
from audio_triangulation_tpu.utils import synth

# a planar array cannot resolve the z sign; use sources above the array and
# heights strictly > 0.  Range observability needs aperture: 0.5 m radius.
MICS8 = geometry.circular_array(8, 0.5)


def test_recovers_xyz():
    heights = (0.4, 0.6, 0.8, 1.0, 1.2)
    # plain GCC: on clean additive-noise scenes its sub-sample TDOAs are
    # ~100x tighter than PHAT's (see BENCH_ACCURACY.json), which the weakly
    # observable range direction needs
    vl = VolumetricLocalizer.create(MICS8, heights, PipelineConfig())
    sources = np.array([
        [0.3, 0.2, 0.6],
        [-0.3, 0.4, 1.0],
        [0.5, -0.3, 0.8],
    ])
    frames = synth.synth_scene(sources, MICS8, noise_rms=0.01, seed=61)
    out = vl(jnp.asarray(frames, jnp.float32))
    xyz = np.asarray(out["xyz"])
    for i, s in enumerate(sources):
        # the free-xyz GN refinement resolves the coarse grid to cm level
        assert np.linalg.norm(xyz[i] - s) < 0.05, (i, xyz[i], s)


def test_z_refinement_resolves_range_ambiguity():
    """Integer-lag SRP grids are nearly flat along the source ray (range is
    weakly observable from rounded lags), so the coarse z argmax can land a
    plane off — the free-xyz GN refinement from sub-sample TDOAs is what
    pins the height."""
    heights = (0.4, 0.8, 1.2)
    vl = VolumetricLocalizer.create(MICS8, heights, PipelineConfig())
    src = np.array([[0.2, 0.4, 0.8]])
    frames = synth.synth_scene(src, MICS8, noise_rms=0.0, seed=62)
    out = vl(jnp.asarray(frames, jnp.float32))
    # coarse argmax: within one plane of truth
    assert abs(int(out["z_index"][0]) - 1) <= 1
    # refined: centimeter-level height
    assert abs(float(out["xyz"][0, 2]) - 0.8) < 0.05
