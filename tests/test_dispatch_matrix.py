"""Every localizer dispatch combination (fused x solver x heatmap x window)
produces consistent, finite results.

Round-1 regression coverage: the fully-fused branch with ``with_solver=False``
raised NameError (localizer.py evaluated ``corr.dtype`` which is only bound on
the unfused branch), and ``window_enabled=False`` was silently ignored by the
fused kernel.  ``fused_kernel='on'`` off-TPU runs the Pallas kernels in
interpret mode, so CPU CI covers the TPU dispatch paths.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.utils import synth

pytestmark = pytest.mark.smoke  # dispatch-path matrix



def _frames(mics, b=16, n=256, seed=0):
    src = np.array([0.4, 0.3, 1.2])
    src = src * (1.2 / np.linalg.norm(src))
    frame = synth.synth_scene(src, mics, n=n, noise_rms=0.01, seed=seed)
    return jnp.asarray(np.broadcast_to(frame, (b, mics.shape[0], n)).copy(),
                       jnp.float32)


@pytest.fixture(scope="module")
def scene():
    mics = geometry.square_array(0.3)
    return mics, _frames(mics)


@pytest.mark.parametrize("fused", ["on", "off"])
@pytest.mark.parametrize("with_solver", [True, False])
@pytest.mark.parametrize("with_heatmap", [True, False])
def test_dispatch_matrix(scene, fused, with_solver, with_heatmap):
    mics, frames = scene
    cfg = PipelineConfig(frame_size_bits=8, max_shift_samples=16, phat=True,
                         fused_kernel=fused, fused_tile_b=8)
    loc = Localizer.create(mics, cfg, with_solver=with_solver,
                           with_heatmap=with_heatmap)
    out = loc(frames)
    assert out["xy"].shape == (frames.shape[0], 2)
    assert np.all(np.isfinite(np.asarray(out["xy"])))
    assert np.all(np.isfinite(np.asarray(out["rms_m"])))
    assert out["tdoa_samples"].shape == (frames.shape[0], 6)
    if with_heatmap:
        assert out["heat_levels"].shape[0] == frames.shape[0]


@pytest.mark.parametrize("with_solver", [True, False])
def test_fused_matches_unfused_end_to_end(scene, with_solver):
    mics, frames = scene
    kw = dict(frame_size_bits=8, max_shift_samples=16, phat=True,
              fused_tile_b=8)
    out_f = Localizer.create(
        mics, PipelineConfig(fused_kernel="on", **kw),
        with_solver=with_solver)(frames)
    out_u = Localizer.create(
        mics, PipelineConfig(fused_kernel="off", **kw),
        with_solver=with_solver)(frames)
    np.testing.assert_array_equal(np.asarray(out_f["best_shift"]),
                                  np.asarray(out_u["best_shift"]))
    np.testing.assert_allclose(np.asarray(out_f["tdoa_samples"]),
                               np.asarray(out_u["tdoa_samples"]),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_f["xy"]),
                               np.asarray(out_u["xy"]), atol=2e-2)


def test_window_disabled_honored_by_fused_kernel(scene):
    """window_enabled=False must flow into the fused kernel (round-1 bug:
    the kernel multiplied by the DPSS window unconditionally)."""
    mics, frames = scene
    kw = dict(frame_size_bits=8, max_shift_samples=16, window_enabled=False,
              fused_tile_b=8)
    out_f = Localizer.create(
        mics, PipelineConfig(fused_kernel="on", **kw))(frames)
    out_u = Localizer.create(
        mics, PipelineConfig(fused_kernel="off", **kw))(frames)
    corr_f = np.asarray(out_f["correlograms"])
    corr_u = np.asarray(out_u["correlograms"])
    scale = np.abs(corr_u).max()
    np.testing.assert_allclose(corr_f / scale, corr_u / scale, atol=1e-4)


def test_nan_guard_on_fused_paths(scene):
    """nan_guard scrubs non-finite samples on the fused dispatches too."""
    mics, frames = scene
    bad = np.asarray(frames).copy()
    bad[0, 0, 10] = np.nan
    bad[1, 2, 20] = np.inf
    bad = jnp.asarray(bad)
    cfg = PipelineConfig(frame_size_bits=8, max_shift_samples=16,
                         fused_kernel="on", fused_tile_b=8, nan_guard=True)
    for with_solver in (True, False):
        out = Localizer.create(mics, cfg, with_solver=with_solver)(bad)
        assert np.all(np.isfinite(np.asarray(out["xy"])))
        assert np.all(np.isfinite(np.asarray(out["correlograms"])))


def test_strided_window_mode(scene):
    """window_mode='strided' strides the 1024-entry table (buffer.c:8) and
    still localizes; at frame_size=1024 it equals the direct window."""
    from audio_triangulation_tpu.ops import window as window_ops

    mics, frames = scene
    cfg = PipelineConfig(frame_size_bits=8, max_shift_samples=16,
                         window_mode="strided")
    w_strided = window_ops.window_for(cfg)
    assert w_strided.shape == (256,)
    table = window_ops.dpss_window(1024)
    np.testing.assert_array_equal(w_strided, table[::4])
    # differs from the direct window (the round-1 semantics note)
    w_direct = window_ops.dpss_window(256)
    assert np.abs(w_strided - w_direct).max() > 1e-3

    out = Localizer.create(mics, cfg)(frames)
    assert np.all(np.isfinite(np.asarray(out["xy"])))

    cfg_full = PipelineConfig(window_mode="strided")
    np.testing.assert_array_equal(window_ops.window_for(cfg_full),
                                  window_ops.dpss_window(1024))
