"""Serving/export: portable StableHLO artifacts, AOT compile, disk cache."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.utils import serving, synth

MICS = geometry.square_array(0.3)


def _frames(b=4, seed=0):
    src = np.array([0.5, 0.4, 1.2]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    f = synth.synth_scene(src, MICS, noise_rms=0.01, seed=seed)
    return jnp.asarray(np.broadcast_to(f, (b, 4, 1024)).copy(), jnp.float32)


def test_export_roundtrip_matches_direct(tmp_path):
    loc = Localizer.create(MICS, PipelineConfig(phat=True))
    path = str(tmp_path / "loc.stablehlo")
    blob = serving.export_localizer(loc, path)
    assert len(blob) > 1000

    fn = serving.load_exported(path)
    frames = _frames(4)
    got = fn(frames)
    want = loc(frames)
    np.testing.assert_allclose(
        np.asarray(got["xy"]), np.asarray(want["xy"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["tdoa_samples"]), np.asarray(want["tdoa_samples"]),
        atol=1e-4)


def test_export_symbolic_batch_any_size():
    loc = Localizer.create(MICS)
    blob = serving.export_localizer(loc)
    fn = serving.load_exported(blob)
    for b in (1, 3, 8):
        out = fn(_frames(b, seed=b))
        assert out["xy"].shape == (b, 2)


def test_aot_compile_runs_and_reports_cost():
    loc = Localizer.create(MICS)
    compiled = serving.aot_compile(loc, batch=2)
    out = compiled(loc.params, _frames(2))
    assert out["xy"].shape == (2, 2)
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    assert cost.get("flops", 0) > 1e6  # the pipeline is matmul-heavy


def test_compilation_cache_persists(tmp_path):
    import os

    cache = str(tmp_path / "xla_cache")
    serving.enable_compilation_cache(cache)
    try:
        # a config no other test compiles: an identical program compiled
        # earlier in this process (under the suite-wide cache conftest.py
        # enables) would be served from jax's in-memory layer and never
        # written to THIS directory
        loc = Localizer.create(
            MICS, PipelineConfig(taper_denom=37.0, phat_eps=3e-7))
        loc(_frames(2))  # populate
        entries = []
        for root, _, files in os.walk(cache):
            entries += files
        assert entries, "compilation cache wrote no entries"
    finally:
        # restore the SUITE-WIDE cache conftest.py configured (None would
        # silently disable caching for every test after this one in the
        # same process — and enable_compilation_cache pinned min compile
        # time to 0, so restore that threshold too)
        suite_cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/atrt-jax-test-cache")
        serving.enable_compilation_cache(suite_cache)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5)
