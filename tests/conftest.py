"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware and must exercise multi-device sharding;
``xla_force_host_platform_device_count=8`` is the standard stand-in for a pod
(SURVEY.md §4).  jax is pre-imported by the environment's sitecustomize, so
configuration goes through ``jax.config.update`` (env vars would be too late);
XLA_FLAGS still works because backends initialize lazily.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
# The bit-exact validation path accumulates in int64 (the reference's power_t,
# constants.h:6); the float hot path pins float32 explicitly throughout.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite builds many near-identical
# Localizers across files, and XLA compile time dominates the wall clock
# (measured: test_uncertainty.py 34 s cold -> 14 s warm).  The cache key
# includes the HLO and jax/XLA versions, so entries can't go stale across
# code changes.  Override the location with JAX_COMPILATION_CACHE_DIR;
# set it empty to disable.
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/atrt-jax-test-cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # export for SUBPROCESS tests (examples, CLI, serving): without the
    # env var their fresh interpreters recompile everything on every
    # suite run — the examples driver alone cost ~90 s per run warm
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)

# Measured and NOT adopted: jax_optimization_level='O1' and
# jax_exec_time_optimization_effort=-1.0 were both timing-neutral on the
# CPU backend for a compile-heavy 22-test subset (90/95/93 s) — the CPU
# compiler ignores the effort dial, so the suite keeps XLA defaults.
# Share Localizer/StreamingLocalizer/TrackedStreamingLocalizer instances
# across tests (models/localizer._memo_create): identical configs return
# the same frozen instance, so the per-instance cached_property jits — and
# their traces — are built once per session instead of once per file.
# Opt-out by exporting ATRT_SHARE_LOCALIZERS= (empty).
os.environ.setdefault("ATRT_SHARE_LOCALIZERS", "1")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ----------------------------------------------------------------------
# slow markers (central list): `pytest -m "not slow"` is the smoke
# profile — it must still cover every dispatch path (golden ops, fused/
# unfused/int, streaming, solver, one sharding test, viz, CLI, native
# ring), so only tests whose PATH is covered by a faster sibling are
# listed here.  Durations from a cold 1-CPU run; tune as the suite moves.
# ----------------------------------------------------------------------

_SLOW = {
    "test_neural.py": {
        "test_training_converges_to_decimeter_accuracy",
        "test_room_trained_net_beats_physics_in_reverb",
        "test_data_parallel_training_matches_single_device",
    },
    "test_large_array.py": {
        "test_config5_grid_parallel", "test_config5_localizes",
    },
    "test_multisource.py": {
        "test_streaming_multisource_feeds_jpda_tracker",
        "test_moving_sources_exact_jpda_e2e",
        "test_streaming_multisource_outputs",
    },
    "test_examples.py": {
        "test_advanced_example", "test_robustness_example",
        "test_serving_http_example", "test_production_example",
        "test_quickstart_example",
    },
    "test_sharded_streaming.py": {
        "test_sharded_stream_step_matches_vmapped",
        "test_sharded_stream_events_localized",
        "test_sharded_stream_step_solve_velocity_threads_resample",
    },
    "test_srp_freq.py": {
        "test_mvdr_sharper_than_srp",
        "test_freq_srp_agrees_with_lag_srp_argmax",
        "test_freq_srp_resolves_range_better_than_lag",
        "test_music_sharper_than_mvdr",
    },
    "test_sharding.py": {"test_unsupervised_em_calibration_8mic"},
    "test_fusion.py": {"test_fusion_spmd_matches_single_device"},
    "test_uncertainty.py": {
        "test_streaming_emits_xy_cov",
        "test_step_multi_heterogeneous_covs_weight_measurements",
    },
    "test_tworate.py": {"test_tworate_matches_dense_states"},
    "test_spmd.py": {"test_spmd_pair_sharded_large_array"},
    "test_cli.py": {
        "test_stream_checkpoint_resume", "test_stream_refresh_hz_free_runs",
        "test_stream_track_flag",
    },
    "test_multi_event.py": {
        "test_streaming_solver_in_batched_streams",
        "test_multi_event_matches_sequential_chunks",
    },
    "test_calibration_tracked.py": {
        "test_fit_tracked_improves_geometry_8mic",
    },
    "test_consistency.py": {"test_streaming_emits_health_metrics"},
    "test_serving.py": {"test_export_symbolic_batch_any_size"},
    "test_eval_dataset.py": {
        "test_detection_rate_floor", "test_median_error_floor",
        "test_per_condition_floors",
    },
    # r5 additions (cold durations: 27.4 / 23.6 / 24.4 s) — each path has
    # a faster sibling in the mid profile (test_jpda_second_event_slot_
    # feeds_tracker, test_no_event_outputs_equal_carried_state,
    # test_dead_channel_recovered)
    "test_tracked_streaming.py": {
        "test_jpda_fused_tracks_two_sources",
        "test_fused_matches_two_dispatch_composition",
    },
    "test_health_weighting.py": {"test_healthy_array_unaffected"},
}


def pytest_terminal_summary(terminalreporter):
    """Report localizer instance-sharing effectiveness (opt-in probe)."""
    if not os.environ.get("ATRT_SHARE_DEBUG"):
        return
    try:
        from audio_triangulation_tpu.models.localizer import _CREATE_STATS
        terminalreporter.write_line(
            f"localizer share: {_CREATE_STATS['hits']} hits / "
            f"{_CREATE_STATS['misses']} misses")
    except Exception:
        pass


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        name = item.name.split("[")[0]
        if name in _SLOW.get(fname, ()):
            item.add_marker(pytest.mark.slow)


# ----------------------------------------------------------------------
# mmap-exhaustion guard: every compiled XLA:CPU executable (and its zstd
# cache buffers) adds memory mappings; a full-suite process accumulates
# ~60k mappings, crossing vm.max_map_count (65,530 default) near the end
# of the run — at which point the NEXT mmap fails inside native code and
# the process segfaults in compile/serialize (diagnosed r5: three
#"random" suite crashes around test_uncertainty, maps sampler showed
# ~2k new mappings per 30 s).  When the count nears the ceiling, drop
# the in-process executable caches; the persistent disk cache makes the
# recompiles cheap deserializations.
# ----------------------------------------------------------------------

_MAPS_GUARD = {"every": 20, "count": 0, "limit": 45_000, "cleared": 0}


def pytest_runtest_setup(item):
    g = _MAPS_GUARD
    g["count"] += 1
    if g["count"] % g["every"]:
        return
    try:
        with open("/proc/self/maps", "rb") as f:
            n_maps = sum(1 for _ in f)
    except OSError:
        return
    if n_maps > g["limit"]:
        import gc

        jax.clear_caches()
        gc.collect()
        g["cleared"] += 1


@pytest.fixture()
def rng(request):
    """Per-test deterministic RNG: seeds derive from the test name, so tests
    are order-independent (a session-scoped stream would make every test's
    draws depend on which tests ran before it)."""
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode()) & 0xFFFFFFFF
    return np.random.default_rng(seed)
