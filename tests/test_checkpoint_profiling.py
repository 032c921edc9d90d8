"""Checkpoint round-trips for all stateful pytrees; profiling utilities."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.streaming import StreamingLocalizer
from audio_triangulation_tpu.models import calibration
from audio_triangulation_tpu.utils import checkpoint, profiling

MICS = geometry.reference_array()


def _assert_trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_stream_state_roundtrip(tmp_path):
    sl = StreamingLocalizer.create(MICS)
    state = sl.init_state()
    state = state.__class__(
        **{**state.__dict__,
           "ema_corr": state.ema_corr + 3.25,
           "event_count": state.event_count + 7})
    p = checkpoint.save(str(tmp_path / "stream"), state, use_orbax=False)
    restored = checkpoint.restore(p, sl.init_state())
    _assert_trees_equal(state, restored)
    # restored state continues streaming
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(rng.integers(127, 130, size=(3, 256)), jnp.float32)
    new_state, out = sl(restored, chunk)
    assert int(new_state.event_count) == 7


def test_calibration_roundtrip(tmp_path):
    calib = calibration.Calibrator.create(3)
    params, opt_state = calib.init(MICS)
    p = checkpoint.save(str(tmp_path / "calib"), (params, opt_state),
                        use_orbax=False)
    params2, opt2 = checkpoint.restore(p, calib.init(MICS))
    _assert_trees_equal(params, params2)
    _assert_trees_equal(opt_state, opt2)


def test_orbax_available_and_roundtrip(tmp_path):
    if not checkpoint._orbax_available():
        import pytest

        pytest.skip("orbax not installed")
    calib = calibration.Calibrator.create(3)
    params, _ = calib.init(MICS)
    path = str(tmp_path / "orbax_ckpt")
    checkpoint.save(path, params, use_orbax=True)
    restored = checkpoint.restore(path, calib.init(MICS)[0])
    _assert_trees_equal(params, restored)


def test_stage_timer():
    t = profiling.StageTimer()
    with t.stage("work") as h:
        h["result"] = jnp.ones((8, 8)) * 2
    assert t.calls["work"] == 1
    assert "work" in t.report()


def test_throughput_meter():
    m = profiling.ThroughputMeter()
    m.add(frames=100)
    assert m.frames == 100
    assert m.frames_per_sec > 0


def test_memory_stats_does_not_crash():
    profiling.device_memory_stats()


def test_restore_structure_mismatch_raises(tmp_path):
    """A checkpoint saved under a different state structure must fail
    loudly with the path diff, not misassign leaves by index (the
    pre-r4 restore matched leaf_i positionally)."""
    import pytest

    from audio_triangulation_tpu.models.tracked import (
        TrackedStreamingLocalizer)

    sl = StreamingLocalizer.create(MICS)
    p = checkpoint.save(str(tmp_path / "plain"), sl.init_state(),
                        use_orbax=False)
    tsl = TrackedStreamingLocalizer.create(MICS)
    with pytest.raises(ValueError, match="structure mismatch"):
        checkpoint.restore(p, tsl.init_state())


def test_restore_partial_keeps_template_for_missing(tmp_path):
    """partial=True restores the path intersection and keeps template
    values elsewhere — resuming a subset of a grown state."""
    old = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(7)}
    p = checkpoint.save(str(tmp_path / "old"), old, use_orbax=False)
    template = {"a": jnp.zeros(2), "b": jnp.asarray(0),
                "c": jnp.asarray(42.0)}
    got = checkpoint.restore(p, template, partial=True)
    np.testing.assert_array_equal(np.asarray(got["a"]), [1.0, 2.0])
    assert int(got["b"]) == 7
    assert float(got["c"]) == 42.0  # template value kept
