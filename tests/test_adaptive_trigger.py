"""Adaptive (CFAR-style relative) event triggering, across all three
detector implementations: JAX, native C++, NumPy fallback."""

import numpy as np
import pytest
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import PipelineConfig, StreamConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.ops import detector
from audio_triangulation_tpu.runtime import native_rt
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()


def _stream(noise_scale, burst_scale, t_len=8000, event_at=3000, seed=0):
    """[1, 3, T] int stream: uniform noise floor + one real transient."""
    rng = np.random.default_rng(seed)
    src = np.array([0.5, 0.4, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    frames = synth.synth_scene(src, MICS, noise_rms=0.0, seed=seed)[0]
    streams = rng.integers(
        128 - noise_scale, 129 + noise_scale,
        size=(3, t_len)).astype(np.float64)
    streams[:, event_at: event_at + 1024] += burst_scale * frames
    return np.clip(np.round(streams), 0, 255).astype(np.int64)[None]


def test_relative_matches_absolute_in_quiet():
    """On the reference's quiet-floor regime both modes find the event at
    the same position."""
    s = _stream(noise_scale=1, burst_scale=110)
    cfg_abs = PipelineConfig()
    cfg_rel = PipelineConfig(trigger_mode="relative", trigger_ratio=4.0)
    ia, fa = detector.first_trigger(jnp.asarray(s), cfg_abs)
    ir, fr = detector.first_trigger(jnp.asarray(s), cfg_rel)
    assert bool(fa[0]) and bool(fr[0])
    # relative fires a beat later (it waits for out/inc >= ratio, i.e. the
    # transient mostly in the outgoing half) but inside the same event
    assert 0 <= int(ir[0]) - int(ia[0]) <= 512, (int(ia[0]), int(ir[0]))


def test_absolute_breaks_on_loud_floor_relative_does_not():
    """A loud noise floor: the fixed reference threshold fires on noise
    (its absolute margin was tuned for a quiet room), while the relative
    detector stays quiet until the real transient."""
    s = _stream(noise_scale=40, burst_scale=110, seed=3)
    quiet = _stream(noise_scale=40, burst_scale=0.0, seed=3)  # no event

    cfg_abs = PipelineConfig()
    cfg_rel = PipelineConfig(trigger_mode="relative", trigger_ratio=4.0)

    # absolute mode false-triggers on the event-free loud floor
    mask_abs = detector.trigger_mask(jnp.asarray(quiet), cfg_abs)
    assert bool(np.asarray(mask_abs).any()), "expected false triggers"
    # relative mode: silent on the floor, fires on the real event
    mask_rel_quiet = detector.trigger_mask(jnp.asarray(quiet), cfg_rel)
    assert not bool(np.asarray(mask_rel_quiet).any())
    idx, found = detector.first_trigger(jnp.asarray(s), cfg_rel)
    assert bool(found[0])
    # fires while the 3000..4024 transient occupies the outgoing half
    assert 3000 <= int(idx[0]) <= 4024 + 512, int(idx[0])


def test_unknown_trigger_mode_raises():
    with pytest.raises(ValueError):
        detector.trigger_mask(
            jnp.zeros((1, 3, 2048), jnp.int64),
            PipelineConfig(trigger_mode="wat"))


@pytest.mark.skipif(not native_rt.native_available(),
                    reason="native toolchain unavailable")
def test_native_ratio_default_matches_reference():
    """trigger_ratio=1.0 keeps the native detector's reference semantics
    (identical event count/stamps vs the default constructor)."""
    s = _stream(noise_scale=1, burst_scale=110)[0]
    pcm = s.astype(np.int16).T.copy()

    events = {}
    for name, kwargs in (("default", {}), ("ratio1", {"trigger_ratio": 1.0})):
        rt = native_rt.NativeIngestRuntime(3, 1024, **kwargs)
        rt.push(pcm)
        evs = []
        while True:
            ev = rt.poll()
            if ev is None:
                break
            evs.append(ev[1])
        rt.close()
        events[name] = evs
    assert events["default"] == events["ratio1"]
    assert len(events["default"]) == 1


@pytest.mark.skipif(not native_rt.native_available(),
                    reason="native toolchain unavailable")
def test_native_relative_suppresses_loud_floor():
    quiet = _stream(noise_scale=40, burst_scale=0.0, seed=3)[0]
    pcm = quiet.astype(np.int16).T.copy()

    rt_abs = native_rt.NativeIngestRuntime(3, 1024)
    rt_abs.push(pcm)
    rt_rel = native_rt.NativeIngestRuntime(3, 1024, trigger_ratio=4.0)
    rt_rel.push(pcm)
    assert rt_abs.events_detected > 0       # fixed threshold fires on noise
    assert rt_rel.events_detected == 0      # relative floor-tracking doesn't
    rt_abs.close()
    rt_rel.close()

    s = _stream(noise_scale=40, burst_scale=110, seed=3)[0]
    rt = native_rt.NativeIngestRuntime(3, 1024, trigger_ratio=4.0)
    rt.push(s.astype(np.int16).T.copy())
    assert rt.events_detected == 1          # ...but catches the real event
    rt.close()


def test_py_fallback_relative_matches_native_semantics():
    quiet = _stream(noise_scale=40, burst_scale=0.0, seed=3)[0]
    s = _stream(noise_scale=40, burst_scale=110, seed=3)[0]
    rt = native_rt.PyIngestRuntime(3, 1024, trigger_ratio=4.0)
    rt.push(quiet.astype(np.int16).T.copy())
    assert rt.events_detected == 0
    rt.push(s.astype(np.int16).T.copy())
    assert rt.events_detected == 1


def test_streaming_relative_mode_end_to_end():
    """StreamingLocalizer with relative triggering localizes through a loud
    floor the absolute mode cannot operate in."""
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    s = _stream(noise_scale=25, burst_scale=110, seed=7)[0].astype(
        np.float64)
    plane = np.array([0.5, 0.4]) * (1.2 / np.linalg.norm([0.5, 0.4, 1.2]))
    sl = StreamingLocalizer.create(
        MICS,
        PipelineConfig(trigger_mode="relative", trigger_ratio=4.0),
        stream=StreamConfig(chunk_size=512))
    state, outs = sl.run(s)
    events = [o for o in outs if o["event"]]
    assert len(events) == 1, len(events)
    xy = np.asarray(events[-1].get("xy", events[-1]["xy_grid"]))
    assert np.linalg.norm(xy - plane) < 0.25, (xy, plane)
