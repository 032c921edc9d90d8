"""Cross-implementation parity: the C++ ingest runtime and the JAX streaming
localizer must detect the same events at the same sample positions (both
implement the reference's trigger + post-event ring-reset semantics)."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.core.config import StreamConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.models.streaming import StreamingLocalizer
from audio_triangulation_tpu.runtime import native_rt
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()


def _multi_event_stream(seed=0, t_len=20000, events=(3000, 8000, 14000)):
    rng = np.random.default_rng(seed)
    streams = rng.integers(127, 130, size=(3, t_len)).astype(np.float64)
    for i, at in enumerate(events):
        p = np.array([0.5 - 0.3 * i, 0.4, 1.2])
        src = p * (1.2 / np.linalg.norm(p))
        fr = synth.synth_scene(src, MICS, noise_rms=0.0, seed=seed + i)[0]
        streams[:, at: at + 1024] += 110.0 * fr
    return np.clip(np.round(streams), 0, 255).astype(np.int16)


def test_native_and_jax_streaming_agree_on_triggers():
    streams = _multi_event_stream()

    rt = native_rt.create_ingest_runtime(3)
    rt.push(streams.T)
    native_triggers = []
    while True:
        ev = rt.poll()
        if ev is None:
            break
        native_triggers.append(ev[1])
    rt.close()

    sl = StreamingLocalizer.create(MICS, stream=StreamConfig(chunk_size=500))
    state, outs = sl.run(streams.astype(np.float64))
    jax_triggers = [int(o["trigger_abs"]) for o in outs if o["triggered"]]

    assert len(native_triggers) >= 3
    assert jax_triggers == native_triggers, (jax_triggers, native_triggers)


def test_streaming_extracted_frame_matches_native():
    streams = _multi_event_stream(seed=7, events=(5000,))
    rt = native_rt.create_ingest_runtime(3)
    rt.push(streams.T)
    frames_native, stamp = rt.poll()
    rt.close()

    # JAX side: extract the frame ending at the same trigger
    from audio_triangulation_tpu.ops import detector
    from audio_triangulation_tpu.core.config import PipelineConfig

    idx, found = detector.first_trigger(
        jnp.asarray(streams.astype(np.int64))[None], PipelineConfig())
    assert bool(found[0]) and int(idx[0]) == stamp
    frames_jax = detector.extract_frames_at(
        jnp.asarray(streams.astype(np.int64))[None],
        jnp.asarray([stamp]), 1024)[0]
    np.testing.assert_array_equal(np.asarray(frames_jax), frames_native)
