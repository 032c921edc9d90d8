"""Quickstart: batched localization, streaming, and calibration in ~60 lines.

Run: python examples/quickstart.py   (CPU or TPU)
"""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.core.config import StreamConfig
from audio_triangulation_tpu.models.streaming import StreamingLocalizer
from audio_triangulation_tpu.utils import synth

# --- 1. batched frame localization -----------------------------------
mics = geometry.reference_array()  # the firmware's 3-mic triangle
loc = Localizer.create(mics, PipelineConfig(phat=True))

plane = np.array([0.8, 0.5])
p3 = np.array([*plane, 1.2])
source = p3 * (1.2 / np.linalg.norm(p3))  # on the 1.2 m sphere cap
frames = synth.synth_scene(source, mics, noise_rms=0.01, seed=0)

out = loc(jnp.asarray(frames, jnp.float32))
print("true:", plane, " estimated:", np.asarray(out["xy"])[0],
      " tdoas:", np.round(np.asarray(out["tdoa_samples"])[0], 2))

# --- 2. streaming with event detection --------------------------------
sl = StreamingLocalizer.create(mics, stream=StreamConfig(chunk_size=512))
rng = np.random.default_rng(1)
stream = rng.integers(127, 130, (3, 12000)).astype(np.float64)
stream[:, 4000:5024] += 110.0 * frames[0]
state, outs = sl.run(np.clip(np.round(stream), 0, 255))
events = [o for o in outs if o["event"]]
print(f"streaming: {int(state.event_count)} event(s); "
      f"xy={events[-1]['xy_grid'] if events else None}")

# --- 3. self-calibration (learn the geometry) --------------------------
from audio_triangulation_tpu.models import calibration

planes = rng.uniform(-1, 1, (24, 2))
sources = np.stack([np.array([x, y, 1.2]) * (1.2 / np.linalg.norm([x, y, 1.2]))
                    for x, y in planes])
cal_frames = synth.synth_scene(sources, mics, noise_rms=0.005, seed=2)
batch = calibration.CalibBatch(
    frames=jnp.asarray(cal_frames, jnp.float32),
    source_xy=jnp.asarray(planes, jnp.float32))
calib = calibration.Calibrator.create(3)
guess = mics + rng.normal(0, 0.008, mics.shape).astype(np.float32)
params, opt_state = calib.init(guess)
for _ in range(40):
    params, opt_state, loss = calib.train_step(params, opt_state, batch)
print(f"calibration: geometry error "
      f"{np.abs(guess - mics).mean() * 1e3:.2f} mm -> "
      f"{np.abs(np.asarray(params.mic_xy) - mics).mean() * 1e3:.2f} mm")
