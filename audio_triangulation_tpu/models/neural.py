"""Learned localization model family: a neural regressor on GCC features.

New capability with no reference equivalent (the firmware's only estimator
is the SRP grid argmax, ``src/components/vga/vga_heatmap.h:95-159``): a
small MLP maps whitened correlograms [P, L] to source coordinates.  Where
the physics-based chain (SRP + Gauss-Newton) is exact under the anechoic
model, a trained regressor can absorb systematic effects the model misses —
reverberant bias from a specific room, mic mismatch, near-field curvature —
directly from data, including data synthesized on-device by the shoebox
simulator (``utils/room.simulate_batch``).

Design notes (TPU-first):
- Features are the SAME device-resident correlograms the flagship pipeline
  computes (condition -> MXU matmul-DFT -> cross-power/PHAT -> lag
  synthesis), max-normalized per pair; the network is two small matmuls.
  Feature extraction and the MLP jit into one module.
- The training step follows the repo's canonical pattern
  (``models/calibration.py``): optax adam, donated (params, opt_state),
  value_and_grad through the whole feature extractor.  Data-parallel
  scaling is sharding annotations on the batch axis — XLA inserts the
  gradient psum (tested on an 8-device mesh).
- Parameters are a plain pytree (nested dicts), so ``utils/checkpoint``
  saves/restores them with no extra machinery.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.config import PipelineConfig
from ..core import geometry
from ..ops import window as window_ops
from . import localizer as localizer_mod


def init_mlp(seed: int, sizes: tuple[int, ...]) -> dict:
    """He-initialized MLP parameters {layer_i: {w, b}} for the given layer
    widths (features, hidden..., out)."""
    key = jax.random.PRNGKey(seed)
    params = {}
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        params[f"layer_{i}"] = {
            "w": (jax.random.normal(sub, (fan_in, fan_out), jnp.float32)
                  * np.sqrt(2.0 / fan_in)),
            "b": jnp.zeros((fan_out,), jnp.float32),
        }
    return params


def apply_mlp(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """ReLU MLP; linear last layer."""
    n = len(params)
    for i in range(n):
        layer = params[f"layer_{i}"]
        x = x @ layer["w"] + layer["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


@dataclasses.dataclass(frozen=True)
class NeuralLocalizer:
    """GCC-feature MLP regressor with the repo-standard optax trainer.

    >>> net = NeuralLocalizer.create(mic_positions)
    >>> params, opt_state = net.init(seed=0)
    >>> params, opt_state, loss = net.train_step(params, opt_state,
    ...                                          frames, xy)
    >>> net.predict(params, frames)       # [B, 2]
    """

    pipeline: PipelineConfig
    pairs: jnp.ndarray            # [P, 2]
    window: jnp.ndarray           # [N]
    hidden: tuple[int, ...] = (256, 128)
    out_dim: int = 2
    learning_rate: float = 1e-3
    # append per-pair soft-argmax lags (calibration.soft_tdoa) to the
    # correlogram features: the TDOA -> position mapping is smooth and
    # low-dimensional, so convergence is much faster with the peak
    # locations made explicit (the raw correlograms still let the net see
    # peak shape/ambiguity)
    include_tdoa: bool = True

    @classmethod
    def create(cls, mic_positions: np.ndarray,
               pipeline: PipelineConfig = PipelineConfig(),
               **kwargs) -> "NeuralLocalizer":
        mic_positions = np.asarray(mic_positions, np.float32)
        pairs = jnp.asarray(geometry.mic_pairs(mic_positions.shape[0]))
        win = jnp.asarray(window_ops.window_for(pipeline))
        return cls(pipeline=pipeline, pairs=pairs, window=win, **kwargs)

    # ------------------------------------------------------------------
    @property
    def feature_dim(self) -> int:
        p = int(self.pairs.shape[0])
        return p * self.pipeline.num_lags + (p if self.include_tdoa else 0)

    @property
    def sizes(self) -> tuple[int, ...]:
        return (self.feature_dim, *self.hidden, self.out_dim)

    def features(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Frames [B, M, N] -> max-normalized correlograms [B, P*L]."""
        cfg = self.pipeline
        params = _feature_params(self.pairs, self.window)
        x = localizer_mod.condition_frames(frames, self.window, cfg)
        corr = localizer_mod.correlate_frames(x, params, cfg)  # [B, P, L]
        corr = corr / (jnp.max(jnp.abs(corr), axis=-1, keepdims=True)
                       + 1e-20)
        feats = corr.reshape(corr.shape[0], -1)
        if self.include_tdoa:
            from . import calibration

            tdoa = calibration.soft_tdoa(corr, cfg.max_shift)  # [B, P]
            feats = jnp.concatenate(
                [feats, tdoa / cfg.max_shift], axis=-1)
        return feats

    # ------------------------------------------------------------------
    @functools.cached_property
    def optimizer(self):
        return optax.adam(self.learning_rate)

    def init(self, seed: int = 0):
        params = init_mlp(seed, self.sizes)
        return params, self.optimizer.init(params)

    def loss(self, params: dict, frames: jnp.ndarray,
             target_xy: jnp.ndarray) -> jnp.ndarray:
        pred = apply_mlp(params, self.features(frames))
        return jnp.mean(jnp.sum((pred - target_xy) ** 2, axis=-1))

    @functools.cached_property
    def train_step(self):
        """Jitted (params, opt_state, frames, xy) -> (params, opt_state,
        loss); shard the frames/xy batch axis for data parallelism."""

        def step(params, opt_state, frames, target_xy):
            loss, grads = jax.value_and_grad(self.loss)(
                params, frames, target_xy)
            updates, opt_state = self.optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1))

    @functools.cached_property
    def _predict(self):
        return jax.jit(lambda p, f: apply_mlp(p, self.features(f)))

    def predict(self, params: dict, frames: jnp.ndarray) -> jnp.ndarray:
        """Frames [B, M, N] -> predicted source coordinates [B, out_dim]."""
        return self._predict(params, frames)

    def fit(self, data, *, seed: int = 0, state=None, log_every: int = 0):
        """Train over an iterable of (frames, xy) batches; returns
        ((params, opt_state), losses)."""
        params, opt_state = self.init(seed) if state is None else state
        losses = []
        for i, (frames, xy) in enumerate(data):
            params, opt_state, loss = self.train_step(
                params, opt_state, jnp.asarray(frames), jnp.asarray(xy))
            losses.append(float(loss))
            if log_every and i % log_every == 0:
                print(f"step {i}: loss {losses[-1]:.5f}")
        return (params, opt_state), losses


def _feature_params(pairs: jnp.ndarray,
                    window: jnp.ndarray) -> localizer_mod.LocalizerParams:
    """Minimal LocalizerParams for correlate_frames (no grid machinery)."""
    return localizer_mod.LocalizerParams(
        mic_positions=jnp.zeros((0, 2), jnp.float32),
        pairs=pairs, window=window,
        lut_flat=jnp.zeros((pairs.shape[0], 1), jnp.int32),
        onehot=None, score_bias=None)


def synthetic_batches(
    mic_positions: np.ndarray,
    *,
    n_batches: int,
    batch_size: int,
    pipeline: PipelineConfig = PipelineConfig(),
    extent_m: float = 1.0,
    height_m: float = 1.2,
    noise_rms: tuple[float, float] = (0.005, 0.05),
    room=None,
    bank: int = 0,
    seed: int = 0,
):
    """Generator of (frames [B, M, N], xy [B, 2]) training batches.

    Sources are uniform on the plane z = height_m within +-extent_m;
    anechoic by default, or simulated in a ``utils.room.ShoeboxRoom``
    (whose walls must enclose the sampled region — the array is placed at
    the room's floor center automatically).

    ``bank > 0`` switches to the finite-scene-bank regime: ``bank`` scenes
    are synthesized once up front (in chirp-varied chunks), then every
    batch samples the bank with replacement and adds FRESH measurement
    noise.  This amortizes the expensive image-source room simulation
    (~15x faster wall-clock for room-trained models at equal step counts)
    while noise re-draws keep the regressor from memorizing noise
    realizations."""
    from ..utils import synth

    rng = np.random.default_rng(seed)
    mics = np.asarray(mic_positions, np.float64)
    n = pipeline.frame_size
    fs = pipeline.sample_rate_hz

    if room is not None:
        from ..utils import room as room_mod

        assert isinstance(room, room_mod.ShoeboxRoom)
        shift = np.array([room.size[0] / 2, room.size[1] / 2, 0.0])
        mic3 = np.zeros((mics.shape[0], 3))
        mic3[:, : mics.shape[1]] = mics

    def scenes(count: int, b: int):
        """count noiseless scenes with a freshly drawn chirp."""
        xy = rng.uniform(-extent_m, extent_m, (count, 2))
        src = np.concatenate(
            [xy, np.full((count, 1), height_m)], axis=-1)
        sigs = synth.chirp_burst(
            n, fs, f0=rng.uniform(500, 1200), f1=rng.uniform(4000, 8000))
        if room is None:
            frames = synth.synth_scene(
                src, mics, n=n, fs=fs, signal=sigs, noise_rms=0.0,
                seed=seed + 31 * b)
        else:
            frames = np.asarray(room_mod.simulate_batch(
                src + shift, mic3 + shift, room, n=n, fs=fs, signal=sigs))
        return frames, xy

    if bank:
        chunks = [scenes(min(batch_size, bank - i), 1000 + j)
                  for j, i in enumerate(range(0, bank, batch_size))]
        bank_fr = np.concatenate([c[0] for c in chunks])
        bank_xy = np.concatenate([c[1] for c in chunks])
        for _ in range(n_batches):
            idx = rng.integers(0, bank, batch_size)
            nr = rng.uniform(*noise_rms)
            frames = bank_fr[idx] + rng.normal(
                0.0, nr, (batch_size,) + bank_fr.shape[1:])
            yield frames.astype(np.float32), bank_xy[idx].astype(np.float32)
        return

    for b in range(n_batches):
        frames, xy = scenes(batch_size, b)
        nr = rng.uniform(*noise_rms)
        frames = frames + rng.normal(0.0, nr, frames.shape)
        yield frames.astype(np.float32), xy.astype(np.float32)
