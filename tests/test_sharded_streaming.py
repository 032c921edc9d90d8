"""Multi-chip streaming serving: S streams sharded over the data axis
(8-device virtual CPU mesh), exactly matching the single-device vmapped
step (SURVEY.md §4 d; the production-serving shape)."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_triangulation_tpu import geometry
from audio_triangulation_tpu.core.config import StreamConfig
from audio_triangulation_tpu.models.streaming import StreamingLocalizer
from audio_triangulation_tpu.parallel import mesh as mesh_lib
from audio_triangulation_tpu.parallel import sharded
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()
CHUNK = 1024  # 4 steps over the 4096-sample streams (suite-time diet)


def _streams(n_streams, t_len=4096, seed=0):
    """[S, M, T] uint8-scale streams; stream s gets an event iff s is even,
    at a distinct position."""
    rng = np.random.default_rng(seed)
    out = rng.integers(127, 130, size=(n_streams, 3, t_len)).astype(
        np.float64)
    planes = []
    for s in range(n_streams):
        if s % 2 == 0:
            x, y = 0.3 + 0.05 * s, 0.4 - 0.03 * s
            p = np.array([x, y, 1.2])
            src = p * (1.2 / np.linalg.norm(p))
            fr = synth.synth_scene(src, MICS, noise_rms=0.0, seed=s)[0]
            out[s, :, 1500:1500 + 1024] += 110.0 * fr
            planes.append((x, y))
        else:
            planes.append(None)
    return np.clip(np.round(out), 0, 255), planes


_RUN = {}


def _shared_run():
    """ONE sharded run (16 streams, 8 chunks) + the single-device reference
    run over the same chunks, shared by the parity and localization tests
    below (running it twice cost ~10 s of suite time for no extra
    coverage).  Sources stay at 8 distinct positions (streams 0,2,..,14)."""
    if _RUN:
        return _RUN
    sl = StreamingLocalizer.create(
        MICS, stream=StreamConfig(chunk_size=CHUNK))
    mesh = mesh_lib.make_mesh()
    fn, init_states = sharded.make_sharded_stream_step(sl, mesh)

    n = 16
    streams, planes = _streams(n)
    t = streams.shape[-1]

    st_sharded = init_states(n)
    st_ref = sl.init_states(n)
    outs_s, outs_r = [], []
    for i in range(0, t - t % CHUNK, CHUNK):
        chunk = jnp.asarray(streams[:, :, i: i + CHUNK])
        st_sharded, out_s = fn(st_sharded, chunk)
        st_ref, out_r = sl.step_many(st_ref, chunk)
        outs_s.append(out_s)
        outs_r.append(out_r)
    _RUN.update(dict(planes=planes, st_sharded=st_sharded,
                     outs_s=outs_s, outs_r=outs_r))
    return _RUN


def test_sharded_stream_step_matches_vmapped():
    run = _shared_run()
    for out_s, out_r in zip(run["outs_s"], run["outs_r"]):
        for key in ("event", "xy", "xy_grid", "best_shift"):
            np.testing.assert_allclose(
                np.asarray(out_s[key]), np.asarray(out_r[key]),
                rtol=1e-5, atol=1e-5, err_msg=key)

    # every even stream detected its event; odd streams stayed quiet
    counts = np.asarray(run["st_sharded"].event_count)
    assert (counts[::2] >= 1).all(), counts
    assert (counts[1::2] == 0).all(), counts


def test_sharded_stream_events_localized():
    run = _shared_run()
    got = {}
    for out in run["outs_s"]:
        ev = np.asarray(out["event"])
        xy = np.asarray(out["xy"])
        for s in np.nonzero(ev)[0]:
            got.setdefault(int(s), xy[s])
    for s, plane in enumerate(run["planes"]):
        if plane is None:
            assert s not in got
        else:
            assert s in got, f"stream {s} missed its event"
            err = np.linalg.norm(got[s] - np.asarray(plane))
            assert err < 0.15, (s, got[s], plane)


def test_init_states_divisibility_check():
    import pytest

    sl = StreamingLocalizer.create(MICS)
    mesh = mesh_lib.make_mesh()
    _, init_states = sharded.make_sharded_stream_step(sl, mesh)
    with pytest.raises(ValueError):
        init_states(12)  # not divisible by 8


def test_sharded_stream_step_solve_velocity_threads_resample():
    """Regression: make_sharded_stream_step with solve_velocity must pass
    the CAF resampling matrices as a traced jit ARGUMENT (replicated over
    the mesh), not rebuild them at trace time inside the jit — a closure
    constant bakes ~138 MB of HLO into the sharded program at production
    scale (the PERFORMANCE.md jit-closure footgun).  Functional check:
    the sharded step runs and emits a velocity per stream."""
    from audio_triangulation_tpu import PipelineConfig

    cfg = PipelineConfig(
        phat=True, window_enabled=False, band_hz=(700.0, 9500.0))
    sl = StreamingLocalizer.create(
        MICS, cfg,
        stream=StreamConfig(chunk_size=2048, solve_velocity=True,
                            velocity_n_scales=5))
    assert sl._caf_resample is not None
    mesh = mesh_lib.make_mesh()
    fn, init_states = sharded.make_sharded_stream_step(sl, mesh)

    n = 8
    streams, _ = _streams(n, seed=3)
    st = init_states(n)
    out = None
    for i in range(0, 4096, 2048):
        st, out = fn(st, jnp.asarray(streams[:, :, i: i + 2048]))
    assert out is not None
    assert np.asarray(out["velocity"]).shape == (n, 2)
    assert np.isfinite(np.asarray(out["velocity"])).all()
