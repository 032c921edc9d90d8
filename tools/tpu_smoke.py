#!/usr/bin/env python3
"""TPU hardware smoke checks.

The test suite runs on a virtual CPU mesh (tests/conftest.py); this script
validates the TPU-specific code paths on the real chip — the fused Pallas
kernels against their XLA references, end-to-end accuracy, and the streaming
step — and prints one PASS/FAIL line each.  Run manually or from CI with a
TPU attached: ``python tools/tpu_smoke.py``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
    from audio_triangulation_tpu.ops import mxu_fft, solver as solver_ops
    from audio_triangulation_tpu.ops import window as window_ops, xcorr
    from audio_triangulation_tpu.ops.pallas import gcc_kernel, gcc_large, gn_kernel
    from audio_triangulation_tpu.utils import synth

    assert jax.default_backend() == "tpu", (
        f"not on TPU: {jax.default_backend()}")
    failures = []

    def check(name, ok, detail=""):
        print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
        if not ok:
            failures.append(name)

    rng = np.random.default_rng(0)
    cfg = PipelineConfig(phat=True, fft_pad_mode="circular")
    mics = geometry.square_array(0.3)
    pairs = geometry.mic_pairs(4)
    win = jnp.asarray(window_ops.dpss_window(1024))
    frames = jnp.asarray(
        rng.normal(120, 10, (256, 4, 1024)).astype(np.float32))

    # 1. fused GCC kernel vs unfused MXU path
    got = np.asarray(gcc_kernel.fused_gcc(frames, win, pairs, cfg, tile_b=64))
    x = (frames - jnp.mean(frames, -1, keepdims=True)) * 256.0 * win
    ref = np.asarray(mxu_fft.xcorr_mxu(x, jnp.asarray(pairs), cfg))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    check("fused_gcc == mxu", err < 1e-5, f"rel={err:.2e}")

    # 2. fused peaks kernel vs unfused ops
    corr_t, shifts, tdoa, peak, psr = gcc_kernel.fused_gcc_peaks(
        frames, win, pairs, cfg, tile_b=64)
    ref_shifts = np.asarray(xcorr.best_lag(jnp.asarray(ref), cfg.max_shift))
    check("fused peaks argmax", np.array_equal(np.asarray(shifts), ref_shifts))

    # 3. GN Pallas kernel vs XLA solver (geometry-consistent TDOAs — with
    # random inconsistent ones GN wanders between equivalent minima and the
    # comparison is ill-posed)
    mic3 = jnp.zeros((4, 3), jnp.float32).at[:, :2].set(jnp.asarray(mics))
    true_xy = jnp.asarray(rng.uniform(-1, 1, (256, 2)).astype(np.float32))
    taus = jax.vmap(lambda q: solver_ops.predicted_tdoas(
        q, mic3, jnp.asarray(pairs), 343.0, 1.2, True))(true_xy)
    init = true_xy * 0.9 + 0.02
    xy_k, _ = gn_kernel.solve_tdoa_pallas(
        taus, mics, pairs, speed_of_sound=343.0, height=1.2, init_xy=init)
    xy_x, _ = solver_ops.solve_tdoa_batched(
        taus, jnp.asarray(mics), jnp.asarray(pairs),
        speed_of_sound=343.0, height=1.2, init_xy=init)
    err = np.abs(np.asarray(xy_k) - np.asarray(xy_x)).max()
    check("gn kernel == xla solver", err < 1e-3, f"max={err:.2e}")

    # 4. large-array kernel vs XLA pair-blocked (reduced size for speed).
    # The XLA reference path's matmuls run at the TPU DEFAULT precision
    # (bf16-class passes, ~2e-3 relative — measured directly; the Pallas
    # kernel is true f32), so the comparison tolerance is the default-
    # precision floor, and the decisions that matter (argmax lags) must
    # agree exactly on an event-like signal.
    mics12 = geometry.circular_array(12, 0.2)
    pairs12 = geometry.mic_pairs(12)
    cfg12 = PipelineConfig(
        fft_pad_mode="circular", phat=True,
        max_shift_samples=geometry.max_lag_for_array(
            mics12, PipelineConfig()))
    src12 = np.array([0.6, -0.4, 1.2])
    src12 = src12 * 1.2 / np.linalg.norm(src12)
    ev12 = synth.synth_scene(src12, mics12, noise_rms=0.01, seed=5)
    fr12 = jnp.asarray(
        np.broadcast_to(ev12, (16, 12, 1024)).copy(), jnp.float32)
    got = np.asarray(gcc_large.xcorr_large(
        fr12, pairs12, cfg12, tile_b=4, chunk=32))
    ref = np.asarray(mxu_fft.xcorr_mxu_pairblocked(
        fr12, jnp.asarray(pairs12), cfg12, pair_chunk=16))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    lags_ok = np.array_equal(
        np.asarray(xcorr.best_lag(jnp.asarray(got), cfg12.max_shift)),
        np.asarray(xcorr.best_lag(jnp.asarray(ref), cfg12.max_shift)))
    check("gcc_large ~= pairblocked", err < 1e-2 and lags_ok,
          f"rel={err:.2e} lags_equal={lags_ok}")

    # 5. end-to-end accuracy on hardware
    loc = Localizer.create(mics, cfg)
    plane = np.array([0.6, -0.4])
    src = np.array([*plane, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    ev = synth.synth_scene(src, mics, noise_rms=0.01, seed=1)
    out = loc(jnp.asarray(ev, jnp.float32))
    err = float(np.linalg.norm(np.asarray(out["xy"])[0] - plane))
    check("e2e localization", err < 0.05, f"err={err * 100:.2f}cm")

    # 6. streaming step on hardware
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    sl = StreamingLocalizer.create(
        geometry.reference_array(), stream=StreamConfig(chunk_size=512))
    stream = rng.integers(127, 130, (3, 6000)).astype(np.float64)
    fr3 = synth.synth_scene(src, geometry.reference_array(), seed=2)[0]
    stream[:, 2000:3024] += 110.0 * fr3
    state, outs = sl.run(np.clip(np.round(stream), 0, 255))
    check("streaming event", int(state.event_count) >= 1,
          f"events={int(state.event_count)}")

    # 6b. sub-batched step_many == single program ON HARDWARE (the r3
    # >1,024-stream cliff fix dispatches sub-batches; layouts/matmul
    # tilings differ from the monolithic program, so check on the chip)
    import jax.numpy as jnp2
    from audio_triangulation_tpu.core.config import (
        StreamConfig as _SC)

    sl_c = StreamingLocalizer.create(
        geometry.reference_array(),
        stream=_SC(chunk_size=512, batch_chunk_streams=2))
    sl_p = StreamingLocalizer.create(
        geometry.reference_array(),
        stream=_SC(chunk_size=512, batch_chunk_streams=None))
    streams5 = np.stack([
        np.clip(np.round(
            rng.integers(127, 130, (3, 2048)).astype(np.float64)
            + np.pad(110.0 * fr3[:, :1024],
                     [(0, 0), (512 + 37 * i, 2048 - 1536 - 37 * i)])),
            0, 255) for i in range(5)])
    st_c, st_p = sl_c.init_states(5), sl_p.init_states(5)
    ok = True
    for i in range(0, 2048, 512):
        ch = jnp2.asarray(streams5[:, :, i:i + 512], jnp2.float32)
        st_c, out_c = sl_c.step_many(st_c, ch)
        st_p, out_p = sl_p.step_many(st_p, ch)
        ok = ok and np.array_equal(np.asarray(out_c["trigger_abs"]),
                                   np.asarray(out_p["trigger_abs"]))
        ok = ok and np.allclose(np.asarray(out_c["xy"]),
                                np.asarray(out_p["xy"]), atol=1e-4)
    events_c = int(np.asarray(st_c.event_count).sum())
    check("step_many chunked == plain", ok and events_c >= 1,
          f"events={events_c}")

    # 7. subspace methods on hardware (real-block-embedding eigh/solve)
    from audio_triangulation_tpu.core.config import GridConfig
    from audio_triangulation_tpu.ops import srp_freq

    mics8 = geometry.circular_array(8, 0.25)
    grid8 = GridConfig(half_cells_x=24, half_cells_y=24, cells_per_m=16.0)
    snaps = []
    for t in range(8):
        sig = synth.colored_burst(1024, 50_000.0, seed=40 + t)
        f8 = synth.synth_scene(src, mics8, signal=sig, noise_rms=0.0,
                               seed=0)[0]
        snaps.append(f8 + rng.normal(0, 0.02, f8.shape))
    snaps = jnp.asarray(np.stack(snaps), jnp.float32)
    mus = srp_freq.localize_music(snaps, mics8, grid8, PipelineConfig(),
                                  bin_stride=8, n_sources=1)
    err = float(np.linalg.norm(np.asarray(mus["xy_grid"]) - plane))
    check("music on tpu", err < 0.12, f"err={err * 100:.1f}cm")
    mv = srp_freq.localize_mvdr(snaps, mics8, grid8, PipelineConfig(),
                                bin_stride=8)
    err = float(np.linalg.norm(np.asarray(mv["xy_grid"]) - plane))
    check("mvdr on tpu", err < 0.12, f"err={err * 100:.1f}cm")

    # 8. solver covariance on hardware (SPD, sane scale)
    cov = np.asarray(out["xy_cov"])
    ev_cov = np.linalg.eigvalsh(cov[0])
    check("xy_cov spd", bool(np.all(ev_cov > 0))
          and cov.shape == (1, 2, 2),
          f"eig=[{ev_cov[0]:.1e},{ev_cov[1]:.1e}]")

    # 9. band-cropped fused path on hardware: parity with masked full-band
    cfg_b = PipelineConfig(phat=True, fft_pad_mode="circular",
                           band_hz=(800.0, 6000.0), band_crop=True)
    cfg_m = PipelineConfig(phat=True, fft_pad_mode="circular",
                           band_hz=(800.0, 6000.0))
    loc_b = Localizer.create(mics, cfg_b)
    loc_m = Localizer.create(mics, cfg_m)
    xy_b = np.asarray(loc_b(jnp.asarray(ev, jnp.float32))["xy"])[0]
    xy_m = np.asarray(loc_m(jnp.asarray(ev, jnp.float32))["xy"])[0]
    err = float(np.linalg.norm(xy_b - xy_m))
    e2e = float(np.linalg.norm(xy_b - plane))
    check("band crop == mask", err < 1e-3 and e2e < 0.05,
          f"diff={err * 100:.3f}cm e2e={e2e * 100:.2f}cm")

    # 10. robust IRLS actually routes on hardware (outputs differ from
    # plain LS when outlier pairs are injected)
    from audio_triangulation_tpu.core.config import SolverConfig

    bad = np.asarray(taus).copy()
    bad[:, 2] += 2.0e-3
    xy_p, _ = solver_ops.solve_tdoa_batched(
        jnp.asarray(bad), jnp.asarray(mics), jnp.asarray(pairs),
        speed_of_sound=343.0, height=1.2, init_xy=init)
    xy_r, _ = solver_ops.solve_tdoa_batched(
        jnp.asarray(bad), jnp.asarray(mics), jnp.asarray(pairs),
        speed_of_sound=343.0, height=1.2, init_xy=init,
        cfg=SolverConfig(robust="huber"))
    err_p = float(np.abs(np.asarray(xy_p) - np.asarray(true_xy)).max())
    err_r = float(np.abs(np.asarray(xy_r) - np.asarray(true_xy)).max())
    check("robust irls on tpu", err_r < err_p,
          f"plain={err_p:.3f}m huber={err_r:.3f}m")

    print(f"\n{'ALL PASS' if not failures else f'FAILURES: {failures}'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
