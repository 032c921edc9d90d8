import time, numpy as np, jax, jax.numpy as jnp
from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.ops import srp, xcorr, solver as solver_ops
from audio_triangulation_tpu.ops.pallas import gcc_kernel
from audio_triangulation_tpu.models import localizer as L
from audio_triangulation_tpu.utils import synth

mics = geometry.square_array(0.3)
cfg = PipelineConfig(phat=True, fft_pad_mode="circular")
loc = Localizer.create(mics, cfg)
p = loc.params
B = 16384
src = np.array([0.5,0.4,1.2]); src = src*1.2/np.linalg.norm(src)
one = synth.synth_scene(src, mics, noise_rms=0.01, seed=0)
fr = jax.device_put(jnp.asarray(np.tile(one.astype(np.float32),(B,1,1))))
pairs_t = tuple(tuple(int(v) for v in r) for r in np.asarray(p.pairs))

def t(name, f, *a, iters=10):
    ff = jax.jit(f)
    jax.block_until_ready(ff(*a))
    t0=time.perf_counter()
    for _ in range(iters): r = ff(*a)
    jax.block_until_ready(r)
    print(f"{name:26s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
    return r

corr = t("fused gcc", lambda q: gcc_kernel.fused_gcc(q, p.window, np.asarray(p.pairs), cfg, tile_b=64), fr)
sh = t("best_lag", lambda c: xcorr.best_lag(c, 46), corr)
ct = t("taper", lambda c: xcorr.peak_taper(c, 46), corr)
t("subsample", lambda c: xcorr.subsample_peak(c, 46), corr)
sc = t("srp matmul", lambda c: srp.srp_scores_matmul(c, p.onehot), ct)
xyg = t("grid_peak", lambda s: srp.grid_peak_xy(s, (101,101),(50,50),24.0), sc)
td = jnp.zeros((B,6), jnp.float32)
t("solver", lambda q, i: solver_ops.solve_tdoa_batched(q, p.mic_positions, p.pairs, speed_of_sound=343.0, height=1.2, init_xy=i), td, xyg)
t("FULL", lambda q: loc._jitted(p, q)["xy"], fr)
