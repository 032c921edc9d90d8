"""Microbenchmark: is an int8 MXU matmul actually faster than f32/bf16 at
the fused-GCC kernel's shapes on this chip?

The fused kernel's MXU work per grid step is two [TB*M, N] @ [N, F] DFT
matmuls; this tool runs that shape as a standalone Pallas kernel over the
same grid in each dtype and reports ms/iter, to decide whether an int8
end-to-end numerics mode can pay before building it (docs/PERFORMANCE.md
"known headroom").

Timing methodology (the axon tunnel defeats naive loops, see
docs/PERFORMANCE.md roofline notes): AOT-compile a fori_loop whose carry
feeds a scalar perturbation INTO the kernel (so iterations are sequential
and non-cacheable), run once per iteration count, and fence with a real
scalar fetch; report the slope between two iteration counts so constant
costs (connection, RTT, compile) cancel.
"""

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s_ref, x_ref, w1_ref, w2_ref, out_ref, *, acc_dtype):
    # carry-dependent input: the loop cannot collapse.  s is always int32/
    # f32 (Mosaic can't vector.extract an i8 scalar) and cast to x's dtype.
    x = x_ref[:] + s_ref[0].astype(x_ref.dtype)
    a = jnp.dot(x, w1_ref[:], preferred_element_type=acc_dtype)
    b = jnp.dot(x, w2_ref[:], preferred_element_type=acc_dtype)
    out_ref[:] = (a + b).astype(out_ref.dtype)


def build(dtype_name, rows, n, f, grid, iters):
    if dtype_name == "int8":
        in_dtype, acc, out_dtype = jnp.int8, jnp.int32, jnp.int32
        x = jnp.asarray(
            np.random.randint(-64, 64, (grid * rows, n)), jnp.int8)
        w = jnp.asarray(np.random.randint(-127, 128, (n, f)), jnp.int8)
    else:
        in_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
        acc = out_dtype = jnp.float32
        x = jnp.asarray(np.random.randn(grid * rows, n), in_dtype)
        w = jnp.asarray(np.random.randn(n, f), in_dtype)

    call = pl.pallas_call(
        functools.partial(_kernel, acc_dtype=acc),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scalar perturbation
            pl.BlockSpec((rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * rows, f), out_dtype),
    )

    carry_dtype = jnp.int32 if dtype_name == "int8" else jnp.float32

    def chained(x_, w_):
        def body(_, s):
            out = call(s, x_, w_, w_)
            return (out[:1, 0] % jnp.asarray(3, out.dtype)).astype(
                carry_dtype)
        return jax.lax.fori_loop(
            0, iters, body, jnp.zeros((1,), carry_dtype))

    return jax.jit(chained).lower(x, w).compile(), x, w


def run(dtype_name, rows, n, f, grid, iters_lo, iters_hi):
    times = {}
    for iters in (iters_lo, iters_hi):
        comp, x, w = build(dtype_name, rows, n, f, grid, iters)
        r = comp(x, w)
        float(r[0])  # warm the connection/compile path with a real fetch
        t0 = time.perf_counter()
        r = comp(x, w)
        float(r[0])
        times[iters] = time.perf_counter() - t0
    dt = (times[iters_hi] - times[iters_lo]) / (iters_hi - iters_lo)
    flops = 2 * 2 * grid * rows * n * f
    print(f"{dtype_name:>5}: {dt * 1e3:8.3f} ms/iter  "
          f"{flops / dt / 1e12:7.1f} T(FL)OPS")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)   # TB*M = 64*4
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--f", type=int, default=512)
    ap.add_argument("--grid", type=int, default=256)   # B=16384 / 64
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()
    for d in ("f32", "bf16", "int8"):
        try:
            run(d, args.rows, args.n, args.f, args.grid,
                args.iters, 2 * args.iters)
        except Exception as e:  # noqa: BLE001 - report + continue the sweep
            print(f"{d:>5}: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
