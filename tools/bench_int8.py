"""Feasibility micro-bench: does int8 x int8 -> int32 reach ~2x bf16 on this chip?

v5e's MXU lists 394 TOPS int8 vs 197 TFLOP/s bf16. If XLA lowers int8
dot_general/conv to the native int8 MXU path, a quantized UNet serving mode is
worth building; if it silently upcasts, it is not. Shapes mirror the UNet's hot
ops (64x64-level conv, transformer projections, GEGLU).

Usage: python tools/bench_int8.py [--iters 5]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def device_loop_dot(a, b, acc_dtype, reps=32):
    # the output FEEDS the next iteration's lhs (same [M, K=N] shape): XLA can't
    # narrow the dot through an output slice (a `o[:1,:1]` probe gets rewritten
    # to a 1-row dot, inflating TFLOP/s ~6x — measured)
    dt = a.dtype

    @jax.jit
    def run(a, b):
        def body(_, h):
            o = jax.lax.dot_general(h, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_dtype)
            if dt == jnp.int8:
                o = jnp.clip(o // 1024, -127, 127)
            return o.astype(dt)
        return jax.lax.fori_loop(0, reps, body, a)
    return run


def device_loop_conv(x, w, acc_dtype, reps=16):
    dt = x.dtype

    @jax.jit
    def run(x, w):
        def body(_, h):
            o = jax.lax.conv_general_dilated(
                h, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dtype,
            )
            if dt == jnp.int8:
                o = jnp.clip(o // 4096, -127, 127)
            return o.astype(dt)
        return jax.lax.fori_loop(0, reps, body, x)
    return run


def bench(run, a, b, reps, iters):
    out = run(a, b)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(run(a, b))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    key = jax.random.PRNGKey(0)

    # --- dot: transformer-projection shape [65536, 1280] x [1280, 1280] --------
    M, K, N = 65536, 1280, 1280
    fl = 2 * M * K * N
    for name, dt_, acc in (("bf16", jnp.bfloat16, jnp.float32),
                           ("int8", jnp.int8, jnp.int32)):
        if dt_ == jnp.int8:
            a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
            b = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        else:
            a = jax.random.normal(key, (M, K), dt_)
            b = jax.random.normal(key, (K, N), dt_)
        dt = bench(device_loop_dot(a, b, acc), a, b, 32, args.iters)
        print(f"dot {name}: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} T{'OP' if dt_==jnp.int8 else 'FLOP'}/s",
              flush=True)

    # --- conv: 64x64-level UNet conv [16, 64, 64, 320] x 3x3x320x320 -----------
    B, HW, C = 16, 64, 320
    fl = 2 * B * HW * HW * C * C * 9
    for name, dt_, acc in (("bf16", jnp.bfloat16, jnp.float32),
                           ("int8", jnp.int8, jnp.int32)):
        if dt_ == jnp.int8:
            x = jax.random.randint(key, (B, HW, HW, C), -127, 127, jnp.int8)
            w = jax.random.randint(key, (3, 3, C, C), -127, 127, jnp.int8)
        else:
            x = jax.random.normal(key, (B, HW, HW, C), dt_)
            w = jax.random.normal(key, (3, 3, C, C), dt_)
        dt = bench(device_loop_conv(x, w, acc), x, w, 16, args.iters)
        print(f"conv {name}: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} T{'OP' if dt_==jnp.int8 else 'FLOP'}/s",
              flush=True)


if __name__ == "__main__":
    main()
