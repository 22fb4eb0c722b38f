"""Pure MXU dot/conv throughput, bf16 vs int8, without requantize pollution.

bench_int8.py chains ops through a requantize (clip//shift + astype) so each
iteration pays an elementwise pass over an int32 tensor; that hides the MXU
ratio. Here: N independent ops with distinct weights, outputs summed once at
the end — XLA cannot elide any op, there is no per-op epilogue, and the only
overhead is streaming the weights (overlappable).

Usage: python tools/bench_int8_pure.py [--iters 5]
"""
import argparse
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


def bench(f, *args, iters=5):
    sync(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_dots(a, ws, acc):
    @jax.jit
    def f(a, ws):
        o = None
        for i in range(ws.shape[0]):
            d = jax.lax.dot_general(a, ws[i], (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc)
            o = d if o is None else o + d
        return o
    return f


def run_convs(x, ws, acc):
    @jax.jit
    def f(x, ws):
        o = None
        for i in range(ws.shape[0]):
            d = jax.lax.conv_general_dilated(
                x, ws[i], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            o = d if o is None else o + d
        return o
    return f


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    key = jax.random.PRNGKey(0)

    M, K, N, REP = 8192, 1280, 1280, 64
    fl = 2 * M * K * N * REP
    for name, dt_, acc in (("bf16", jnp.bfloat16, jnp.float32),
                           ("int8", jnp.int8, jnp.int32)):
        if dt_ == jnp.int8:
            a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
            ws = jax.random.randint(key, (REP, K, N), -127, 127, jnp.int8)
        else:
            a = jax.random.normal(key, (M, K), dt_)
            ws = jax.random.normal(key, (REP, K, N), dt_)
        t = bench(run_dots(a, ws, acc), a, ws, iters=args.iters)
        print(f"dot  {name}: {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} "
              f"T{'OP' if dt_ == jnp.int8 else 'FLOP'}/s", flush=True)

    B, HW, C, REP = 16, 64, 320, 32
    fl = 2 * B * HW * HW * C * C * 9 * REP
    for name, dt_, acc in (("bf16", jnp.bfloat16, jnp.float32),
                           ("int8", jnp.int8, jnp.int32)):
        if dt_ == jnp.int8:
            x = jax.random.randint(key, (B, HW, HW, C), -127, 127, jnp.int8)
            ws = jax.random.randint(key, (REP, 3, 3, C, C), -127, 127, jnp.int8)
        else:
            x = jax.random.normal(key, (B, HW, HW, C), dt_)
            ws = jax.random.normal(key, (REP, 3, 3, C, C), dt_)
        t = bench(run_convs(x, ws, acc), x, ws, iters=args.iters)
        print(f"conv {name}: {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} "
              f"T{'OP' if dt_ == jnp.int8 else 'FLOP'}/s", flush=True)


if __name__ == "__main__":
    main()
