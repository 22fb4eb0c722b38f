"""Why is the transformer proj_out dot 10x off peak in-model?

Times the UNet's skinny Dense shapes raw and with the in-model epilogues
(residual add, reshape to NHWC, fused GN moments) to find which fusion
combination degrades the [65536, 320] x [320, 320] dot to ~9 effective TFLOP/s
(profiler finding, BASELINE.md round-2 table).

Usage: python tools/bench_dots.py [--iters 5]
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


def bench(make_body, x, args_, iters=5, reps=16):
    body = make_body(*args_)

    @jax.jit
    def run(x, *args_):
        def step(_, h):
            return body(h).astype(x.dtype).reshape(x.shape)
        return jax.lax.fori_loop(0, reps, step, x)

    out = run(x, *args_)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(run(x, *args_))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    key = jax.random.PRNGKey(0)
    B, S, C = 16, 4096, 320
    x = jax.random.normal(key, (B, S, C), jnp.bfloat16)
    w = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.05
    res = jax.random.normal(key, (B, 64, 64, C), jnp.bfloat16)
    fl = 2 * B * S * C * C

    def raw(w):
        return lambda h: h @ w

    def with_residual(w, res):
        return lambda h: (h @ w).reshape(B, 64, 64, C) + res

    def with_gn_moments(w, res):
        def f(h):
            y = (h @ w).reshape(B, 64, 64, C) + res
            yf = y.astype(jnp.float32)
            s1 = jnp.sum(yf, axis=(1, 2))             # [B, C] fused GN moments
            s2 = jnp.sum(yf * yf, axis=(1, 2))
            return y + (s1[:, None, None] * 0 + s2[:, None, None] * 0).astype(y.dtype)
        return f

    for name, mk, extra in (("raw dot", raw, (w,)),
                            ("dot+reshape+residual", with_residual, (w, res)),
                            ("dot+res+gn_moments", with_gn_moments, (w, res))):
        dt = bench(mk, x, extra, iters=args.iters)
        print(f"{name:24s} {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF", flush=True)

    # GEGLU net_2 shape at the 32x32 level: [16*1024, 2560] x [2560, 640]
    M, K, N = 16 * 1024, 2560, 640
    a = jax.random.normal(key, (M, K), jnp.bfloat16)
    w2 = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02

    @jax.jit
    def run2(a, w2):
        def step(_, h):
            o = h @ w2                                 # [M, N]
            return jnp.concatenate([o] * (K // N), axis=-1).astype(a.dtype)
        return jax.lax.fori_loop(0, 16, step, a)

    out = run2(a, w2); sync(out)
    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter(); sync(run2(a, w2))
        ts.append((time.perf_counter() - t0) / 16)
    dt = min(ts)
    fl2 = 2 * M * K * N
    print(f"{'net_2 [16k,2560]x[2560,640]':24s} {dt*1e3:7.3f} ms  {fl2/dt/1e12:6.1f} TF",
          flush=True)


if __name__ == "__main__":
    main()
