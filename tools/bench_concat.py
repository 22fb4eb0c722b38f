"""Cost of the up-path skip concatenation (lane-dim concat at C=320/640/1280).

C=320 is 2.5 lane tiles: concatenating [.., 320]+[.., 320] on the channel (lane)
axis needs a 64-lane shift relayout of the second operand. Measures concat-as-is
vs the split-conv alternative (two convs summed, no concat) at the UNet's up-block
shapes, batch 16 bf16.

Usage: python tools/bench_concat.py [--iters 5]
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


def bench(run, args_, reps, iters):
    out = run(*args_)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(run(*args_))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    key = jax.random.PRNGKey(0)
    B = 16
    for hw, c in ((64, 320), (32, 640), (16, 1280)):
        h = jax.random.normal(key, (B, hw, hw, c), jnp.bfloat16)
        s = jax.random.normal(key, (B, hw, hw, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 2 * c, c), jnp.bfloat16)
        reps = 16

        @jax.jit
        def concat_conv(h, s, w):
            def body(_, x):
                cat = jnp.concatenate([x, s], axis=-1)
                return jax.lax.conv_general_dilated(
                    cat, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            return jax.lax.fori_loop(0, reps, body, h)

        @jax.jit
        def split_conv(h, s, w):
            w1, w2 = w[:, :, :c, :], w[:, :, c:, :]
            def body(_, x):
                a = jax.lax.conv_general_dilated(
                    x, w1, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                b = jax.lax.conv_general_dilated(
                    s, w2, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return a + b
            return jax.lax.fori_loop(0, reps, body, h)

        fl = 2 * B * hw * hw * 2 * c * c * 9
        t1 = bench(concat_conv, (h, s, w), reps, args.iters)
        t2 = bench(split_conv, (h, s, w), reps, args.iters)
        print(f"{hw}x{hw} c{c}: concat+conv {t1*1e3:7.3f} ms ({fl/t1/1e12:5.1f} TF)"
              f"  split-conv {t2*1e3:7.3f} ms ({fl/t2/1e12:5.1f} TF)", flush=True)


if __name__ == "__main__":
    main()
