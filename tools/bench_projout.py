"""A/B: transformer proj_in/proj_out as Dense-on-3D vs 1x1-conv-on-4D.

The profiler shows proj_out's dot fusion at 1.49 ms/block (vs 0.10 ms for the
same-shape to_out_0): the dot is fused with the relayout into the next conv's
NHWC tiled layout. A 1x1 convolution is numerically the same op but lets XLA
keep conv-native layouts on both sides. This benches a conv->GN->proj_in->
LN->proj_out->+res->conv sandwich both ways at the 64x64/c320 level, batch 16.

Usage: python tools/bench_projout.py [--iters 5]
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

from difashion_tpu.nn.pallas.groupnorm import group_norm_act


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def bench(run, args_, iters, reps=8):
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
    B, HW, C = 16, 64, 320
    dt_ = jnp.bfloat16
    x = jax.random.normal(key, (B, HW, HW, C), dt_)
    wc = jax.random.normal(key, (3, 3, C, C), dt_) * 0.02
    wi = jax.random.normal(key, (C, C), dt_) * 0.05
    wo = jax.random.normal(key, (C, C), dt_) * 0.05
    g = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv3(h, w):
        return jax.lax.conv_general_dilated(h, w, (1, 1), [(1, 1), (1, 1)],
                                            dimension_numbers=dn)

    def middle(h3):  # stand-in for the attention blocks: one LN round-trip
        h = h3 - jnp.mean(h3, axis=-1, keepdims=True)
        return h * jax.lax.rsqrt(jnp.mean(h * h, axis=-1, keepdims=True) + 1e-5)

    def dense_way(x, wc, wi, wo):
        def body(_, h):
            h = conv3(h, wc)
            res = h
            n = group_norm_act(h, g, b, 32, 1e-6, None)
            s = n.reshape(B, HW * HW, C)
            s = s @ wi
            s = middle(s)
            s = s @ wo
            h = s.reshape(B, HW, HW, C) + res
            return conv3(h, wc).astype(x.dtype)
        return jax.lax.fori_loop(0, 8, body, x)

    def conv1_way(x, wc, wi, wo):
        def body(_, h):
            h = conv3(h, wc)
            res = h
            n = group_norm_act(h, g, b, 32, 1e-6, None)
            s4 = jax.lax.conv_general_dilated(n, wi[None, None], (1, 1),
                                              [(0, 0), (0, 0)],
                                              dimension_numbers=dn)
            s = middle(s4.reshape(B, HW * HW, C))
            s4 = jax.lax.conv_general_dilated(
                s.reshape(B, HW, HW, C), wo[None, None], (1, 1),
                [(0, 0), (0, 0)], dimension_numbers=dn)
            h = s4 + res
            return conv3(h, wc).astype(x.dtype)
        return jax.lax.fori_loop(0, 8, body, x)

    for name, fn in (("dense-3D", dense_way), ("conv1x1-4D", conv1_way)):
        dt = bench(jax.jit(fn), (x, wc, wi, wo), args.iters)
        print(f"{name:12s} sandwich: {dt*1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
