"""Autotune the Pallas flash-attention kernel at the UNet's real shapes.

Sweeps (block_q, block_kv) for the self-attention levels (4096/1024 tokens) and
compares the cross-attention (77-token KV) path against plain XLA SDPA, printing
ms / TFLOP/s per config. The d=64 contraction caps the MXU at ~50% of bf16 peak
(98.5 TFLOP/s); the sweep measures how close each schedule gets to that ceiling.

Usage: python tools/bench_flash.py [--iters 5] [--case self64|self32|cross|all]
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

from difashion_tpu.nn.pallas.flash_attention import flash_attention


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def device_loop(fn, reps):
    def run(q, k, v):
        def body(_, h):
            return fn(h, k, v)
        return jax.lax.fori_loop(0, reps, body, q)
    return jax.jit(run)


def bench(fn, q, k, v, reps=16, iters=5):
    f = device_loop(fn, reps)
    out = f(q, k, v)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(q, k, v))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def attn_flops(b, h, sq, skv, d):
    return 4 * b * h * sq * skv * d


def bench_bwd(fn, q, k, v, reps=8, iters=5):
    """Time the full VJP (dq+dk+dv) of fn, device-looped to amortize RTT.

    Uses a RANDOM cotangent through jax.vjp — `grad(sum(fn(...)))` hands XLA a
    constant-ones dO that it constant-folds through the backward (dV = P^T @ 1
    collapses to row sums), making the XLA row look 2x faster than any real
    training step; an opaque Pallas custom-VJP can't be simplified that way, so
    the comparison would be meaningless."""
    do = jax.random.normal(jax.random.PRNGKey(9), q.shape, q.dtype)

    def one(q, k, v, do):
        def body(i, carry):
            # fold i into do so the cotangent can't be hoisted as loop-invariant
            d = do * (1.0 + 0.0 * i).astype(do.dtype)
            _, vjp = jax.vjp(fn, q, k, v)
            dq, dk, dv = vjp(d)
            return (carry[0] + dq, carry[1] + dk, carry[2] + dv)
        z = (jnp.zeros_like(q), jnp.zeros_like(k), jnp.zeros_like(v))
        return jax.lax.fori_loop(0, reps, body, z)
    f = jax.jit(one)
    sync(f(q, k, v, do)[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(q, k, v, do)[0])
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def run_bwd_case(name, b, h, sq, skv, d, blocks, iters):
    """Sweep (bwd_block_q, bwd_block_kv) with the production fwd schedule held
    fixed; the measured time includes fwd+dq+dkv (the VJP re-runs fwd), so only
    deltas between rows matter. Also times the XLA-autodiff SDPA for reference."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
    fl = 2.5 * attn_flops(b, h, sq, skv, d)   # bwd ~2.5x fwd FLOPs
    rows = []
    for (bq, bkv) in blocks:
        fn = functools.partial(flash_attention, bwd_block_q=bq, bwd_block_kv=bkv)
        dt = bench_bwd(fn, q, k, v, iters=iters)
        rows.append((f"vjp bwd_bq={bq} bwd_bkv={bkv}", dt))
        print(f"{name:8s} vjp bwd_bq={bq:4d} bwd_bkv={bkv:4d}: "
              f"{dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TFLOP/s(eff)", flush=True)
    dt = bench_bwd(xla_sdpa, q, k, v, iters=iters)
    rows.append(("xla sdpa vjp", dt))
    print(f"{name:8s} xla sdpa vjp          : {dt*1e3:7.3f} ms  "
          f"{fl/dt/1e12:6.1f} TFLOP/s(eff)", flush=True)
    best = min(rows, key=lambda r: r[1])
    print(f"{name:8s} BEST: {best[0]} ({best[1]*1e3:.3f} ms)", flush=True)


def xla_sdpa(q, k, v):
    import math
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def run_case(name, b, h, sq, skv, d, blocks, iters):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
    fl = attn_flops(b, h, sq, skv, d)
    rows = []
    for (bq, bkv) in blocks:
        fn = functools.partial(flash_attention, block_q=bq, block_kv=bkv)
        dt = bench(fn, q, k, v, iters=iters)
        rows.append((f"flash bq={bq} bkv={bkv}", dt))
        print(f"{name:8s} flash bq={bq:4d} bkv={bkv:4d}: "
              f"{dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TFLOP/s", flush=True)
    dt = bench(xla_sdpa, q, k, v, iters=iters)
    rows.append(("xla sdpa", dt))
    print(f"{name:8s} xla sdpa            : {dt*1e3:7.3f} ms  "
          f"{fl/dt/1e12:6.1f} TFLOP/s", flush=True)
    best = min(rows, key=lambda r: r[1])
    print(f"{name:8s} BEST: {best[0]} ({best[1]*1e3:.3f} ms)", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--case", default="all")
    p.add_argument("--bwd", action="store_true",
                   help="sweep the backward (dQ/dKV) schedules instead")
    args = p.parse_args()
    want = lambda c: args.case in ("all", c)

    if args.bwd:
        if want("self64"):   # the 68 ms/step train bucket lives here
            run_bwd_case("self64", 16, 5, 4096, 4096, 64,
                         [(512, 512), (256, 512), (1024, 512),
                          (512, 1024), (1024, 1024)],
                         args.iters)
        if want("self32"):
            run_bwd_case("self32", 16, 10, 1024, 1024, 64,
                         [(512, 512), (256, 512), (1024, 512), (1024, 1024)],
                         args.iters)
        if want("cross"):
            run_bwd_case("cross64", 16, 5, 4096, 77, 64,
                         [(512, 128), (1024, 128), (2048, 128)],
                         args.iters)
        return

    if want("self64"):   # UNet 64x64 level: B16 H5 S4096 D64
        run_case("self64", 16, 5, 4096, 4096, 64,
                 [(512, 512), (1024, 512), (1024, 1024), (2048, 512),
                  (1024, 2048), (4096, 512)],
                 args.iters)
    if want("self32"):   # 32x32 level: B16 H10 S1024 D64
        run_case("self32", 16, 10, 1024, 1024, 64,
                 [(256, 1024), (512, 512), (1024, 512), (1024, 1024)],
                 args.iters)
    if want("cross"):    # cross-attn: 77-token KV
        run_case("cross64", 16, 5, 4096, 77, 64,
                 [(512, 128), (2048, 128), (4096, 128)],
                 args.iters)
    if want("vae"):      # VAE mid attention: B4 H1 S4096 D512
        run_case("vae", 4, 1, 4096, 4096, 512,
                 [(256, 512), (256, 1024), (512, 512), (128, 1024)],
                 args.iters)


if __name__ == "__main__":
    main()
