"""Per-stage timing of the VAE decoder (the 22-TFLOP/s outlier in bench_phases).

Times each decoder stage at its true in-decode shape (batch 4, bf16) to locate
where the 223 ms goes: mid-block attention (4096 tokens, d=512), the 512-channel
64/128 levels, the bandwidth-heavy 256/512-px levels, or the GroupNorms.

Usage: python tools/bench_vae.py [--iters 5] [--batch 4]
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

from difashion_tpu.nn.attention import VAEAttention
from difashion_tpu.nn.layers import GroupNorm, ResnetBlock2D, Upsample2D


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, p, x, iters=5, reps=16):
    """Chains `reps` shape-preserving applications in ONE dispatch so the ~30 ms
    tunnel RTT amortizes away (same trick as tools/bench_phases.device_loop)."""

    @jax.jit
    def run(p, x):
        def body(_, h):
            return fn(p, h).astype(x.dtype)
        return jax.lax.fori_loop(0, reps, body, x)

    out = run(p, x)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(run(p, x))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def conv_flops(b, h, w, cin, cout, k=3):
    return 2 * b * h * w * cin * cout * k * k


def report(name, dt, flops=None, nbytes=None):
    parts = [f"{name:26s} {dt*1e3:8.2f} ms"]
    if flops:
        parts.append(f"{flops/dt/1e12:6.1f} TFLOP/s")
    if nbytes:
        parts.append(f"{nbytes/dt/1e9:6.1f} GB/s")
    print("  ".join(parts), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()
    B = args.batch
    key = jax.random.PRNGKey(0)
    dt_ = jnp.bfloat16

    # stage resolutions/channels of the SD VAE decoder (rev = 512,512,256,128)
    stages = [
        ("res_64x64_c512", 64, 512, 3),
        ("res_128x128_c512", 128, 512, 3),
        ("res_256x256_c256", 256, 256, 3),
        ("res_512x512_c128", 512, 128, 3),
    ]
    for name, hw, ch, n in stages:
        x = jax.random.normal(key, (B, hw, hw, ch), dt_)
        blk = ResnetBlock2D(ch, use_time_emb=False, epsilon=1e-6, dtype=dt_)
        bp = blk.init(key, x)["params"]
        t = timeit(lambda p_, x_: blk.apply({"params": p_}, x_), bp, x,
                   iters=args.iters)
        fl = 2 * conv_flops(B, hw, hw, ch, ch)
        report(f"{name} (x{n})", t, flops=fl, nbytes=6 * B * hw * hw * ch * 2)

    # GroupNorm alone at the big levels
    for hw, ch in ((256, 256), (512, 128)):
        x = jax.random.normal(key, (B, hw, hw, ch), dt_)
        gn = GroupNorm(32, 1e-6, dtype=dt_, act="silu")
        gp = gn.init(key, x)["params"]
        t = timeit(lambda p_, x_: gn.apply({"params": p_}, x_), gp, x,
                   iters=args.iters)
        report(f"gn_silu_{hw}x{hw}_c{ch}", t, nbytes=2 * B * hw * hw * ch * 2)

    # mid attention: 4096 tokens, single head d=512
    x = jax.random.normal(key, (B, 64, 64, 512), dt_)
    att = VAEAttention(512, dtype=dt_)
    ap = att.init(key, x)["params"]
    t = timeit(lambda p_, x_: att.apply({"params": p_}, x_), ap, x,
               iters=args.iters)
    report("mid_attn_4096tok_d512", t, flops=4 * B * 4096 * 4096 * 512)

    # upsample convs (chained with a 2x2 mean-pool to keep the loop shape-stable;
    # the pool is bandwidth-trivial next to the conv)
    for hw, ch in ((64, 512), (128, 512), (256, 256)):
        x = jax.random.normal(key, (B, hw, hw, ch), dt_)
        up = Upsample2D(ch, dtype=dt_)
        upp = up.init(key, x)["params"]

        def up_pool(p_, x_):
            y = up.apply({"params": p_}, x_)
            b, h2, w2, c = y.shape
            return y.reshape(b, h2 // 2, 2, w2 // 2, 2, c).mean((2, 4))

        t = timeit(up_pool, upp, x, iters=args.iters)
        fl = conv_flops(B, hw * 2, hw * 2, ch, ch)
        report(f"upsample_{hw}to{hw*2}_c{ch}(+pool)", t, flops=fl)


if __name__ == "__main__":
    main()
