"""Per-phase MFU breakdown of the sampler's hot path on the real chip.

Times each building block at its true in-sampler shape (UNet batch 16 = 4 CFG
branches x 4 fill slots, bf16) and prints a table of ms / TFLOP/s / %MXU-peak /
GB/s, the measurement VERDICT round-1 asked to publish in BASELINE.md.

Usage: python tools/bench_phases.py [--iters 10] [--phase all|unet|blocks|gn|vae]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def sync(x):
    # the axon remote backend's block_until_ready can return early; a host
    # transfer is the reliable sync (ROUND1_NOTES.md)
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        sync(out)
    return (time.perf_counter() - t0) / iters, out


def device_loop(apply_fn, reps: int = 32):
    """Chain `reps` shape-preserving applications inside ONE dispatch: per-op time
    is then (total - RTT)/reps instead of being swamped by the ~30 ms axon
    round-trip per call."""

    def run(p, x, *rest):
        def body(_, h):
            return apply_fn(p, h, *rest)

        return jax.lax.fori_loop(0, reps, body, x)

    return jax.jit(run)


def timeit_device(apply_fn, p, x, *rest, reps=32, iters=3):
    f = device_loop(apply_fn, reps)
    out = f(p, x, *rest)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(p, x, *rest)
        sync(out)
    total = (time.perf_counter() - t0) / iters
    return total / reps, out


def report(name, dt, flops=None, bytes_moved=None):
    row = {"phase": name, "ms": round(dt * 1e3, 3)}
    if flops:
        row["tflops"] = round(flops / dt / 1e12, 1)
        row["pct_mxu_peak"] = round(100 * flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS, 1)
    if bytes_moved:
        row["gbps"] = round(bytes_moved / dt / 1e9, 1)
        row["pct_hbm_peak"] = round(100 * bytes_moved / dt / 1e9 / V5E_HBM_GBPS, 1)
    print(json.dumps(row))
    return row


def conv_flops(b, h, w, cin, cout, k=3):
    return 2 * b * h * w * cin * cout * k * k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--phase", default="all")
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()
    want = lambda k: args.phase in ("all", k)

    from difashion_tpu.core.config import ModelConfig
    from difashion_tpu.models.unet import UNet2DCondition
    from difashion_tpu.nn.attention import Transformer2D
    from difashion_tpu.nn.layers import GroupNorm, ResnetBlock2D

    cfg = ModelConfig.sd2_base()
    dt_ = jnp.bfloat16
    B = args.batch
    key = jax.random.PRNGKey(0)

    if want("unet"):
        unet = UNet2DCondition(cfg.unet, dtype=dt_)
        x = jax.random.normal(key, (B, 64, 64, 8), dt_)
        t = jnp.full((B,), 500, jnp.int32)
        ctx = jax.random.normal(key, (B, 77, 1024), dt_)
        params = jax.jit(unet.init)(key, x, t, ctx)["params"]

        def unet_chained(p, x8, t, c):
            out = unet.apply({"params": p}, x8, t, c)        # [B,64,64,4]
            return jnp.concatenate([out, out], axis=-1)       # feed back as 8ch

        dt, _ = timeit_device(unet_chained, params, x, t, ctx, reps=8,
                              iters=args.iters // 3 + 1)
        # ~0.75 TFLOP per image-forward at 64x64 latents (BASELINE.md)
        report(f"unet_fwd_b{B}", dt, flops=0.75e12 * B)

    if want("blocks"):
        # one ResNet block + one SpatialTransformer at each UNet level
        for (hw, ch, heads) in ((64, 320, 5), (32, 640, 10), (16, 1280, 20),
                                (8, 1280, 20)):
            x = jax.random.normal(key, (B, hw, hw, ch), dt_)
            temb = jax.random.normal(key, (B, 1280), dt_)
            blk = ResnetBlock2D(out_channels=ch, dtype=dt_)
            bp = blk.init(key, x, temb)["params"]
            dt, _ = timeit_device(
                lambda p, x, t: blk.apply({"params": p}, x, t), bp, x, temb,
                reps=32, iters=args.iters // 3 + 1,
            )
            fl = 2 * conv_flops(B, hw, hw, ch, ch)
            report(f"resnet_{hw}x{hw}_c{ch}", dt, flops=fl,
                   bytes_moved=6 * B * hw * hw * ch * 2)

            st = Transformer2D(
                heads=heads, head_dim=ch // heads, depth=1,
                context_dim=cfg.unet.cross_attention_dim,
                use_linear_projection=cfg.unet.use_linear_projection,
                dtype=dt_,
            )
            ctx = jax.random.normal(key, (B, 77, 1024), dt_)
            sp = st.init(key, x, ctx)["params"]
            dt, _ = timeit_device(
                lambda p, x, c: st.apply({"params": p}, x, c), sp, x, ctx,
                reps=32, iters=args.iters // 3 + 1,
            )
            s = hw * hw
            # qkvo projections + self attn + cross attn + GEGLU ff
            fl = (2 * B * s * ch * ch * 4              # self qkvo
                  + 2 * B * s * ch * ch * 2 + 2 * B * s * 77 * ch * 2  # cross q,o + kv
                  + 4 * B * s * s * ch                 # self attention scores+out
                  + 4 * B * s * 77 * ch                # cross attention
                  + 2 * B * s * ch * ch * 8)           # GEGLU (4d*2) + proj back
            report(f"transformer_{hw}x{hw}_c{ch}", dt, flops=fl)

    if want("gn"):
        for (hw, ch) in ((64, 320), (32, 640), (16, 1280)):
            x = jax.random.normal(key, (B, hw, hw, ch), dt_)
            for fused in (False, True):
                gn = GroupNorm(32, 1e-5, dtype=dt_, act="silu" if fused else None)
                gp = gn.init(key, x)["params"]
                if fused:
                    fn = lambda p, x: gn.apply({"params": p}, x)
                else:
                    fn = lambda p, x: jax.nn.silu(gn.apply({"params": p}, x))
                dt, _ = timeit_device(fn, gp, x, reps=64,
                                      iters=args.iters // 3 + 1)
                nbytes = B * hw * hw * ch * 2
                report(f"gn_silu_{hw}x{hw}_c{ch}_{'pallas' if fused else 'xla'}",
                       dt, bytes_moved=2 * nbytes)

    if want("vae"):
        from difashion_tpu.models.vae import AutoencoderKL

        vae = AutoencoderKL(cfg.vae, dtype=dt_)
        z = jax.random.normal(key, (4, 64, 64, 4), dt_)
        vp = jax.jit(vae.init)({"params": key}, jnp.zeros((1, 512, 512, 3), dt_),
                               key)["params"]
        f = jax.jit(lambda p, z: vae.apply({"params": p}, z,
                                           method=AutoencoderKL.decode))
        dt, _ = timeit(f, vp, z, iters=max(2, args.iters // 2))
        report("vae_decode_b4", dt, flops=4 * 1.25e12)


if __name__ == "__main__":
    main()
