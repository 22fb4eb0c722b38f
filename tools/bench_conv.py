"""Why are the VAE's large-spatial convs at 17% MXU? Shape/layout sweep.

Times 3x3 convs at the VAE decoder's shapes against layout variants: batch
folded into height, 1x1-conv FLOP-equivalents, and the UNet's 64x64 shape as a
healthy control. All device-looped (output feeds next input), bf16.

Usage: python tools/bench_conv.py [--iters 5]
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


def bench_conv(x, w, k, iters, reps=8):
    pad = (k - 1) // 2

    @jax.jit
    def run(x, w):
        def body(_, h):
            return jax.lax.conv_general_dilated(
                h, w, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.fori_loop(0, reps, body, x)

    out = run(x, w)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(run(x, w))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    key = jax.random.PRNGKey(0)

    cases = [
        # (label, B, H, W, C, k)
        ("unet_ctrl 16x64x64x320 k3", 16, 64, 64, 320, 3),
        ("vae 4x256x256x256 k3", 4, 256, 256, 256, 3),
        ("vae folded 1x1024x256x256 k3", 1, 1024, 256, 256, 3),
        ("vae 4x256x256x256 k1", 4, 256, 256, 256, 1),
        ("vae 4x512x512x128 k3", 4, 512, 512, 128, 3),
        ("vae folded 1x2048x512x128 k3", 1, 2048, 512, 128, 3),
        ("vae 4x512x512x128 k1", 4, 512, 512, 128, 1),
        ("vae 4x128x128x512 k3", 4, 128, 128, 512, 3),
    ]
    for label, B, H, W, C, k in cases:
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, C, C), jnp.bfloat16)
        dt = bench_conv(x, w, k, args.iters)
        fl = 2 * B * H * W * C * C * k * k
        print(f"{label:32s} {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
