"""Capture a jax.profiler trace of the VAE decode (latents -> 512px images).

Usage: python tools/profile_vae.py [--trace_dir /tmp/difashion_vae_trace] [--reps 3]
The decode runs at 22 TFLOP/s (227 ms per 4 images, BASELINE.md) — ~4% of the
50-step path but ~10% of the 20-step DPM++ serving path. This traces the jitted
decode_and_postprocess to find which 512^2-level ops are off the conv ceiling.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace_dir", default="/tmp/difashion_vae_trace")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from difashion_tpu.core.config import ModelConfig
    from difashion_tpu.core.logging import profile_trace
    from difashion_tpu.engine import decode_and_postprocess
    from difashion_tpu.models.difashion import create_difashion

    cfg = ModelConfig.sd2_base()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 4))

    jitted = jax.jit(lambda p, l: decode_and_postprocess(model, p, l))
    imgs = jitted(params, lat)
    float(imgs[0, 0, 0, 0])  # tunnel-safe sync

    with profile_trace(args.trace_dir):
        for _ in range(args.reps):
            imgs = jitted(params, lat)
        float(imgs[0, 0, 0, 0])
    print("trace written to", args.trace_dir)


if __name__ == "__main__":
    main()
