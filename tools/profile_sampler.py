"""Capture a jax.profiler trace of the full-scale sampler (open with xprof/TensorBoard).

Usage: python tools/profile_sampler.py [--trace_dir /tmp/difashion_trace] [--steps 5]
Writes a trace of a short PNDM scan over the full SD2-base stack for kernel-level
inspection (MXU utilization, fusion boundaries, HBM traffic).
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace_dir", default="/tmp/difashion_trace")
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()

    from difashion_tpu.core.config import ModelConfig
    from difashion_tpu.core.logging import profile_trace
    from difashion_tpu.engine import (
        GenerationInputs, build_sampler, make_guidance_spec,
    )
    from difashion_tpu.models.difashion import create_difashion

    cfg = ModelConfig.sd2_base()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16)
    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = jax.jit(build_sampler(
        model, num_inference_steps=args.steps, spec=spec, eta=0.1
    ))

    F = 4
    key = jax.random.PRNGKey(1)
    inputs = GenerationInputs(
        init_latents=jax.random.normal(key, (F, 64, 64, 4)),
        outfit_idx=jnp.zeros(F, jnp.int32),
        known_latents=jnp.zeros((1, 4, 64, 64, 4)),
        gen_mask=jnp.ones((1, 4), bool),
        gen_index=jnp.arange(F, dtype=jnp.int32).reshape(1, 4),
        hist_latents=jnp.zeros((F, 64, 64, 4)),
        cate_text=jnp.zeros((F, 77, cfg.unet.cross_attention_dim)),
        null_text=jnp.zeros((77, cfg.unet.cross_attention_dim)),
        null_latent=jnp.zeros((64, 64, 4)),
    )
    # warmup/compile outside the trace window
    out = sampler(params, inputs)
    float(out[0, 0, 0, 0])
    with profile_trace(args.trace_dir):
        out = sampler(params, inputs)
        float(out[0, 0, 0, 0])
    print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
