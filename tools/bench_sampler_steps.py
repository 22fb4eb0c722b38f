"""Differential sampler benchmark: per-step cost from T(n2_steps) - T(n1_steps).

The single-chip numbers through the axon tunnel carry ~30 ms RTT and visible
run-to-run variance; timing the SAME jitted scan at two lengths and differencing
cancels every fixed cost (dispatch, RTT, warmup, init) and yields a stable
ms/denoise-step — the quantity that actually sets outfit-images/sec.

Usage: python tools/bench_sampler_steps.py [--n1 5 --n2 15 --iters 5] [--decode]
Prints one JSON line per measurement.
"""
import argparse
import json
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


def build(n_steps, model, params, text_params, B=1, scheduler="pndm"):
    from difashion_tpu.engine import (
        GenerationInputs, build_sampler, make_guidance_spec,
    )

    olen = 4
    F = B * olen
    key = jax.random.PRNGKey(42)
    inputs = GenerationInputs(
        init_latents=jax.random.normal(key, (F, 64, 64, 4)),
        outfit_idx=jnp.repeat(jnp.arange(B, dtype=jnp.int32), olen),
        known_latents=jnp.zeros((B, olen, 64, 64, 4)),
        gen_mask=jnp.ones((B, olen), bool),
        gen_index=jnp.arange(F, dtype=jnp.int32).reshape(B, olen),
        hist_latents=jnp.zeros((F, 64, 64, 4)),
        cate_text=jnp.zeros((F, 77, 1024)),
        null_text=jnp.zeros((77, 1024)),
        null_latent=jnp.zeros((64, 64, 4)),
    )
    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = jax.jit(build_sampler(
        model, num_inference_steps=n_steps, spec=spec, eta=0.1,
        scheduler=scheduler,
    ))
    return sampler, inputs


def timed(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]  # median


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n1", type=int, default=5)
    p.add_argument("--n2", type=int, default=15)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--outfits", type=int, default=1)
    p.add_argument("--decode", action="store_true")
    p.add_argument("--bf16_params", action="store_true",
                   help="pre-cast all params to bf16 (serving mode) instead of "
                        "casting fp32 masters inside the step")
    p.add_argument("--scheduler", default="pndm",
                   choices=["pndm", "ddim", "dpmpp"])
    p.add_argument("--label", default="")
    args = p.parse_args()

    from difashion_tpu.core.config import ModelConfig
    from difashion_tpu.models.difashion import create_difashion

    cfg = ModelConfig.sd2_base()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16)
    if args.bf16_params:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params,
        )

    s1, inputs = build(args.n1, model, params, None, B=args.outfits,
                       scheduler=args.scheduler)
    s2, _ = build(args.n2, model, params, None, B=args.outfits,
                  scheduler=args.scheduler)
    t1 = timed(s1, params, inputs, iters=args.iters)
    t2 = timed(s2, params, inputs, iters=args.iters)
    per_step = (t2 - t1) / (args.n2 - args.n1)
    F = args.outfits * 4
    # extrapolate the 51-iteration north-star sampler (fixed overhead = t1 - n1*step)
    # PNDM runs n+1 scan iterations (corrector re-run); DDIM/DPM++ run n
    iters_of = (lambda n: n + 1) if args.scheduler == "pndm" else (lambda n: n)
    fixed = t1 - iters_of(args.n1) * per_step
    t51 = fixed + 51 * per_step
    print(json.dumps({
        "label": args.label,
        "scheduler": args.scheduler,
        "serving_20step_img_per_sec": round(F / (fixed + iters_of(20) * per_step), 4),
        "per_step_ms": round(per_step * 1e3, 2),
        "t_n1_ms": round(t1 * 1e3, 1),
        "t_n2_ms": round(t2 * 1e3, 1),
        "fixed_ms": round(fixed * 1e3, 1),
        "extrapolated_50step_img_per_sec": round(F / t51, 4),
        "unet_batch": F * 4,
    }))

    if args.decode:
        from difashion_tpu.engine import decode_and_postprocess

        lat = s1(params, inputs)
        dec = jax.jit(lambda p, l: decode_and_postprocess(model, p, l))
        td = timed(dec, params, lat, iters=args.iters)
        print(json.dumps({"label": args.label + ":vae_decode_b4",
                          "ms": round(td * 1e3, 1)}))


if __name__ == "__main__":
    main()
