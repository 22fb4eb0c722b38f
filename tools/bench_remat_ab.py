"""Remat-policy A/B in ONE process with interleaved timing blocks.

Cross-process A/Bs on the shared-tunnel chip confound the ~few-% run-to-run
drift with the ~1% policy effect; this driver compiles BOTH train steps
(default save-nothing remat vs dots_with_no_batch_dims_saveable) in the same
process, then times them in alternating blocks A B A B so drift cancels.
Memory stays at one optimizer state: the state pytree is threaded through
whichever step runs (structures are identical across policies).

Usage: python tools/bench_remat_ab.py [--iters 8] [--blocks 3]
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
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8, help="steps per block")
    p.add_argument("--blocks", type=int, default=3, help="blocks per policy")
    args = p.parse_args()

    from difashion_tpu.core.config import ModelConfig, TrainConfig
    from difashion_tpu.engine import TrainBatch, build_train_step
    from difashion_tpu.models import create_difashion

    cfg = ModelConfig.sd2_base()
    tcfg = TrainConfig(
        train_batch_size=2, gradient_checkpointing=True, use_8bit_adam=True,
    )

    B, olen, h, C = 2, 4, 64, 4
    batch = TrainBatch(
        images=None,
        latent_mean=jax.random.normal(jax.random.PRNGKey(1),
                                      (B, olen, h, h, C)) * 0.5,
        latent_logvar=jnp.full((B, olen, h, h, C), -6.0),
        input_ids=jnp.zeros((B, olen, 77), jnp.int32),
        hist_latents=jnp.zeros((B, olen, h, h, C)),
    )
    null_lat = jnp.zeros((h, h, C))
    null_text = jnp.zeros((77, cfg.text.hidden_size))

    steps = {}
    state = None
    for name, policy in (("default", None), ("dots_no_batch", "dots_no_batch")):
        model, params = create_difashion(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, remat=True,
            remat_policy=policy,
        )
        step_fn, init_fn = build_train_step(model, tcfg)
        if state is None:
            state = init_fn(params)
        del params
        steps[name] = jax.jit(step_fn, donate_argnums=(0,))
        t0 = time.time()
        state, m = steps[name](state, batch, null_lat, null_text,
                               jax.random.PRNGKey(2))
        float(m["loss"])   # host-transfer sync (axon block_until_ready lies)
        print(f"{name}: compiled+warm in {time.time()-t0:.0f}s", flush=True)

    def block(name, seed):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for i in range(args.iters):
            state, m = steps[name](state, batch, null_lat, null_text,
                                   jax.random.PRNGKey(seed + i))
        float(m["loss"])
        return (time.perf_counter() - t0) / args.iters

    results = {"default": [], "dots_no_batch": []}
    seed = 100
    for b in range(args.blocks):
        for name in ("default", "dots_no_batch"):
            dt = block(name, seed)
            seed += args.iters
            results[name].append(round(dt, 4))
            print(f"block {b} {name}: {dt:.4f} s/step", flush=True)

    summary = {
        "metric": "remat_policy_ab_train_step_s_bsz2_bf16_remat_adam8bit",
        "blocks": results,
        "best": {k: min(v) for k, v in results.items()},
        "median": {k: sorted(v)[len(v) // 2] for k, v in results.items()},
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
