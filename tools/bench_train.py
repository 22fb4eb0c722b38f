"""Training-step throughput bench on the full SD2-base-scale stack.

Measures the jitted DiFashion train step (loss + grads + AdamW + EMA, bf16 compute,
batch = 2 outfits x 4 items, precomputed-moments fast path — the run_eta0.1.sh
configuration) on the available devices. Prints one JSON line; results recorded in
BASELINE.md.

Usage: python tools/bench_train.py [--batch 2] [--iters 3] [--remat]
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

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_policy", choices=["dots", "dots_no_batch"],
                   default=None,
                   help="checkpoint policy A/B: save MXU outputs at remat "
                        "boundaries instead of recomputing everything")
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--adam8bit", action="store_true")
    p.add_argument("--no_ema", action="store_true")
    args = p.parse_args()

    from difashion_tpu.core.config import ModelConfig, TrainConfig
    from difashion_tpu.engine import TrainBatch, build_train_step
    from difashion_tpu.models import create_difashion

    cfg = ModelConfig.sd2_base()
    tcfg = TrainConfig(
        train_batch_size=args.batch,
        gradient_accumulation_steps=args.accum,
        gradient_checkpointing=args.remat,
        use_8bit_adam=args.adam8bit,
        use_ema=not args.no_ema,
        use_ema_fashion=not args.no_ema,
    )
    model, params = create_difashion(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, remat=args.remat,
        remat_policy=args.remat_policy,
    )
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)

    B, olen, h, C = args.batch, 4, 64, 4
    key = jax.random.PRNGKey(1)
    batch = TrainBatch(
        images=None,
        latent_mean=jax.random.normal(key, (B, olen, h, h, C)) * 0.5,
        latent_logvar=jnp.full((B, olen, h, h, C), -6.0),
        input_ids=jnp.zeros((B, olen, 77), jnp.int32),
        hist_latents=jnp.zeros((B, olen, h, h, C)),
    )
    null_lat = jnp.zeros((h, h, C))
    null_text = jnp.zeros((77, cfg.text.hidden_size))

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    state, m = jitted(state, batch, null_lat, null_text, jax.random.PRNGKey(2))
    # float() forces a host transfer: the remote backend's block_until_ready
    # resolves before execution completes, so sync on the value instead.
    float(m["loss"])

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, m = jitted(state, batch, null_lat, null_text,
                          jax.random.PRNGKey(3 + i))
    final_loss = float(m["loss"])   # chain-dependent: waits for all steps
    dt = (time.perf_counter() - t0) / args.iters

    n_chips = jax.device_count()
    print(json.dumps({
        "metric": "train_step_time_s_bsz%d_bf16%s%s" % (
            args.batch, "_remat" if args.remat else "",
            "_adam8bit" if args.adam8bit else "",
        ),
        "value": round(dt, 4),
        "unit": "s/step",
        "images_per_sec_per_chip": round(B * olen / dt / n_chips, 3),
        "loss": final_loss,
    }))


if __name__ == "__main__":
    main()
