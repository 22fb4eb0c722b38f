"""Capture a jax.profiler trace of the full-scale TRAIN step (open with xprof).

Usage: python tools/profile_train.py [--trace_dir /tmp/difashion_train_trace]
       [--steps 4] [--batch 2]
Writes a trace of a few jitted train steps (loss fwd + bwd + AdamW(8bit) + EMA,
bf16 + remat — the run_eta0.1.sh configuration) on the full SD2-base stack, for
the per-phase MFU breakdown in BASELINE.md (analyze with tools/analyze_trace.py).
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
    p.add_argument("--trace_dir", default="/tmp/difashion_train_trace")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()

    from difashion_tpu.core.config import ModelConfig, TrainConfig
    from difashion_tpu.core.logging import profile_trace
    from difashion_tpu.engine import TrainBatch, build_train_step
    from difashion_tpu.models import create_difashion

    cfg = ModelConfig.sd2_base()
    tcfg = TrainConfig(
        train_batch_size=args.batch,
        gradient_checkpointing=True,
        use_8bit_adam=True,
    )
    model, params = create_difashion(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, remat=True
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
    float(m["loss"])  # tunnel-safe sync (block_until_ready returns early)

    with profile_trace(args.trace_dir):
        for i in range(args.steps):
            state, m = jitted(state, batch, null_lat, null_text,
                              jax.random.PRNGKey(3 + i))
        float(m["loss"])
    print("trace written to", args.trace_dir)


if __name__ == "__main__":
    main()
