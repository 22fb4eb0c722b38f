"""Inference driver CLI: FITB / GOR generation for evaluation.

Equivalent of `python inf4eval.py --task {FITB,GOR} --mode {valid,test}`
(`/root/reference/DiFashion/inf4eval.py:369-771`): loads a checkpoint, copies the EMA
weights into the live model (`inf4eval.py:691-697`), runs the generation pipeline over
the chosen split, and writes the JPEG tree + manifests with the reference's run naming
`<TASK>-checkpoint-<step>-cate<cs>-mutual<ms>-hist<hs>`.
"""
from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from difashion_tpu.core.checkpoint import CheckpointStore
from difashion_tpu.core.config import Config
from difashion_tpu.core.logging import setup_logging
from difashion_tpu.data.datasets import FashionData, HistLatentStore
from difashion_tpu.data.precompute import load_processed
from difashion_tpu.data.tokenizer import load_tokenizer
from difashion_tpu.engine.pipeline import GenerationPipeline
from difashion_tpu.engine.train import build_train_step
from difashion_tpu.models.difashion import create_difashion


def load_model_for_inference(cfg: Config, ckpt_dir: str,
                             step: Optional[int] = None, use_ema: bool = True):
    """Build the model, restore a checkpoint, and swap EMA weights in."""
    model, params = create_difashion(
        cfg.model, jax.random.PRNGKey(cfg.train.seed),
        dtype=jnp.bfloat16 if cfg.train.mixed_precision == "bf16" else jnp.float32,
    )
    store = CheckpointStore(ckpt_dir)
    _, init_fn = build_train_step(model, cfg.train)
    state = store.load(init_fn(params), step)
    params = dict(state.params)
    if store.has_frozen():
        frozen = store.load_frozen({k: params[k] for k in model.frozen_keys})
        params.update(frozen)
    if use_ema and state.ema is not None:
        params.update(state.ema.params)      # EMA copy_to (inf4eval.py:691-697)
    return model, params, int(state.step)


def run_name(task: str, step: int, cfg: Config) -> str:
    g = cfg.generation
    return (f"{task}-checkpoint-{step}-cate{g.category_guidance_scale}"
            f"-mutual{g.mutual_guidance_scale}-hist{g.hist_guidance_scale}")


def main(argv=None):
    p = argparse.ArgumentParser(description="DiFashion-TPU generation")
    p.add_argument("--data_path", required=True)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--ckpt_step", type=int, default=None, help="default: latest")
    p.add_argument("--task", choices=["FITB", "GOR"], default="FITB")
    p.add_argument("--mode", choices=["valid", "test"], default="test")
    p.add_argument("--output_dir", default="generated")
    p.add_argument("--config", default=None)
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--num_inference_steps", type=int, default=None)
    p.add_argument("--category_guidance_scale", type=float, default=None)
    p.add_argument("--hist_guidance_scale", type=float, default=None)
    p.add_argument("--mutual_guidance_scale", type=float, default=None)
    p.add_argument("--scheduler", choices=["pndm", "ddim", "dpmpp"], default=None)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="permit the hash-tokenizer fallback (outputs will be "
                        "meaningless; tests/throughput only)")
    args = p.parse_args(argv)

    log = setup_logging()
    cfg = (Config.from_json(open(args.config).read()) if args.config
           else (Config.preset_tiny() if args.tiny else Config.preset_eta01()))
    overrides = {}
    for k in ("num_inference_steps", "category_guidance_scale",
              "hist_guidance_scale", "mutual_guidance_scale", "scheduler"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    if overrides:
        cfg = dataclasses.replace(
            cfg, generation=dataclasses.replace(cfg.generation, **overrides)
        )

    model, params, step = load_model_for_inference(
        cfg, args.ckpt_dir, args.ckpt_step, use_ema=not args.no_ema
    )
    log.info("loaded checkpoint-%d (ema=%s)", step, not args.no_ema)

    data = FashionData.load(args.data_path)
    proc = load_processed(args.data_path, "all_item_moments")
    item_latents = (proc["mean"] * cfg.model.vae.scaling_factor
                    if proc is not None else None)
    hist_store = HistLatentStore.from_catalog(
        data.history.get(args.mode, {}),
        item_latents if item_latents is not None else np.zeros(
            (1, cfg.model.unet.sample_size, cfg.model.unet.sample_size,
             cfg.model.vae.latent_channels), np.float32
        ),
    )
    tokenizer = load_tokenizer(args.tokenizer_dir, cfg.model.text.vocab_size,
                               strict=not args.allow_random_weights)

    pipe = GenerationPipeline(
        model, params, cfg, data.id_cate_dict, tokenizer, hist_store,
        item_latents=item_latents,
    )
    table = data.fitb_valid if args.mode == "valid" else data.fitb_test
    grd = data.valid_grd if args.mode == "valid" else data.test_grd
    out = pipe.run(
        table, args.task, args.output_dir, run_name(args.task, step, cfg),
        grd_dict=grd, seed=args.seed, max_batches=args.max_batches,
    )
    log.info("generation complete: %s", out)
    return out


if __name__ == "__main__":
    main()
