"""Training driver CLI.

Equivalent of `python train.py <flags>` (`/root/reference/DiFashion/train.py:355-838`)
re-designed TPU-first:

  * all per-step work (VAE sample from cached moments, noising, conditioning, UNet
    fwd/bwd, AdamW, EMA) is one jitted step on a `Mesh(("dp",))`;
  * the host loop only assembles index-gathered dense batches (no PIL in the hot loop —
    the reference's in-step image loading, `difashion.py:139-142`, becomes a one-off
    catalog precompute);
  * checkpoint every `checkpointing_steps` with retention, `--resume latest`
    (`train.py:648-670,718-722`), hard stop at `max_train_steps` (`train.py:837`).

Usage:
  python -m difashion_tpu.cli.train --data_path datasets/polyvore \
      --output_dir ckpt [--config cfg.json] [--pretrained_dir sd2-base/] \
      [--max_train_steps N]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from difashion_tpu.core.checkpoint import CheckpointStore
from difashion_tpu.core.config import Config
from difashion_tpu.core.logging import MetricLogger, StepTimer, setup_logging
from difashion_tpu.data.datasets import FashionData, HistLatentStore, TrainLoader
from difashion_tpu.data.precompute import load_processed
from difashion_tpu.data.tokenizer import load_tokenizer
from difashion_tpu.engine.train import (
    TrainBatch,
    build_train_step,
    make_mesh,
    shard_train_step,
)
from difashion_tpu.models.difashion import create_difashion


def assemble_batch(
    batch: dict,
    moments_mean: Optional[np.ndarray],
    moments_logvar: Optional[np.ndarray],
    input_ids_table: np.ndarray,   # [n_cate_rows, 77]
    cid_row: dict,
    hist_store: HistLatentStore,
    scaling_factor: float,
    image_loader=None,             # (iid, np_rng) -> [H,W,3] in [-1,1]
    np_rng: Optional[np.random.RandomState] = None,
) -> TrainBatch:
    """Host-side dense batch assembly from item/category ids (pure index gathers on
    the fast path; raw-image loads + train transform when `image_loader` is set —
    the reference's from-images mode, `train.py:435-444`, `difashion.py:132-145`)."""
    outfits = np.asarray(batch["outfits"])
    category = np.asarray(batch["category"])
    uids = np.asarray(batch["uids"])
    B, olen = outfits.shape
    flat = outfits.reshape(-1)
    if image_loader is not None:
        imgs = np.stack([image_loader(int(i), np_rng) for i in flat])
        images = jnp.asarray(imgs.reshape((B, olen) + imgs.shape[1:]))
        mean = logvar = None
    else:
        images = None
        mean = jnp.asarray(
            moments_mean[flat].reshape((B, olen) + moments_mean.shape[1:])
        )
        logvar = jnp.asarray(
            moments_logvar[flat].reshape(mean.shape)
        )
    rows = np.vectorize(cid_row.get)(category)
    ids = input_ids_table[rows.reshape(-1)].reshape(B, olen, -1)
    hist = hist_store.gather(uids, category)
    return TrainBatch(
        images=images,
        latent_mean=mean,
        latent_logvar=logvar,
        input_ids=jnp.asarray(ids.astype(np.int32)),
        hist_latents=jnp.asarray(hist),
    )


def run_training(
    cfg: Config,
    data: FashionData,
    moments_mean: Optional[np.ndarray],
    moments_logvar: Optional[np.ndarray],
    hist_store: HistLatentStore,
    tokenizer,
    pretrained_dir: Optional[str] = None,
    max_steps: Optional[int] = None,
    log_dir: Optional[str] = None,
    image_loader=None,
    report_to: Optional[tuple] = None,
    validation_every: int = 0,
    validation_batches: int = 1,
):
    """The training loop as a library function (CLI and tests share it)."""
    log = setup_logging()
    tcfg = cfg.train
    max_steps = max_steps or tcfg.max_train_steps
    rng = jax.random.PRNGKey(tcfg.seed)
    rng, init_rng = jax.random.split(rng)

    dtype = jnp.bfloat16 if tcfg.mixed_precision == "bf16" else jnp.float32
    model, params = create_difashion(
        cfg.model, init_rng, dtype=dtype, remat=tcfg.gradient_checkpointing,
        remat_policy=(tcfg.remat_policy if tcfg.remat_policy != "default"
                      else None),
    )
    if pretrained_dir:
        from difashion_tpu.core.importer import import_sd_checkpoint

        params = import_sd_checkpoint(pretrained_dir, params)
        log.info("imported pretrained SD weights from %s", pretrained_dir)

    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    dp = tcfg.dp_size
    if dp <= 0:
        # largest device count that divides the global batch (DP requires even shards)
        ndev = jax.device_count()
        dp = max(d for d in range(1, ndev + 1) if tcfg.train_batch_size % d == 0)
    mesh = make_mesh(dp)
    # donate_state: the loop below is the strict thread-through pattern
    # (state is rebound every step, checkpoints snapshot to host first), so the
    # 13 GiB full-scale state is updated in place instead of doubling per step.
    # DIFASHION_NO_DONATE=1 is the escape hatch (capacity permitting) if a
    # backend's aliasing path ever misbehaves — and the A/B lever for isolating
    # donation in training-dynamics diagnostics.
    donate = os.environ.get("DIFASHION_NO_DONATE") != "1"
    jitted, place_batch, place_repl = shard_train_step(step_fn, mesh,
                                                       donate_state=donate)
    log.info("mesh: %d devices (dp)", mesh.devices.size)

    store = CheckpointStore(tcfg.output_dir, tcfg.checkpoints_total_limit)
    if not store.has_frozen():
        store.save_frozen({k: params[k] for k in model.frozen_keys})
    start_step = 0
    if tcfg.resume_from_checkpoint:
        step = (None if tcfg.resume_from_checkpoint == "latest"
                else int(tcfg.resume_from_checkpoint))
        if step is not None and step not in store.all_steps():
            # an EXPLICIT step that doesn't exist must fail loudly — silently
            # starting fresh would begin overwriting the directory's history
            raise SystemExit(
                f"--resume_from_checkpoint {step}: checkpoint-{step} not found "
                f"under {tcfg.output_dir} (have: {store.all_steps() or 'none'})"
            )
        if store.latest_step() is not None:
            state = store.load(state, step)
            # Drop the fresh-init trainable params: flax init ran eagerly on
            # device, and this local still references that copy. At SD2-base
            # scale the stale 3.26 GiB plus the restored 13.01 GiB state
            # exceeds a 16 GiB chip at the first post-resume step (measured:
            # the 500-step soak's resume leg hit RESOURCE_EXHAUSTED). load()
            # shares the frozen leaves with the template, so rebinding to the
            # restored pytree keeps everything encode_text needs.
            params = state.params
            start_step = int(state.step)
            log.info("resumed from checkpoint at step %d", start_step)

    # per-category token-id table (prompts depend only on the category)
    cids = sorted(data.id_cate_dict.keys()) if data.id_cate_dict else sorted(
        {int(c) for c in data.train.category.reshape(-1)}
    )
    from difashion_tpu.data.prompts import build_train_prompts

    id_cate = data.id_cate_dict or {c: f"category {c}" for c in cids}
    ids_table = tokenizer(build_train_prompts(cids, id_cate))
    cid_row = {c: i for i, c in enumerate(cids)}

    null_latent = jnp.asarray(hist_store.null)
    null_text = jnp.asarray(
        np.asarray(jax.jit(model.encode_text)(params, jnp.asarray(tokenizer([""]))))[0]
    )

    loader = TrainLoader(
        data.train, tcfg.train_batch_size, seed=tcfg.seed, shuffle=True
    )
    metrics_log = MetricLogger(
        log_dir or tcfg.output_dir, report_to=report_to,
        run_config={"learning_rate": tcfg.learning_rate,
                    "train_batch_size": tcfg.train_batch_size,
                    "max_train_steps": max_steps, "eta": tcfg.eta,
                    "snr_gamma": tcfg.snr_gamma},
    )
    timer = StepTimer(n_chips=mesh.devices.size)
    sf = cfg.model.vae.scaling_factor

    # ---- in-training validation sampling (the reference ships this as intent
    # only — a commented-out block at train.py:729-835: every N steps, swap the
    # EMA weights in and sample a few valid-split FITB outfits to samples/).
    # Here it is a working opt-in; the pipeline (and its compiled sampler) is
    # built once and re-driven with the current EMA params each time. ----------
    val_pipe = None
    if validation_every > 0 and data.fitb_valid is not None:
        from difashion_tpu.engine.pipeline import GenerationPipeline

        all_latents = (moments_mean * sf if moments_mean is not None else None)
        if all_latents is None:
            log.warning("validation sampling without catalog latents: known "
                        "slots and history fall back to the null latent")
            # no catalog to average: empty history -> every lookup hits null
            val_hist = HistLatentStore(
                {}, np.zeros(hist_store.null.shape, np.float32)
            )
        else:
            val_hist = HistLatentStore.from_catalog(
                data.history.get("valid", {}), all_latents
            )
        samples_dir = os.path.join(log_dir or tcfg.output_dir, "samples")

        def run_validation(cur_state, at_step):
            nonlocal val_pipe
            val_params = dict(cur_state.params)
            if cur_state.ema is not None:    # EMA copy_to (train.py:737-743 intent)
                val_params.update(cur_state.ema.params)
            if val_pipe is None:
                val_pipe = GenerationPipeline(
                    model, val_params, cfg, id_cate, tokenizer, val_hist,
                    item_latents=all_latents,
                )
            else:
                val_pipe.params = val_params   # keep the compiled sampler
            out = val_pipe.run(
                data.fitb_valid, "FITB", samples_dir, f"step-{at_step}",
                grd_dict=data.valid_grd, seed=tcfg.seed,
                max_batches=validation_batches,
            )
            log.info("validation samples at step %d -> %s", at_step, out)
            # one grid of this pass's generations into the trackers
            try:
                from PIL import Image as PILImage

                from difashion_tpu.engine.pipeline import merge_images_grid

                man = np.load(out + ".npy", allow_pickle=True).item()
                paths = [
                    p for per_uid in man.values() for rec in per_uid.values()
                    for p in rec["image_paths"]
                ][:16]
                if paths:
                    imgs = np.stack(
                        [np.asarray(PILImage.open(p).convert("RGB")) for p in paths]
                    )
                    metrics_log.log_image(
                        at_step, "validation/fitb_samples", merge_images_grid(imgs)
                    )
            except Exception as e:   # observability must never kill training
                log.warning("validation image logging failed: %s", e)
    elif validation_every > 0:
        log.warning("--validation_steps set but no fitb_valid split found; "
                    "validation sampling disabled")
        validation_every = 0

    state = place_repl(state)
    step = start_step
    sync_every = max(1, metrics_log.console_every)
    imgs_per_step = tcfg.train_batch_size * data.train.outfits.shape[1]
    timer.start()
    crop_rng = np.random.RandomState(tcfg.seed + 1)
    try:
        while step < max_steps:
            host_batch = loader.batch_at(step)
            batch = assemble_batch(
                host_batch, moments_mean, moments_logvar, ids_table, cid_row,
                hist_store, sf, image_loader=image_loader, np_rng=crop_rng,
            )
            batch = place_batch(batch)
            rng, step_rng = jax.random.split(rng)
            state, m = jitted(state, batch, null_latent, null_text, step_rng)
            step += 1
            # Host-sync only periodically: dispatch stays async between syncs so
            # the device never waits on a host round-trip (the reference logs
            # every step through accelerator.gather — a per-step sync).
            if step % sync_every == 0 or step >= max_steps:
                loss = float(m["loss"])  # forces completion of the whole chain
                t = timer.stop(imgs_per_step * sync_every)
                metrics_log.log(
                    step, loss=loss, grad_norm=float(m.get("grad_norm", 0.0)),
                    update_skipped=float(m.get("update_skipped", 0.0)), **t,
                )
                timer.start()
            if step % tcfg.checkpointing_steps == 0 or step >= max_steps:
                store.save_async(state, step)
                log.info("saved checkpoint-%d (async)", step)
            if validation_every > 0 and step % validation_every == 0:
                run_validation(state, step)
                timer.start()   # exclude validation wall time from step timing
    finally:
        # an exception in the loop must not abandon an announced checkpoint
        # mid-write (daemon writer dies at interpreter exit) or lose buffered
        # metrics; wait() also re-raises any background write failure
        store.wait()
        metrics_log.close()
    return state, model


def main(argv=None):
    p = argparse.ArgumentParser(description="DiFashion-TPU training")
    p.add_argument("--data_path", required=True)
    p.add_argument("--output_dir", default="ckpt")
    p.add_argument("--config", default=None, help="JSON config file")
    p.add_argument("--pretrained_dir", default=None,
                   help="local diffusers SD2-base dir (unet/ vae/ text_encoder/)")
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--train_batch_size", type=int, default=None)
    p.add_argument("--eta", type=float, default=None)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--tiny", action="store_true", help="tiny model (smoke test)")
    p.add_argument("--img_folder_path", default=None,
                   help="catalog image root (enables first-run auto-precompute and "
                        "--from_images)")
    p.add_argument("--image_paths_npy", default=None,
                   help="iid -> relative image path array")
    p.add_argument("--from_images", action="store_true",
                   help="train from raw images (bilinear resize + random crop + "
                        "in-step VAE sample, reference train.py:435-444) instead of "
                        "the precomputed-moments fast path")
    p.add_argument("--validation_steps", type=int, default=0,
                   help="sample a few valid-split FITB outfits with the EMA "
                        "weights every N steps into <output_dir>/samples/ "
                        "(working version of the reference's commented-out "
                        "validation block, train.py:729-835; 0 = off)")
    p.add_argument("--validation_batches", type=int, default=1,
                   help="valid batches per validation pass (reference intent: 4)")
    p.add_argument("--report_to", default="tensorboard",
                   help="comma-separated trackers: tensorboard,wandb,comet_ml "
                        "(reference train.py:289-297); unavailable packages are "
                        "skipped with a warning, JSONL metrics always written")
    args = p.parse_args(argv)

    cfg = (Config.from_json(open(args.config).read()) if args.config
           else (Config.preset_tiny() if args.tiny else Config.preset_eta01()))
    overrides = {}
    for k in ("max_train_steps", "learning_rate", "train_batch_size", "eta",
              "snr_gamma", "resume_from_checkpoint"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    overrides["output_dir"] = args.output_dir
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, **overrides))

    log = setup_logging()
    data = FashionData.load(args.data_path)
    image_paths = (np.load(args.image_paths_npy, allow_pickle=True)
                   if args.image_paths_npy else None)

    proc = load_processed(args.data_path, "all_item_moments")
    if proc is None:
        # first-run auto-precompute (reference train.py:466-487 runs
        # preprocess_dataset when the processed/ cache is missing)
        if image_paths is None or args.img_folder_path is None:
            raise SystemExit(
                "catalog moments not found; either pass --img_folder_path + "
                "--image_paths_npy so training can precompute them on first run, "
                "or run `python -m difashion_tpu.cli.extract_features --stage vae`"
            )
        from difashion_tpu.cli.extract_features import make_item_loader
        from difashion_tpu.data.precompute import encode_catalog, save_processed

        log.info("catalog moments cache missing — running first-run VAE precompute "
                 "over %d items", len(image_paths))
        model, params = create_difashion(cfg.model, jax.random.PRNGKey(0))
        if args.pretrained_dir:
            from difashion_tpu.core.importer import import_sd_checkpoint

            params = import_sd_checkpoint(args.pretrained_dir, params)
        item_loader = make_item_loader(
            args.img_folder_path, image_paths, cfg.model.vae.sample_size
        )
        proc = encode_catalog(model, params, item_loader, len(image_paths))
        save_processed(args.data_path, "all_item_moments", **proc)
        log.info("saved processed/all_item_moments.npz")

    moments_mean, moments_logvar = proc["mean"], proc["logvar"]
    all_latents = moments_mean * cfg.model.vae.scaling_factor
    hist_store = HistLatentStore.from_catalog(
        data.history.get("train", {}), all_latents
    )
    tokenizer = load_tokenizer(args.tokenizer_dir, cfg.model.text.vocab_size)

    image_loader = None
    if args.from_images:
        if image_paths is None or args.img_folder_path is None:
            raise SystemExit("--from_images needs --img_folder_path and "
                             "--image_paths_npy")
        import os as _os

        from PIL import Image

        from difashion_tpu.data.preprocessing import to_model_input

        size = cfg.model.vae.sample_size

        def image_loader(iid: int, np_rng):
            img = Image.open(_os.path.join(
                args.img_folder_path, str(image_paths[iid])
            )).convert("RGB")
            return to_model_input(img, size=size, crop="random", rng=np_rng)

    report_to = tuple(t.strip() for t in args.report_to.split(",") if t.strip())
    run_training(
        cfg, data, moments_mean, moments_logvar, hist_store, tokenizer,
        pretrained_dir=args.pretrained_dir, image_loader=image_loader,
        report_to=report_to, validation_every=args.validation_steps,
        validation_batches=args.validation_batches,
    )


if __name__ == "__main__":
    main()
