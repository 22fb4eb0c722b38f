"""LEARNING PROOF (VERDICT r2 #1): the framework's reason to exist is train ->
generate -> evaluate (`/root/reference/DiFashion/train.py:676-838`,
`inf4eval.py:369`, `evaluate_fitb.py:441-463`). No pretrained weights can land in
this image, but the *system* claim — the optimizer/EMA/dropout/sampler stack
actually LEARNS — is testable today: overfit a tiny DiFashion on a memorized
outfit through the REAL CLIs and assert the generations reproduce the training
items.

Fixture: 4 items, item i in category i, one outfit [1,2,3,4] repeated. Category
prompts (through the frozen, randomly-initialized text tower — a deterministic
conditioning code) + history latents identify each slot's target item, so a model
that learns the conditional denoising objective must reconstruct the memorized
latents at sampling time, CFG and all.

Flow exercised end to end, all through CLI `main()`s:
  train (150 steps, ckpt) -> train --resume latest (to 300) -> generate FITB +
  GOR with the EMA weights -> nearest-neighbor + MSE reconstruction gates in
  image space -> all four eval drivers over the generated manifests.
"""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from difashion_tpu.core.config import Config

OLEN = 4
N_ITEMS = 5  # 0 = null/white


def _fixture_config(out_dir: str) -> Config:
    cfg = Config.preset_tiny()
    return dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, output_dir=out_dir, checkpointing_steps=150,
            train_batch_size=4, learning_rate=1e-3, max_train_steps=300,
        ),
        generation=dataclasses.replace(
            cfg.generation, num_inference_steps=10, fitb_batch_size=4,
            gor_batch_size=2,
        ),
    )


def _write_dataset(dpath, cfg) -> np.ndarray:
    """Reference-schema .npy files + processed moments cache; returns the scaled
    catalog latents [N_ITEMS, h, h, C]."""
    os.makedirs(dpath, exist_ok=True)
    h = cfg.model.unet.sample_size
    C = cfg.model.vae.latent_channels
    sf = cfg.model.vae.scaling_factor
    rng = np.random.RandomState(7)
    scaled = rng.randn(N_ITEMS, h, h, C).astype(np.float32) * 0.8
    scaled[0] = 0.0                      # null item
    mean = scaled / sf
    logvar = np.full_like(mean, -30.0)   # deterministic .sample()

    n_rows = 8
    np.save(os.path.join(dpath, "train.npy"), np.array({
        "uids": [1] * n_rows,
        "oids": list(range(100, 100 + n_rows)),
        "outfits": [[1, 2, 3, 4]] * n_rows,
        "category": [[1, 2, 3, 4]] * n_rows,
    }, dtype=object))

    fitb_outfits = []
    for k in range(OLEN):
        o = [1, 2, 3, 4]
        o[k] = 0
        fitb_outfits.append(o)
    np.save(os.path.join(dpath, "fitb_test.npy"), np.array({
        "uids": [1] * OLEN,
        "oids": list(range(200, 200 + OLEN)),
        "outfits": fitb_outfits,
        "category": [[1, 2, 3, 4]] * OLEN,
    }, dtype=object))
    np.save(os.path.join(dpath, "test_grd.npy"), np.array({
        oid: {"outfits": [1, 2, 3, 4], "category": [1, 2, 3, 4]}
        for oid in range(200, 200 + OLEN)
    }, dtype=object))

    history = {1: {c: [c] for c in range(1, 5)}}
    np.save(os.path.join(dpath, "train_history.npy"), np.array(history, dtype=object))
    np.save(os.path.join(dpath, "test_history.npy"), np.array(history, dtype=object))
    np.save(os.path.join(dpath, "id_cate_dict.npy"), np.array(
        {c: f"cate{c}" for c in range(1, 5)}, dtype=object))

    os.makedirs(os.path.join(dpath, "processed"), exist_ok=True)
    np.savez(os.path.join(dpath, "processed", "all_item_moments.npz"),
             mean=mean, logvar=logvar)
    return scaled


@pytest.mark.slow
def test_framework_learns_end_to_end(tmp_path):
    from difashion_tpu.cli import generate as generate_cli
    from difashion_tpu.cli import train as train_cli
    from difashion_tpu.cli.generate import load_model_for_inference, run_name
    from difashion_tpu.data.preprocessing import denormalize_to_uint8
    from difashion_tpu.engine.generate import decode_and_postprocess

    dpath = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    cfg = _fixture_config(ckpt)
    scaled_latents = _write_dataset(dpath, cfg)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    # ---- train in two legs through the CLI (checkpoint + resume exercised) ----
    train_cli.main(["--data_path", dpath, "--output_dir", ckpt,
                    "--config", cfg_path, "--max_train_steps", "150"])
    assert os.path.exists(os.path.join(ckpt, "checkpoint-150"))
    train_cli.main(["--data_path", dpath, "--output_dir", ckpt,
                    "--config", cfg_path, "--resume_from_checkpoint", "latest"])
    assert os.path.exists(os.path.join(ckpt, "checkpoint-300"))

    # the loss actually fell: first logged window vs last (metrics.jsonl)
    losses = [json.loads(l)["loss"]
              for l in open(os.path.join(ckpt, "metrics.jsonl"))]
    assert losses[-1] < 0.6 * losses[0], losses

    # ---- generate FITB + GOR with the EMA weights through the CLI -------------
    gen_dir = str(tmp_path / "gen")
    for task in ("FITB", "GOR"):
        generate_cli.main([
            "--data_path", dpath, "--ckpt_dir", ckpt, "--task", task,
            "--mode", "test", "--output_dir", gen_dir, "--config", cfg_path,
            "--allow_random_weights",   # hash tokenizer: a deterministic stand-in
        ])

    # ---- reconstruction gates -------------------------------------------------
    # decode the 4 catalog items through the same frozen VAE; a generation for
    # category c must be closer to item c's decode than to any other item's
    model, params, step = load_model_for_inference(cfg, ckpt)
    assert step == 300
    cat_imgs = denormalize_to_uint8(np.asarray(jax.jit(
        lambda p, l: decode_and_postprocess(model, p, l)
    )(params, jnp.asarray(scaled_latents[1:5])))).astype(np.float32)

    # Gates (measured at 300 AND 400 steps, two generation seeds — stable):
    #   FITB (1 slot from noise, 3 known co-items): ALL 4 reconstruct, strong
    #   margins (<=0.57 observed; gate 0.65).
    #   GOR (all 4x4=16 slots from pure noise, mutual coupling only among
    #   generated slots): 15/16 reconstruct with margins <=0.75 observed (gate
    #   0.8); at tiny scale one slot consistently mode-hops to a co-item under
    #   the aggressive cate-scale-12 CFG — gate >= 14/16 rather than pretending
    #   perfection.
    for task, margin_gate, min_correct in (("FITB", 0.65, OLEN), ("GOR", 0.8, 14)):
        run = os.path.join(gen_dir, run_name(task, 300, cfg))
        man = np.load(run + ".npy", allow_pickle=True).item()
        n_checked = 0
        n_correct = 0
        failures = []
        for uid, per in man.items():
            for oid, rec in per.items():
                for i, p in enumerate(rec["image_paths"]):
                    img = np.asarray(Image.open(p), np.float32)
                    tgt = rec["cates"][i]
                    d = [np.mean((img - cat_imgs[j]) ** 2) for j in range(4)]
                    n_checked += 1
                    others = [d[j] for j in range(4) if j + 1 != tgt]
                    if (int(np.argmin(d)) + 1 == tgt
                            and d[tgt - 1] < margin_gate * min(others)):
                        n_correct += 1
                    else:
                        failures.append((uid, oid, i, tgt, [float(x) for x in d]))
        # FITB: one blank per row; GOR: every slot of every row is generated
        assert n_checked == (OLEN if task == "FITB" else OLEN * OLEN)
        assert n_correct >= min_correct, (
            f"{task}: only {n_correct}/{n_checked} slots reconstruct their "
            f"training item (gate {min_correct}); failures={failures}"
        )

    # ---- the eval drivers run over the learned generations --------------------
    from difashion_tpu.eval.drivers import (
        EvalContext,
        evaluate_fitb,
        evaluate_gor,
        extract_catalog_clip_features,
        process_history_clip_embs,
    )
    from difashion_tpu.eval.extractors import build_extractors

    all_imgs = denormalize_to_uint8(np.asarray(jax.jit(
        lambda p, l: decode_and_postprocess(model, p, l)
    )(params, jnp.asarray(scaled_latents))))
    loader = lambda i: all_imgs[i].astype(np.float32) / 255.0
    X = build_extractors(tiny=True, batch_size=4)
    cnn = extract_catalog_clip_features(X, loader, N_ITEMS, batch_size=4)
    hist_embs = process_history_clip_embs({1: {c: [c] for c in range(1, 5)}}, cnn)
    ctx = EvalContext(
        extractors=X,
        id_cate_dict={c: f"cate{c}" for c in range(1, 5)},
        item_image_loader=loader,
        cnn_features_clip=cnn,
        history_clipembs=hist_embs,
        retrieval_candidates={1: {oid: [1 + (oid - 200), 2, 3, 4, 1]
                                  for oid in range(200, 204)}},
        cate_iid_dict={c: [c] for c in range(1, 5)},
        img_size=cat_imgs.shape[1],
    )
    grd = np.load(os.path.join(dpath, "test_grd.npy"), allow_pickle=True).item()
    res_f = evaluate_fitb(os.path.join(gen_dir, run_name("FITB", 300, cfg)),
                          ctx, grd)
    res_g = evaluate_gor(os.path.join(gen_dir, run_name("GOR", 300, cfg)),
                         ctx, grd)
    # full metric cascade completes over the learned generations (metric VALUES
    # are meaningless under random eval towers; the learning claim itself is the
    # image-space reconstruction gate above)
    expected_f = {"fid", "is", "clip_score", "grd_clip_score", "clip_image_score",
                  "clip_retrieval_acc", "lpips", "personal_sim", "compatibility",
                  "grd_compatibility"}
    expected_g = {"fid", "is", "clip_score", "clip_image_score", "lpips",
                  "personal_sim", "compatibility", "grd_compatibility"}
    for res, expected in ((res_f, expected_f), (res_g, expected_g)):
        assert expected <= set(res), sorted(res)
        for k in ("fid", "clip_image_score", "clip_score", "personal_sim"):
            assert np.all(np.isfinite(np.asarray(res[k], np.float64))), (k, res[k])
