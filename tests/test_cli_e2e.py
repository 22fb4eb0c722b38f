"""Minimum end-to-end slice (SURVEY.md §7): train a few steps on synthetic data ->
checkpoint -> restore with EMA -> FITB generation -> manifest + images on disk.
Everything at tiny scale on the CPU mesh."""
import dataclasses
import os

import jax
import numpy as np
import pytest

from difashion_tpu.core.config import Config
from difashion_tpu.data.datasets import FashionData, HistLatentStore, OutfitTable
from difashion_tpu.data.tokenizer import HashTokenizer


def _synthetic_data(n_rows=8, n_items=20):
    rng = np.random.RandomState(0)
    outfits = rng.randint(1, n_items, size=(n_rows, 4))
    table = OutfitTable(
        uids=rng.randint(1, 4, n_rows),
        oids=np.arange(100, 100 + n_rows),
        outfits=outfits,
        category=rng.randint(1, 6, size=(n_rows, 4)),
    )
    fitb = OutfitTable(
        uids=table.uids.copy(), oids=table.oids.copy(),
        outfits=outfits.copy(), category=table.category.copy(),
    )
    fitb.outfits[:, 0] = 0
    grd = {
        int(o): {"outfits": outfits[i].tolist(),
                 "category": table.category[i].tolist()}
        for i, o in enumerate(table.oids)
    }
    return FashionData(
        train=table, fitb_valid=fitb, fitb_test=fitb,
        valid_grd=grd, test_grd=grd,
        history={"train": {1: {2: [3, 4]}}, "test": {1: {2: [3, 4]}}},
        id_cate_dict={c: f"cate{c}" for c in range(1, 6)},
        cate_iid_dict=None, retrieval_candidates={},
    ), n_items


@pytest.mark.slow
def test_train_checkpoint_generate_e2e(tmp_path):
    from difashion_tpu.cli.train import run_training
    from difashion_tpu.cli.generate import load_model_for_inference, run_name
    from difashion_tpu.engine.pipeline import GenerationPipeline

    cfg = Config.preset_tiny()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, output_dir=str(tmp_path / "ckpt"), checkpointing_steps=2,
            train_batch_size=2, learning_rate=1e-4,
        ),
        generation=dataclasses.replace(
            cfg.generation, num_inference_steps=2, fitb_batch_size=4
        ),
    )
    data, n_items = _synthetic_data()
    h = cfg.model.unet.sample_size
    C = cfg.model.vae.latent_channels
    rng = np.random.RandomState(1)
    mean = rng.randn(n_items, h, h, C).astype(np.float32) * 0.5
    logvar = np.full_like(mean, -6.0)
    all_latents = mean * cfg.model.vae.scaling_factor
    hist = HistLatentStore.from_catalog(data.history["train"], all_latents)
    tok = HashTokenizer(vocab_size=cfg.model.text.vocab_size)

    state, model = run_training(
        cfg, data, mean, logvar, hist, tok, max_steps=3,
        log_dir=str(tmp_path / "logs"),
    )
    assert int(state.step) == 3
    ckpts = os.listdir(tmp_path / "ckpt")
    assert "checkpoint-2" in ckpts and "checkpoint-3" in ckpts
    assert "frozen.msgpack" in ckpts
    # metrics jsonl written
    assert os.path.exists(tmp_path / "logs" / "metrics.jsonl")

    # restore (EMA swapped in) and generate
    model2, params2, step = load_model_for_inference(cfg, str(tmp_path / "ckpt"))
    assert step == 3
    pipe = GenerationPipeline(
        model2, params2, cfg, data.id_cate_dict, tok,
        HistLatentStore.from_catalog(data.history["test"], all_latents),
        item_latents=all_latents,
    )
    run_dir = pipe.run(
        data.fitb_test, "FITB", str(tmp_path / "gen"),
        run_name("FITB", step, cfg), grd_dict=data.test_grd, max_batches=1,
    )
    man = np.load(run_dir + ".npy", allow_pickle=True).item()
    n = sum(len(v) for v in man.values())
    assert n == 4  # one batch of 4 outfits, one fill each
    first = next(iter(next(iter(man.values())).values()))
    assert os.path.exists(first["image_paths"][0])


@pytest.mark.slow
def test_resume_training_continues(tmp_path):
    from difashion_tpu.cli.train import run_training

    cfg = Config.preset_tiny()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, output_dir=str(tmp_path / "ckpt"), checkpointing_steps=2,
            train_batch_size=2, resume_from_checkpoint="latest",
        ),
    )
    data, n_items = _synthetic_data()
    h, C = cfg.model.unet.sample_size, cfg.model.vae.latent_channels
    rng = np.random.RandomState(2)
    mean = rng.randn(n_items, h, h, C).astype(np.float32) * 0.5
    logvar = np.full_like(mean, -6.0)
    hist = HistLatentStore.from_catalog(
        data.history["train"], mean * cfg.model.vae.scaling_factor
    )
    tok = HashTokenizer(vocab_size=cfg.model.text.vocab_size)

    state1, _ = run_training(cfg, data, mean, logvar, hist, tok, max_steps=2)
    assert int(state1.step) == 2
    # second call resumes from checkpoint-2 and continues to 4
    state2, _ = run_training(cfg, data, mean, logvar, hist, tok, max_steps=4)
    assert int(state2.step) == 4


@pytest.mark.slow
def test_train_cli_auto_precompute_from_images(tmp_path):
    """Bare dataset dir -> `cli.train.main` auto-runs the VAE-moment precompute
    (reference train.py:466-487) and trains from RAW images end to end
    (--from_images; reference train.py:435-444)."""
    from PIL import Image

    from difashion_tpu.cli import train as train_cli

    n_items = 12
    rng = np.random.RandomState(3)
    dpath = tmp_path / "data"
    dpath.mkdir()
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()

    # catalog images: non-square so the random-crop path is exercised
    rel_paths = []
    for i in range(n_items):
        arr = rng.randint(0, 255, size=(80, 64, 3), dtype=np.uint8)
        name = f"item{i}.png"
        Image.fromarray(arr).save(img_dir / name)
        rel_paths.append(name)
    paths_npy = tmp_path / "all_item_image_paths.npy"
    np.save(paths_npy, np.array(rel_paths, dtype=object))

    # dataset .npy files in the reference schema (SURVEY.md §2d)
    n_rows = 6
    outfits = rng.randint(1, n_items, size=(n_rows, 4))
    np.save(dpath / "train.npy", np.array({
        "uids": list(rng.randint(1, 3, n_rows)),
        "oids": list(range(100, 100 + n_rows)),
        "outfits": [list(o) for o in outfits],
        "category": [list(c) for c in rng.randint(1, 5, size=(n_rows, 4))],
    }, dtype=object))
    np.save(dpath / "train_history.npy",
            np.array({1: {2: [3, 4]}}, dtype=object))
    np.save(dpath / "id_cate_dict.npy",
            np.array({c: f"cate{c}" for c in range(1, 5)}, dtype=object))

    out_dir = tmp_path / "ckpt"
    train_cli.main([
        "--data_path", str(dpath),
        "--output_dir", str(out_dir),
        "--tiny",
        "--max_train_steps", "2",
        "--train_batch_size", "2",
        "--img_folder_path", str(img_dir),
        "--image_paths_npy", str(paths_npy),
        "--from_images",
    ])

    # auto-precompute artifact + checkpoints on disk
    assert (dpath / "processed" / "all_item_moments.npz").exists()
    assert (out_dir / "checkpoint-2").exists()

    # second invocation must reuse the cache (no images needed for the fast path)
    train_cli.main([
        "--data_path", str(dpath),
        "--output_dir", str(out_dir),
        "--tiny",
        "--max_train_steps", "3",
        "--train_batch_size", "2",
        "--resume_from_checkpoint", "latest",
    ])
    assert (out_dir / "checkpoint-3").exists()


def test_info_cli_json(capsys):
    """`difashion_tpu info` capacity planner: tiny model, machine-readable output."""
    import json as _json

    from difashion_tpu.cli.info import main as info_main

    info_main(["--model", "tiny", "--dp_size", "8", "--json"])
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["mesh"] == {"dp": 8}
    acc = out["hbm_accounting"]
    assert acc["fits_dp"] and acc["fits_zero1"]  # tiny model fits everywhere
    assert acc["per_chip_bytes_zero1"] < acc["per_chip_bytes_dp"]
    assert acc["param_count_trainable"] > 0


@pytest.mark.slow
def test_in_training_validation_sampling(tmp_path):
    """--validation_steps: EMA-weight FITB samples land in <logs>/samples/step-N/
    (working version of the reference's commented-out block, train.py:729-835)."""
    from difashion_tpu.cli.train import run_training

    cfg = Config.preset_tiny()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, output_dir=str(tmp_path / "ckpt"), checkpointing_steps=10,
            train_batch_size=2, learning_rate=1e-4,
        ),
        generation=dataclasses.replace(
            cfg.generation, num_inference_steps=2, fitb_batch_size=4
        ),
    )
    data, n_items = _synthetic_data()
    data.history["valid"] = data.history["test"]
    h, C = cfg.model.unet.sample_size, cfg.model.vae.latent_channels
    rng = np.random.RandomState(1)
    mean = rng.randn(n_items, h, h, C).astype(np.float32) * 0.5
    logvar = np.full_like(mean, -6.0)
    hist = HistLatentStore.from_catalog(
        data.history["train"], mean * cfg.model.vae.scaling_factor
    )
    tok = HashTokenizer(vocab_size=cfg.model.text.vocab_size)

    run_training(
        cfg, data, mean, logvar, hist, tok, max_steps=2,
        log_dir=str(tmp_path / "logs"),
        validation_every=2, validation_batches=1,
    )
    samples = tmp_path / "logs" / "samples"
    runs = os.listdir(samples)
    assert any(r.startswith("step-2") for r in runs), runs
    # the samples dir also holds the manifest (.npy) and the reproducibility
    # sidecar (.config.json) — select the run *directory* only
    run_dir = samples / [r for r in runs if r.startswith("step-2")
                         and os.path.isdir(samples / r)][0]
    man = np.load(str(run_dir) + ".npy", allow_pickle=True).item()
    first = next(iter(next(iter(man.values())).values()))
    assert os.path.exists(first["image_paths"][0])

    # the sample grid must have reached the TensorBoard stream as an image event
    import glob

    from difashion_tpu.core.tensorboard import read_events

    files = glob.glob(str(tmp_path / "logs" / "tb" / "events.out.tfevents.*"))
    img_evs = [e for f in files for e in read_events(f) if e.get("images")]
    assert img_evs and "validation/fitb_samples" in img_evs[0]["images"]


def test_explicit_resume_step_missing_fails_loudly(tmp_path):
    """--resume_from_checkpoint <step> on a directory without that checkpoint must
    refuse, not silently start a fresh run over the directory's history."""
    from difashion_tpu.cli.train import run_training

    cfg = Config.preset_tiny()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, output_dir=str(tmp_path / "ckpt"),
            resume_from_checkpoint="50", train_batch_size=2,
        ),
    )
    data, n_items = _synthetic_data()
    h, C = cfg.model.unet.sample_size, cfg.model.vae.latent_channels
    mean = np.zeros((n_items, h, h, C), np.float32)
    logvar = np.full_like(mean, -6.0)
    hist = HistLatentStore.from_catalog(data.history["train"], mean)
    tok = HashTokenizer(vocab_size=cfg.model.text.vocab_size)
    with pytest.raises(SystemExit, match="checkpoint-50 not found"):
        run_training(cfg, data, mean, logvar, hist, tok, max_steps=1,
                     log_dir=str(tmp_path / "logs"))
