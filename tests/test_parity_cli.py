"""Quality-parity runbook: gate math, loud refusals, and the tiny-scale e2e plumbing
(`python -m difashion_tpu parity`, VERDICT round-1 item 4)."""
import dataclasses
import json
import logging
import os
import sys

import numpy as np
import pytest

from difashion_tpu.cli.parity import load_reference_results, parity_table, print_table

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tools"))


# ---------------------------------------------------------------------------
# gate math
# ---------------------------------------------------------------------------

def test_parity_table_gates():
    ours = {"fid": 10.0, "lpips": 0.50, "clip_score": 0.30, "extra": 1.0}
    ref = {"fid": 10.1, "lpips": 0.60, "clip_score": 0.31}
    rows = {r[0]: r for r in parity_table(ours, ref)}
    # fid: |10-10.1|/10.1 = 0.99% -> PASS
    assert rows["fid"][4].startswith("PASS")
    # lpips: 16.7% -> FAIL
    assert rows["lpips"][4].startswith("FAIL")
    # non-gated metric only reported
    assert rows["clip_score"][4] == "reported"
    # ours-only metric has no gate
    assert rows["extra"][4] == "no reference value"

    log = logging.getLogger("test_parity")
    assert print_table(parity_table(ours, {"fid": 10.1}), log) is True
    assert print_table(parity_table(ours, ref), log) is False
    # a gated metric the reference pins but we did not measure is a FAIL,
    # not a quietly dropped row
    rows2 = {r[0]: r for r in parity_table({"clip_score": 0.3}, {"fid": 10.0})}
    assert rows2["fid"][4].startswith("FAIL")
    assert print_table(parity_table({"clip_score": 0.3}, {"fid": 10.0}), log) is False


def test_load_reference_results_formats(tmp_path):
    # flat JSON
    j = tmp_path / "ref.json"
    j.write_text(json.dumps({"fid": 12.5, "lpips": 0.42}))
    assert load_reference_results(str(j)) == {"fid": 12.5, "lpips": 0.42}
    # reference eval_results.npy layout: {run_name: {metric: value}}
    n = tmp_path / "eval_results.npy"
    np.save(n, np.array({"FITB-checkpoint-15000": {
        "fid": np.float64(12.5), "is": {"acc": 0.5},
    }}, dtype=object))
    got = load_reference_results(str(n))
    assert got["fid"] == 12.5 and "is" not in got
    assert load_reference_results(None) == {}


# ---------------------------------------------------------------------------
# loud refusals (VERDICT weak #5)
# ---------------------------------------------------------------------------

def test_tokenizer_strict_refuses_hash_fallback(tmp_path):
    from difashion_tpu.data.tokenizer import HashTokenizer, load_tokenizer

    with pytest.raises(FileNotFoundError, match="hash"):
        load_tokenizer(str(tmp_path), strict=True)
    # non-strict still warns but returns the stand-in
    tok = load_tokenizer(str(tmp_path), strict=False)
    assert isinstance(tok, HashTokenizer)


def test_extractors_refuse_random_backbones(tmp_path):
    from difashion_tpu.eval.extractors import build_extractors

    with pytest.raises(FileNotFoundError, match="random"):
        build_extractors(str(tmp_path), tiny=True, allow_random=False)
    X = build_extractors(str(tmp_path), tiny=True, allow_random=True)
    assert "fid_inception" in X.random_towers


# ---------------------------------------------------------------------------
# e2e plumbing at tiny scale (slow)
# ---------------------------------------------------------------------------

def _write_fixture_dataset(tmp_path, rng, n_items=12):
    """Reference-schema dataset + catalog images + tiny-dim CLIP features on disk.
    Returns (dpath, img_dir, paths_npy, cnn_npy)."""
    from PIL import Image

    from difashion_tpu.eval.models.open_clip_vit import ViTConfig

    dpath = tmp_path / "data"
    dpath.mkdir()
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rel = []
    for i in range(n_items):
        Image.fromarray(
            rng.randint(0, 255, size=(64, 64, 3), dtype=np.uint8)
        ).save(img_dir / f"i{i}.png")
        rel.append(f"i{i}.png")
    paths_npy = tmp_path / "paths.npy"
    np.save(paths_npy, np.array(rel, dtype=object))

    n_rows = 4
    outfits = rng.randint(1, n_items, size=(n_rows, 4))
    table = {
        "uids": list(rng.randint(1, 3, n_rows)),
        "oids": list(range(100, 100 + n_rows)),
        "outfits": [list(o) for o in outfits],
        "category": [list(c) for c in rng.randint(1, 5, size=(n_rows, 4))],
    }
    np.save(dpath / "train.npy", np.array(table, dtype=object))
    fitb = {k: ([r.copy() for r in v] if k in ("outfits", "category") else list(v))
            for k, v in table.items()}
    for r in fitb["outfits"]:
        r[0] = 0
    np.save(dpath / "fitb_valid.npy", np.array(fitb, dtype=object))
    np.save(dpath / "valid_grd.npy", np.array({
        100 + i: {"outfits": [int(x) for x in outfits[i]],
                  "category": [int(x) for x in table["category"][i]]}
        for i in range(n_rows)
    }, dtype=object))
    np.save(dpath / "train_history.npy", np.array({1: {2: [3]}}, dtype=object))
    np.save(dpath / "valid_history.npy", np.array({1: {2: [3]}}, dtype=object))
    np.save(dpath / "id_cate_dict.npy",
            np.array({c: f"cate{c}" for c in range(1, 5)}, dtype=object))

    # catalog CLIP features sized for the tiny eval towers
    d = ViTConfig.tiny().embed_dim
    cnn_npy = tmp_path / "cnn.npy"
    np.save(cnn_npy, rng.rand(n_items, d).astype(np.float32))
    return dpath, img_dir, paths_npy, cnn_npy


@pytest.mark.slow
def test_parity_cli_end_to_end(tmp_path):
    from difashion_tpu.cli import parity as parity_cli
    from difashion_tpu.cli import train as train_cli

    rng = np.random.RandomState(5)
    dpath, img_dir, paths_npy, cnn_npy = _write_fixture_dataset(tmp_path, rng)

    # train 2 tiny steps -> checkpoint (auto-precompute kicks in)
    ckpt = tmp_path / "ckpt"
    train_cli.main([
        "--data_path", str(dpath), "--output_dir", str(ckpt), "--tiny",
        "--max_train_steps", "2", "--train_batch_size", "2",
        "--img_folder_path", str(img_dir), "--image_paths_npy", str(paths_npy),
    ])

    # strict parity must refuse without weights
    with pytest.raises((FileNotFoundError, SystemExit)):
        parity_cli.main([
            "--data_path", str(dpath), "--ckpt_dir", str(ckpt),
            "--weights_dir", str(tmp_path / "none"),
            "--img_folder_path", str(img_dir),
            "--image_paths_npy", str(paths_npy),
            "--out_dir", str(tmp_path / "refused"), "--tiny",
        ])

    # plumbing run (explicit override; tiny towers, 2-step sampler via config? no:
    # tiny preset generation steps are small already)
    out_dir = tmp_path / "parity_out"
    # pre-seed the shared results file with a STALE run: step 3 must gate on the
    # run just generated, not the oldest entry
    os.makedirs(out_dir, exist_ok=True)
    np.save(out_dir / "eval_results.npy",
            np.array({"FITB-checkpoint-0-stale": {"fid": 999.0}}, dtype=object))
    parity_cli.main([
        "--data_path", str(dpath), "--ckpt_dir", str(ckpt),
        "--weights_dir", str(tmp_path / "none"),
        "--img_folder_path", str(img_dir),
        "--image_paths_npy", str(paths_npy),
        "--cnn_features_npy", str(cnn_npy),
        "--out_dir", str(out_dir), "--tiny", "--allow_random_weights",
        "--max_batches", "1",
    ])
    results = np.load(out_dir / "eval_results.npy", allow_pickle=True).item()
    assert "FITB-checkpoint-0-stale" in results        # preserved, not clobbered
    run_name, ours = [(k, v) for k, v in results.items() if "stale" not in k][0]
    assert run_name.startswith("FITB-checkpoint-")
    assert "fid" in ours and np.isfinite(ours["fid"])

    # a reference matching the FRESH run passes -- it would FAIL against the
    # stale entry's fid=999, proving step 3 selects the run just generated
    ref_match = tmp_path / "ref_match.json"
    ref_match.write_text(json.dumps({"fid": float(ours["fid"])}))
    parity_cli.main([
        "--data_path", str(dpath), "--ckpt_dir", str(ckpt),
        "--weights_dir", str(tmp_path / "none"),
        "--img_folder_path", str(img_dir),
        "--image_paths_npy", str(paths_npy),
        "--cnn_features_npy", str(cnn_npy),
        "--reference_results", str(ref_match),
        "--out_dir", str(out_dir), "--tiny", "--allow_random_weights",
        "--max_batches", "1",
    ])

    # a reference file that parses to zero usable metrics must refuse loudly
    ref_bad = tmp_path / "ref_bad.npy"
    np.save(ref_bad, np.array({"run": {"fid": {"not": "a number"}}}, dtype=object))
    with pytest.raises(SystemExit, match="no usable"):
        parity_cli.main([
            "--data_path", str(dpath), "--ckpt_dir", str(ckpt),
            "--weights_dir", str(tmp_path / "none"),
            "--img_folder_path", str(img_dir),
            "--image_paths_npy", str(paths_npy),
            "--cnn_features_npy", str(cnn_npy),
            "--reference_results", str(ref_bad),
            "--out_dir", str(out_dir), "--tiny", "--allow_random_weights",
            "--max_batches", "1",
        ])

    # gate failure path: reference far away -> SystemExit
    ref_json = tmp_path / "ref.json"
    ref_json.write_text(json.dumps({"fid": float(ours["fid"]) * 3 + 1.0}))
    with pytest.raises(SystemExit, match="parity FAILED"):
        parity_cli.main([
            "--data_path", str(dpath), "--ckpt_dir", str(ckpt),
            "--weights_dir", str(tmp_path / "none"),
            "--img_folder_path", str(img_dir),
            "--image_paths_npy", str(paths_npy),
            "--cnn_features_npy", str(cnn_npy),
            "--reference_results", str(ref_json),
            "--out_dir", str(out_dir), "--tiny", "--allow_random_weights",
            "--max_batches", "1",
        ])


@pytest.mark.slow
def test_parity_cli_strict_from_weights_on_disk(tmp_path):
    """The weights-arrival drill (VERDICT r2 #2): starting from safetensors FILES ON
    DISK — an HF-layout SD directory (exporter output) + a complete eval weights_dir
    incl. a real BPE tokenizer asset — the full parity command runs STRICT (no
    --allow_random_weights anywhere) through import -> generate -> all drivers ->
    the printed 2%-gate table. This is exactly the flow the moment real weights land.
    """
    from export_eval_weights import export_weights_dir
    from export_hf import main as export_hf_main

    from difashion_tpu.cli import parity as parity_cli
    from difashion_tpu.cli import train as train_cli

    rng = np.random.RandomState(17)
    dpath, img_dir, paths_npy, cnn_npy = _write_fixture_dataset(tmp_path, rng)

    # 1) weights land on disk: eval backbones + tokenizer (synthetic, full layout)
    weights_dir = str(tmp_path / "eval_weights")
    export_weights_dir(weights_dir, tiny=True, seed=2, num_classes=50, n_merges=120)
    tok_dir = os.path.join(weights_dir, "tokenizer")

    # 2) an HF-layout SD checkpoint lands: produce one via the exporter (train a
    #    couple of tiny steps, export all four towers as diffusers safetensors)
    seed_ckpt = tmp_path / "seed_ckpt"
    train_cli.main([
        "--data_path", str(dpath), "--output_dir", str(seed_ckpt), "--tiny",
        "--max_train_steps", "2", "--train_batch_size", "2",
        "--img_folder_path", str(img_dir), "--image_paths_npy", str(paths_npy),
        "--tokenizer_dir", tok_dir,
    ])
    hf_dir = str(tmp_path / "hf")
    export_hf_main(["--ckpt_dir", str(seed_ckpt), "--out", hf_dir, "--tiny",
                    "--include_frozen"])

    # 3) fine-tune FROM the safetensors (import_sd_checkpoint path) -> release ckpt
    ckpt = tmp_path / "ckpt"
    train_cli.main([
        "--data_path", str(dpath), "--output_dir", str(ckpt), "--tiny",
        "--max_train_steps", "1", "--train_batch_size", "2",
        "--pretrained_dir", hf_dir, "--tokenizer_dir", tok_dir,
    ])

    # 4) strict parity: no --allow_random_weights anywhere in the chain
    out_dir = tmp_path / "parity_out"
    parity_cli.main([
        "--data_path", str(dpath), "--ckpt_dir", str(ckpt),
        "--weights_dir", weights_dir,
        "--img_folder_path", str(img_dir),
        "--image_paths_npy", str(paths_npy),
        "--cnn_features_npy", str(cnn_npy),
        "--out_dir", str(out_dir), "--tiny",
        "--max_batches", "1",
    ])
    results = np.load(out_dir / "eval_results.npy", allow_pickle=True).item()
    run_name, ours = next(iter(results.items()))
    assert run_name.startswith("FITB-checkpoint-1-")
    assert "fid" in ours and np.isfinite(ours["fid"])
    assert "lpips" in ours and np.isfinite(np.asarray(ours["lpips"]).reshape(-1)[0])

    # 5) the gate table passes against a matching reference
    ref_json = tmp_path / "ref_ok.json"
    ref_json.write_text(json.dumps({"fid": float(ours["fid"])}))
    parity_cli.main([
        "--data_path", str(dpath), "--ckpt_dir", str(ckpt),
        "--weights_dir", weights_dir,
        "--img_folder_path", str(img_dir),
        "--image_paths_npy", str(paths_npy),
        "--cnn_features_npy", str(cnn_npy),
        "--reference_results", str(ref_json),
        "--out_dir", str(out_dir), "--tiny",
        "--max_batches", "1",
    ])
