"""End-to-end evaluation-driver tests: tiny backbones + synthetic manifests -> all four
metric cascades produce finite results with crash-safe incremental save."""
import os

import jax
import numpy as np
import pytest

from difashion_tpu.eval.drivers import (
    EvalContext,
    evaluate_fitb,
    evaluate_gor,
    evaluate_grounding_fitb,
    evaluate_grounding_gor,
    extract_catalog_clip_features,
    process_history_clip_embs,
)
from difashion_tpu.eval.extractors import build_extractors

IMG = 32  # tiny eval image size


@pytest.fixture(scope="module")
def ctx():
    X = build_extractors(tiny=True, batch_size=4)
    rng = np.random.RandomState(0)
    n_items = 30
    item_imgs = rng.rand(n_items, IMG, IMG, 3).astype(np.float32)
    cnn = extract_catalog_clip_features(X, lambda i: item_imgs[i], n_items,
                                        batch_size=8)
    assert cnn.shape == (n_items, 16)
    history = {1: {1: [3, 4]}, 2: {2: [5]}}
    hist_embs = process_history_clip_embs(history, cnn)
    id_cate = {c: f"cate{c}" for c in range(1, 6)}
    return EvalContext(
        extractors=X,
        id_cate_dict=id_cate,
        item_image_loader=lambda i: item_imgs[i],
        cnn_features_clip=cnn,
        history_clipembs=hist_embs,
        retrieval_candidates=None,
        cate_iid_dict={c: list(range(1, 30)) for c in range(1, 6)},
        img_size=IMG,
    )


def _make_manifest(tmp_path, task, n_outfits=2):
    """Write JPEGs + manifest like the pipeline does."""
    from difashion_tpu.engine.pipeline import save_jpeg

    rng = np.random.RandomState(1)
    run = os.path.join(str(tmp_path), f"{task}-run")
    man, grd, cands = {}, {}, {}
    for i in range(n_outfits):
        uid, oid = i + 1, 100 + i
        n_gen = 1 if task == "FITB" else 4
        cates = [1 + (i + j) % 5 for j in range(n_gen)]
        full_cates = [1 + (i + j) % 5 for j in range(4)]
        outfits = np.asarray([1 + (i * 4 + j) % 20 for j in range(4)])
        paths = []
        for j in range(n_gen):
            p = os.path.join(run, "images", str(uid), str(oid), f"{j}.jpg")
            save_jpeg((rng.rand(IMG, IMG, 3) * 255).astype(np.uint8), p)
            paths.append(p)
        rec_outfits = outfits.copy()
        if task == "FITB":
            rec_outfits[0] = 0
        else:
            rec_outfits[:] = 0
        man.setdefault(uid, {})[oid] = {
            "cates": cates, "full_cates": np.asarray(full_cates),
            "outfits": rec_outfits, "image_paths": paths,
        }
        grd[oid] = {"outfits": outfits.tolist(), "category": full_cates}
        cands.setdefault(uid, {})[oid] = [int(outfits[0]), 7, 8, 9, 10]
    np.save(run + ".npy", np.array(man, dtype=object))
    return run, grd, cands


@pytest.mark.slow
def test_evaluate_fitb_cascade(ctx, tmp_path):
    run, grd, cands = _make_manifest(tmp_path, "FITB")
    ctx.retrieval_candidates = cands
    res = evaluate_fitb(run, ctx, grd)
    for key in ("fid", "is", "clip_score", "grd_clip_score", "clip_retrieval_acc",
                "clip_image_score", "lpips", "personal_sim", "compatibility",
                "grd_compatibility"):
        assert key in res, key
    assert np.isfinite(res["fid"])
    assert 0.0 <= res["is"]["acc"] <= 1.0
    assert 0.0 <= res["compatibility"] <= 1.0
    # incremental file exists and resume skips recompute
    out = os.path.join(str(tmp_path), "eval_results.npy")
    assert os.path.exists(out)
    res2 = evaluate_fitb(run, ctx, grd)
    assert res2 == res


@pytest.mark.slow
def test_evaluate_gor_cascade(ctx, tmp_path):
    run, grd, _ = _make_manifest(tmp_path, "GOR")
    res = evaluate_gor(run, ctx, grd)
    for key in ("fid", "is", "clip_score", "clip_image_score", "lpips",
                "personal_sim", "compatibility", "grd_compatibility"):
        assert key in res, key
    assert np.isfinite(res["lpips"])


@pytest.mark.slow
def test_grounding_fitb(ctx, tmp_path):
    run, grd, cands = _make_manifest(tmp_path, "FITB")
    ctx.retrieval_candidates = cands
    res = evaluate_grounding_fitb(run, ctx, grd)
    for key in ("retrieval_acc", "clip_score", "clip_image_score", "lpips",
                "personal_sim", "compatibility"):
        assert key in res, key
    assert 0.0 <= res["retrieval_acc"] <= 1.0


@pytest.mark.slow
def test_grounding_gor(ctx, tmp_path):
    run, grd, _ = _make_manifest(tmp_path, "GOR")
    res = evaluate_grounding_gor(run, ctx, grd, topN=(1, 5, 10))
    for key in ("recall@1", "recall@5", "recall@10", "clip_score",
                "personal_sim", "compatibility"):
        assert key in res, key
    assert res["recall@1"] <= res["recall@5"] <= res["recall@10"]
