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


@pytest.mark.slow
def test_multiblank_fitb_compat_uses_each_images_pointer(ctx, tmp_path, monkeypatch):
    """An outfit with TWO generated slots must score a compat row containing BOTH
    generated-image pointers (the old per-image fill duplicated one image across
    every blank)."""
    import difashion_tpu.eval.drivers as drv
    from difashion_tpu.engine.pipeline import save_jpeg

    rng = np.random.RandomState(3)
    run = os.path.join(str(tmp_path), "FITB-multiblank")
    paths = []
    for j in range(2):
        p = os.path.join(run, "images", "1", "100", f"{j}.jpg")
        save_jpeg((rng.rand(IMG, IMG, 3) * 255).astype(np.uint8), p)
        paths.append(p)
    man = {1: {100: {
        "cates": [1, 2], "full_cates": np.asarray([1, 2, 3, 4]),
        "outfits": np.asarray([0, 0, 5, 6]), "image_paths": paths,
    }}}
    np.save(run + ".npy", np.array(man, dtype=object))
    grd = {100: {"outfits": [7, 8, 5, 6], "category": [1, 2, 3, 4]}}

    captured = {}
    real_gather = drv.gather_outfit_feats

    def spy(outfits, cnn, gen):
        if gen is not None:                      # the generated-rows gather
            captured["rows"] = np.asarray(outfits)
        return real_gather(outfits, cnn, gen)

    monkeypatch.setattr(drv, "gather_outfit_feats", spy)
    ctx.retrieval_candidates = None
    res = evaluate_fitb(run, ctx, grd,
                        out_path=os.path.join(str(tmp_path), "res.npy"))
    rows = captured["rows"]
    assert rows.shape == (1, 4)
    # both generated pointers present (0 -> gen_emb[0], -1 -> gen_emb[1]), distinct
    assert set(rows[0][:2].tolist()) == {0, -1}, rows
    assert np.isfinite(res["compatibility"])


@pytest.mark.slow
def test_cached_run_does_not_restream(ctx, tmp_path):
    """Second invocation over a fully-evaluated run must not re-decode a single
    image (stream early-out + availability-aware want lists + grounding gating)."""
    run, grd, cands = _make_manifest(tmp_path, "FITB")
    ctx.retrieval_candidates = cands
    out = os.path.join(str(tmp_path), "res.npy")
    evaluate_fitb(run, ctx, grd, out_path=out)
    gout = os.path.join(str(tmp_path), "res_g.npy")
    evaluate_grounding_fitb(run, ctx, grd, out_path=gout)

    calls = {"n": 0}
    real_loader = ctx.item_image_loader

    def counting_loader(i):
        calls["n"] += 1
        return real_loader(i)

    ctx.item_image_loader = counting_loader
    try:
        res2 = evaluate_fitb(run, ctx, grd, out_path=out)
        res3 = evaluate_grounding_fitb(run, ctx, grd, out_path=gout)
    finally:
        ctx.item_image_loader = real_loader
    assert calls["n"] == 0, f"cached rerun loaded {calls['n']} images"
    assert np.isfinite(res2["fid"]) and np.isfinite(res3["retrieval_acc"])


def test_result_sink_atomic_write(tmp_path):
    from difashion_tpu.eval.drivers import _ResultSink

    out = os.path.join(str(tmp_path), "eval_results.npy")
    sink = _ResultSink(out, "run-a")
    sink.put("fid", 1.25)
    assert not os.path.exists(out + ".tmp.npy")   # replaced, not left behind
    again = _ResultSink(out, "run-a")
    assert again.results()["fid"] == 1.25


def test_hist_emb_null_fallback_is_counted_and_logged(ctx, caplog):
    """The documented divergence (module header): a missing (uid, cid) history
    entry substitutes the null-image embedding — WARNING-logged and counted, so
    the personal_sim skew is visible instead of silent."""
    import logging

    before = ctx.hist_emb_fallbacks
    with caplog.at_level(logging.WARNING, logger="difashion_tpu"):
        emb = ctx.hist_emb(999, 3)   # uid 999 has no history at all
    np.testing.assert_array_equal(emb, ctx.cnn_features_clip[0])
    assert ctx.hist_emb_fallbacks == before + 1
    assert any("null" in r.message for r in caplog.records)

    # present entries don't count
    ctx.hist_emb(1, 1)
    assert ctx.hist_emb_fallbacks == before + 1


def test_personal_sim_fallback_count_lands_in_results(ctx, tmp_path):
    """A FITB eval over a manifest with an unknown uid must record
    personal_sim_null_fallbacks next to personal_sim in eval_results.npy."""
    run, grd, cands = _make_manifest(tmp_path, "FITB")
    # rewrite the manifest under an unknown user (uid 77 has no history)
    man = np.load(run + ".npy", allow_pickle=True).item()
    man77 = {77: {oid: rec for by_oid in man.values()
                  for oid, rec in by_oid.items()}}
    np.save(run + ".npy", np.array(man77, dtype=object))
    ctx.retrieval_candidates = None
    res = evaluate_fitb(run, ctx, grd,
                        out_path=str(tmp_path / "eval_results.npy"))
    assert "personal_sim" in res
    assert res.get("personal_sim_null_fallbacks", 0) >= 1
