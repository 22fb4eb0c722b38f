"""Data-layer tests: schema readers against the real reference dataset files
(read-only), tokenizer mechanics, prompt quirks, history store, loader resume."""
import json
import os

import numpy as np
import pytest

from difashion_tpu.data import (
    FashionData,
    HashTokenizer,
    HistLatentStore,
    OutfitTable,
    TrainLoader,
    eval_prompt,
    train_prompt,
)
from difashion_tpu.data.preprocessing import (
    denormalize_to_uint8,
    make_null_image,
    to_model_input,
)
from difashion_tpu.data.tokenizer import CLIPBPETokenizer, bytes_to_unicode

REF_DATA = "/root/reference/datasets/polyvore"
HAS_REF = os.path.exists(os.path.join(REF_DATA, "train.npy"))


# ---------------------------------------------------------------------------
# Schema readers on the real files
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAS_REF, reason="reference datasets not mounted")
def test_polyvore_train_schema():
    t = OutfitTable.load(os.path.join(REF_DATA, "train.npy"))
    assert len(t) == 26921                       # SURVEY.md §2d
    assert t.outfits.shape == (26921, 4)         # every outfit has exactly 4 items
    assert t.category.shape == (26921, 4)
    assert len(np.unique(t.uids)) == 517
    assert t.outfits.min() >= 0


@pytest.mark.skipif(not HAS_REF, reason="reference datasets not mounted")
def test_polyvore_full_load():
    d = FashionData.load(REF_DATA)
    assert d.train is not None and d.fitb_valid is not None
    assert len(d.id_cate_dict) == 50             # 50 shared categories
    # fitb tables: each row has exactly one blank (0) slot
    blanks = (d.fitb_valid.outfits == 0).sum(axis=1)
    assert (blanks == 1).all()
    # grd dict keyed by oid with 4-item outfits
    oid = next(iter(d.test_grd))
    assert len(d.test_grd[oid]["outfits"]) == 4
    # retrieval candidates: 5 per (uid, oid), ground truth at index 0
    uid = next(iter(d.retrieval_candidates["test"]))
    oid2 = next(iter(d.retrieval_candidates["test"][uid]))
    assert len(d.retrieval_candidates["test"][uid][oid2]) == 5
    # history: {uid: {cid: [iids]}}
    uid_h = next(iter(d.history["test"]))
    cid = next(iter(d.history["test"][uid_h]))
    assert len(d.history["test"][uid_h][cid]) > 0


@pytest.mark.skipif(not HAS_REF, reason="reference datasets not mounted")
def test_category_vocab_shared_between_datasets():
    p = FashionData.load(REF_DATA)
    i = FashionData.load("/root/reference/datasets/ifashion")
    assert set(p.id_cate_dict.keys()) == set(i.id_cate_dict.keys())


# ---------------------------------------------------------------------------
# Prompts
# ---------------------------------------------------------------------------

def test_prompt_quirks_preserved():
    # training: only pants/earrings special, "high quality" suffix
    assert train_prompt("jeans pants") == (
        "A photo of a pair of jeans pants, on white background, high quality"
    )
    assert train_prompt("hat") == "A photo of a hat, on white background, high quality"
    # eval: larger special list, no "high quality"
    assert eval_prompt("sneakers") == (
        "A photo of a pair of sneakers, on white background"
    )
    assert eval_prompt("hat") == "A photo of a hat, on white background"
    # divergence case: shoes special at eval only
    assert "pair of" not in train_prompt("shoes")
    assert "pair of" in eval_prompt("shoes")


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------

def test_hash_tokenizer_contract():
    tok = HashTokenizer()
    ids = tok(["A photo of a hat", ""])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tok.bos_id
    assert (ids[0] == tok.eos_id).sum() == 1
    assert ids[1, 0] == tok.bos_id and ids[1, 1] == tok.eos_id
    # deterministic across instances
    assert (HashTokenizer()(["A photo of a hat"]) == ids[0]).all()
    # padding with pad id
    assert (ids[1, 2:] == tok.pad_token_id).all()


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_bpe_tokenizer_merges(tmp_path):
    """Tiny synthetic vocab: 'lo' + 'w</w>' merge chain exercises the BPE loop."""
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1,
             "l": 2, "o": 3, "w": 4, "w</w>": 5, "lo": 6, "low</w>": 7, "o</w>": 8}
    merges = "#version: 0.2\nl o\nlo w</w>\n"
    vp, mp = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text(merges)
    tok = CLIPBPETokenizer(str(vp), str(mp), pad_token_id=0)
    ids = tok(["low"], max_length=8)
    # 'low' -> l o w</w> -> lo w</w> -> low</w> (id 7)
    assert ids[0, 0] == 0 and ids[0, 1] == 7 and ids[0, 2] == 1
    # partially merged word: 'loo' -> 'lo' + 'o</w>' (merge applies, then stops)
    ids3 = tok(["loo"], max_length=8)
    assert ids3[0, 1] == 6 and ids3[0, 2] == 8 and ids3[0, 3] == 1


def test_bpe_truncation_keeps_eos(tmp_path):
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, "a</w>": 2, "a": 3}
    (tmp_path / "v.json").write_text(json.dumps(vocab))
    (tmp_path / "m.txt").write_text("#v\n")
    tok = CLIPBPETokenizer(str(tmp_path / "v.json"), str(tmp_path / "m.txt"))
    ids = tok(["a " * 20], max_length=5)
    assert ids.shape == (1, 5)
    assert ids[0, 0] == 0 and ids[0, -1] == 1


# ---------------------------------------------------------------------------
# History store + loader
# ---------------------------------------------------------------------------

def test_hist_store_lookup_and_fallback():
    lat = np.arange(10 * 2 * 2 * 1, dtype=np.float32).reshape(10, 2, 2, 1)
    history = {7: {3: [1, 2, 3]}}
    store = HistLatentStore.from_catalog(history, lat)
    np.testing.assert_allclose(store.lookup(7, 3), lat[[1, 2, 3]].mean(axis=0))
    np.testing.assert_allclose(store.lookup(7, 9), lat[0])   # unseen cate -> null
    np.testing.assert_allclose(store.lookup(99, 3), lat[0])  # unseen user -> null
    g = store.gather(np.array([7, 99]), np.array([[3, 9], [3, 3]]))
    assert g.shape == (2, 2, 2, 2, 1)
    np.testing.assert_allclose(g[0, 0], lat[[1, 2, 3]].mean(axis=0))
    np.testing.assert_allclose(g[1, 1], lat[0])


def test_train_loader_resume_determinism():
    N = 103
    t = OutfitTable(
        uids=np.arange(N), oids=np.arange(N),
        outfits=np.tile(np.arange(1, 5), (N, 1)),
        category=np.tile(np.arange(4), (N, 1)),
    )
    loader = TrainLoader(t, batch_size=10, seed=123)
    assert loader.steps_per_epoch() == 10
    b5 = loader.batch_at(5)
    # fresh loader, same seed -> identical batch at the same global step (O(1) resume)
    b5b = TrainLoader(t, batch_size=10, seed=123).batch_at(5)
    np.testing.assert_array_equal(b5["uids"], b5b["uids"])
    # different epochs get different permutations
    e0 = loader.epoch_order(0)
    e1 = loader.epoch_order(1)
    assert not np.array_equal(e0, e1)
    # all rows covered each epoch
    assert sorted(e0.tolist()) == list(range(N))


# ---------------------------------------------------------------------------
# Preprocessing
# ---------------------------------------------------------------------------

def test_null_image_is_white():
    img = make_null_image(16)
    assert img.shape == (16, 16, 3)
    np.testing.assert_allclose(img, 1.0)


def test_to_model_input_range_and_shape():
    from PIL import Image

    arr = (np.random.RandomState(0).rand(100, 60, 3) * 255).astype(np.uint8)
    img = Image.fromarray(arr)
    out = to_model_input(img, size=32)
    assert out.shape == (32, 32, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_denormalize_roundtrip():
    x = np.array([[[[0.0, 0.5, 1.0]]]])
    out = denormalize_to_uint8(x)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0, 0, 0], [0, 128, 255])


def test_hist_store_empty_history_list_falls_back_to_null():
    """{uid: {cate: []}} must not poison conditioning with a NaN mean latent."""
    from difashion_tpu.data.datasets import HistLatentStore

    lat = np.arange(24, dtype=np.float32).reshape(3, 2, 2, 2)
    store = HistLatentStore.from_catalog({1: {2: [], 3: [1, 2]}}, lat)
    np.testing.assert_array_equal(store.lookup(1, 2), store.null)   # empty -> null
    np.testing.assert_array_equal(store.lookup(1, 3), lat[[1, 2]].mean(0))
    assert np.isfinite(store.gather(np.array([1]), np.array([[2, 3]]))).all()


def test_train_loader_batch_larger_than_table_errors():
    from difashion_tpu.data.datasets import OutfitTable, TrainLoader

    t = OutfitTable(uids=np.arange(3), oids=np.arange(3),
                    outfits=np.ones((3, 4), np.int64),
                    category=np.ones((3, 4), np.int64))
    loader = TrainLoader(t, batch_size=8)
    with pytest.raises(ValueError, match="3 rows < batch_size 8"):
        loader.batch_at(0)


def test_tokenize_outfits_empty_table():
    from difashion_tpu.data.datasets import OutfitTable
    from difashion_tpu.data.precompute import tokenize_outfits
    from difashion_tpu.data.tokenizer import HashTokenizer

    t = OutfitTable(uids=np.zeros(0, np.int64), oids=np.zeros(0, np.int64),
                    outfits=np.zeros((0, 4), np.int64),
                    category=np.zeros((0, 4), np.int64))
    ids = tokenize_outfits(t, {1: "shoes"}, HashTokenizer(vocab_size=100))
    assert ids.shape == (0, 4, 77)
