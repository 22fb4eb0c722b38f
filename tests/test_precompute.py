"""Catalog precompute + processed-cache contract tests (tiny VAE, synthetic data)."""
import os

import jax
import numpy as np
import pytest

from difashion_tpu.core.config import ModelConfig
from difashion_tpu.data import FashionData, HashTokenizer, OutfitTable
from difashion_tpu.data.precompute import (
    build_processed_cache,
    encode_catalog,
    load_processed,
    moments_to_scaled_modes,
    tokenize_outfits,
)
from difashion_tpu.models import create_difashion


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def test_encode_catalog_moments(tiny):
    cfg, model, params = tiny
    s = cfg.vae.sample_size
    rng = np.random.RandomState(0)
    imgs = rng.rand(10, s, s, 3).astype(np.float32) * 2 - 1
    moments = encode_catalog(model, params, lambda i: imgs[i], 10, batch_size=4)
    lat = s // cfg.vae.scale_factor
    assert moments["mean"].shape == (10, lat, lat, cfg.vae.latent_channels)
    assert moments["logvar"].shape == moments["mean"].shape
    scaled = moments_to_scaled_modes(moments, cfg.vae.scaling_factor)
    np.testing.assert_allclose(
        scaled, moments["mean"] * cfg.vae.scaling_factor, rtol=1e-6
    )
    # batching must not change results
    moments2 = encode_catalog(model, params, lambda i: imgs[i], 10, batch_size=10)
    np.testing.assert_allclose(moments["mean"], moments2["mean"], rtol=1e-4,
                               atol=1e-5)


def test_tokenize_outfits_shapes():
    table = OutfitTable(
        uids=np.arange(3), oids=np.arange(3),
        outfits=np.ones((3, 4), np.int64),
        category=np.array([[1, 2, 3, 4], [2, 2, 2, 2], [4, 3, 2, 1]]),
    )
    tok = HashTokenizer()
    ids = tokenize_outfits(table, {c: f"cate{c}" for c in range(1, 5)}, tok)
    assert ids.shape == (3, 4, 77)
    # same category -> same ids row
    np.testing.assert_array_equal(ids[1, 0], ids[1, 3])
    np.testing.assert_array_equal(ids[0, 1], ids[2, 2])


def test_build_processed_cache(tiny, tmp_path):
    cfg, model, params = tiny
    lat = cfg.vae.sample_size // cfg.vae.scale_factor
    rng = np.random.RandomState(1)
    moments = {
        "mean": rng.randn(12, lat, lat, 4).astype(np.float32),
        "logvar": np.full((12, lat, lat, 4), -6.0, np.float32),
    }
    table = OutfitTable(
        uids=np.array([1, 2]), oids=np.array([10, 11]),
        outfits=np.array([[1, 2, 3, 4], [5, 6, 7, 8]]),
        category=np.array([[1, 2, 3, 4], [1, 1, 2, 2]]),
    )
    data = FashionData(
        train=table, fitb_valid=None, fitb_test=None, valid_grd=None,
        test_grd=None, history={"train": {1: {2: [3, 4]}}},
        id_cate_dict={c: f"cate{c}" for c in range(1, 5)},
        cate_iid_dict=None, retrieval_candidates={},
    )
    out = build_processed_cache(
        str(tmp_path), data, data.id_cate_dict, HashTokenizer(), moments,
        cfg.vae.scaling_factor,
    )
    assert os.path.exists(out["all_item_latents"])
    assert os.path.exists(out["new_train"])
    z = np.load(out["new_train"])
    assert z["input_ids"].shape == (2, 4, 77)
    hl = np.load(out["train_hist_latents"], allow_pickle=True).item()
    assert "null" in hl and 1 in hl
    np.testing.assert_allclose(
        hl[1][2],
        (moments["mean"][3] + moments["mean"][4]) / 2 * cfg.vae.scaling_factor,
        rtol=1e-5,
    )
    # moments reloadable through load_processed
    m = load_processed(str(tmp_path), "all_item_moments")
    np.testing.assert_allclose(m["mean"], moments["mean"])
