"""Eval-backbone exporter round-trip: our params -> torch-layout safetensors on
disk -> `build_extractors` import -> numerically identical outputs.

This is the weights-arrival drill at the module level (VERDICT r2 #2): the files
written by `tools/export_eval_weights.py` have the exact layout real weights
arrive in, and a strict (`allow_random=False`) build must consume them with zero
towers left at random init.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tools"))

from export_eval_weights import export_weights_dir, write_clip_vocab  # noqa: E402

from difashion_tpu.eval.extractors import build_extractors  # noqa: E402

SEED = 3  # distinct from build_extractors' internal PRNGKey(0) so the import
          # is proven to transfer values, not to coincide with the template init


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("evalw"))
    export_weights_dir(out, tiny=True, seed=SEED, num_classes=7, n_merges=60)
    return out


def _originals():
    from difashion_tpu.eval.models.compat import init_fashion_evaluator
    from difashion_tpu.eval.models.inception import init_inception
    from difashion_tpu.eval.models.lpips import init_lpips
    from difashion_tpu.eval.models.open_clip_vit import (
        TextConfig,
        ViTConfig,
        init_clip_image,
        init_clip_text_tower,
    )

    ks = jax.random.split(jax.random.PRNGKey(SEED), 6)
    vcfg, tcfg = ViTConfig.tiny(), TextConfig.tiny()
    vis_m, vis_p = init_clip_image(vcfg, ks[0])
    txt_m, txt_p = init_clip_text_tower(tcfg, ks[1])
    fid_m, fid_v = init_inception(ks[2], fid=True)
    cls_m, cls_v = init_inception(ks[3], num_classes=7, transform_input=True)
    lp_m, lp_p = init_lpips(ks[4])
    cp_m, cp_p = init_fashion_evaluator(vcfg.embed_dim, ks[5])
    return (vcfg, tcfg, (vis_m, vis_p), (txt_m, txt_p), (fid_m, fid_v),
            (cls_m, cls_v), (lp_m, lp_p), (cp_m, cp_p))


def test_exported_weights_dir_loads_strict_and_matches(weights_dir):
    X = build_extractors(weights_dir, num_classes=7, tiny=True,
                         allow_random=False, rng=jax.random.PRNGKey(99))
    assert X.random_towers == ()

    (vcfg, tcfg, (vis_m, vis_p), (txt_m, txt_p), (fid_m, fid_v),
     (cls_m, cls_v), (lp_m, lp_p), (cp_m, cp_p)) = _originals()

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, vcfg.image_size, vcfg.image_size, 3)
                      .astype(np.float32))
    ids = jnp.asarray(rng.randint(0, tcfg.vocab_size, size=(2, tcfg.context_length))
                      .astype(np.int32))
    big = jnp.asarray(rng.rand(2, 75, 75, 3).astype(np.float32) * 2 - 1)
    pair = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    feats = jnp.asarray(rng.rand(2, 4, vcfg.embed_dim).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(X.clip_image_fn(img)),
        np.asarray(vis_m.apply({"params": vis_p}, img)), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(X.clip_text_fn(ids)),
        np.asarray(txt_m.apply({"params": txt_p}, ids)), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(X.fid_features_fn(big)),
        np.asarray(fid_m.apply(fid_v, big)), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(X.inception_probs_fn(big)),
        np.asarray(cls_m.apply(cls_v, big)), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(X.lpips_fn(pair, pair[::-1])),
        np.asarray(lp_m.apply({"params": lp_p}, pair, pair[::-1])),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(X.compat_fn(feats)),
        np.asarray(cp_m.apply({"params": cp_p}, feats)), rtol=2e-5, atol=2e-5)


def test_exported_tokenizer_is_real_bpe(weights_dir):
    from difashion_tpu.data.tokenizer import CLIPBPETokenizer, load_tokenizer

    tok = load_tokenizer(os.path.join(weights_dir, "tokenizer"), strict=True)
    assert isinstance(tok, CLIPBPETokenizer)
    ids = tok(["a photo of a dress, on white background"])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.bos_id and tok.eos_id in ids[0]


def test_write_clip_vocab_id_range(tmp_path):
    """Vocab ids stay under the tiny text towers' vocab_size=1000 so the same
    asset drives both the generation text encoder and the eval CLIP tower."""
    import json

    write_clip_vocab(str(tmp_path), n_merges=200, seed=1)
    vocab = json.load(open(tmp_path / "vocab.json"))
    assert max(vocab.values()) < 1000
    assert "<|startoftext|>" in vocab and "<|endoftext|>" in vocab
