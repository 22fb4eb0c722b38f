"""Eval-layer tests: metric math (closed forms + torch-composed references),
compatibility net parity with an equivalent torch module, backbone structural checks,
and importer coverage."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difashion_tpu.eval.metrics import (
    clip_image_score,
    clip_score,
    fid_from_features,
    frechet_distance,
    inception_metrics,
    personalization_sim,
    retrieval_accuracy,
    topn_recall,
)
from difashion_tpu.eval.models.compat import (
    FashionEvaluator,
    gather_outfit_feats,
    import_compat_params,
    init_fashion_evaluator,
)
from difashion_tpu.eval.models.lpips import LPIPS, import_vgg_params, init_lpips
from difashion_tpu.eval.models.open_clip_vit import (
    CLIPImageEncoder,
    CLIPTextTower,
    TextConfig,
    ViTConfig,
    import_openclip_params,
    init_clip_image,
    init_clip_text_tower,
    preprocess_clip_image,
)


# ---------------------------------------------------------------------------
# Metric math
# ---------------------------------------------------------------------------

def test_frechet_distance_closed_forms():
    rng = np.random.RandomState(0)
    d = 8
    A = rng.randn(d, d)
    sigma = A @ A.T + np.eye(d)
    mu = rng.randn(d)
    # identical distributions -> 0
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6
    # same covariance, shifted mean -> ||shift||^2
    shift = rng.randn(d)
    fd = frechet_distance(mu, sigma, mu + shift, sigma)
    np.testing.assert_allclose(fd, shift @ shift, rtol=1e-6, atol=1e-6)
    # diagonal covariances: closed form sum (sqrt(s1)-sqrt(s2))^2
    s1 = np.diag(rng.rand(d) + 0.5)
    s2 = np.diag(rng.rand(d) + 0.5)
    fd = frechet_distance(np.zeros(d), s1, np.zeros(d), s2)
    expect = np.sum((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2)
    np.testing.assert_allclose(fd, expect, rtol=1e-6, atol=1e-6)


def test_fid_from_features_sanity():
    rng = np.random.RandomState(1)
    a = rng.randn(500, 16)
    b = rng.randn(500, 16) + 2.0
    same = fid_from_features(a, a.copy())
    diff = fid_from_features(a, b)
    assert same < 1e-6
    assert diff > 10.0


def test_inception_metrics_formula():
    """Check against a hand-computed case."""
    probs = np.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]])
    labels = np.array([0, 0])
    m = inception_metrics(probs, labels)
    assert m["acc"] == 0.5
    eps = 1e-16
    ent = np.mean([-np.sum(p * np.log(p + eps)) for p in probs])
    np.testing.assert_allclose(m["entropy_mean"], ent, rtol=1e-6)
    u = np.ones(3) / 3
    kl = np.mean([np.sum(p * (np.log(p + eps) - np.log(u))) for p in probs])
    np.testing.assert_allclose(m["is_mean"], np.exp(kl), rtol=1e-6)
    # uniform predictions -> IS == 1, entropy == log(K)
    uni = np.full((4, 3), 1 / 3)
    m2 = inception_metrics(uni, np.zeros(4, np.int64))
    np.testing.assert_allclose(m2["is_mean"], 1.0, rtol=1e-5)
    np.testing.assert_allclose(m2["entropy_mean"], np.log(3), rtol=1e-5)


def test_clip_scores_match_torch_cosine():
    from golden_oracle import oracle

    rng = np.random.RandomState(2)
    a = rng.randn(10, 32).astype(np.float32)
    b = rng.randn(10, 32).astype(np.float32)
    ours = clip_score(a, b)

    def compute():
        import torch

        an = torch.nn.functional.normalize(torch.from_numpy(a), dim=-1)
        bn = torch.nn.functional.normalize(torch.from_numpy(b), dim=-1)
        r = (100 * torch.nn.functional.cosine_similarity(an, bn)).mean().item()
        return {"ref": np.float64(r)}

    ref = float(oracle("metric_clip_cosine", compute)["ref"])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    np.testing.assert_allclose(clip_image_score(a, b), ref, rtol=1e-5)
    np.testing.assert_allclose(personalization_sim(a, b), ref, rtol=1e-5)


def test_retrieval_accuracy_grd_at_zero():
    rng = np.random.RandomState(3)
    gen = rng.randn(20, 16)
    cands = rng.randn(20, 5, 16)
    cands[:, 0] = gen + 0.01 * rng.randn(20, 16)  # grd nearly identical
    acc, preds = retrieval_accuracy(gen, cands)
    assert acc == 1.0 and (preds == 0).all()
    # adversarial: make candidate 3 the nearest for half the rows
    cands[:10, 3] = gen[:10]
    acc2, preds2 = retrieval_accuracy(gen, cands)
    assert acc2 == 0.5 and (preds2[:10] == 3).all()


def test_topn_recall():
    rng = np.random.RandomState(4)
    D = 8
    gen = rng.randn(3, D)
    pools = [np.arange(100, 120), np.arange(200, 230), np.arange(300, 305)]
    embs = [rng.randn(len(p), D) for p in pools]
    # plant ground truth as nearest in row 0, 5th-nearest-ish in row 1, absent in row 2
    embs[0][7] = gen[0]
    grds = [107, 205, 999]
    preds, recalls = topn_recall(gen, pools, embs, grds, topN=(1, 10, 20))
    assert preds[0] == 107
    assert recalls[20] <= 1.0 and recalls[1] >= 1 / 3 - 1e-9
    # absent grd can never be recalled
    assert recalls[20] < 1.0


# ---------------------------------------------------------------------------
# Compatibility net
# ---------------------------------------------------------------------------

def test_compat_forward_shapes_and_pair_invariance():
    model, params = init_fashion_evaluator(32, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 4, 32))
    out = model.apply({"params": params}, x)
    assert out.shape == (5,)
    assert np.isfinite(np.asarray(out)).all()


def test_compat_torch_parity():
    """Import weights from an equivalent torch module; outputs must match.
    The torch module is the WEIGHT SOURCE here, so the fixture stores both the
    state dict and the reference outputs (golden_oracle, VERDICT r4 #3)."""
    from golden_oracle import oracle

    x = np.random.RandomState(5).randn(3, 4, 64).astype(np.float32)

    def compute():
        import torch

        nn_ = torch.nn

        class TorchEvaluator(nn_.Module):
            def __init__(self, d):
                super().__init__()
                self.feat_layer = nn_.Linear(d, 1024)
                self.emb_layer = nn_.Sequential(
                    nn_.Linear(2048, 512), nn_.LayerNorm(512), nn_.ReLU(), nn_.Dropout(0.35),
                    nn_.Linear(512, 512), nn_.LayerNorm(512), nn_.ReLU(), nn_.Dropout(0.35),
                    nn_.Linear(512, 256), nn_.LayerNorm(256), nn_.ReLU(), nn_.Dropout(0.35),
                    nn_.Linear(256, 256), nn_.LayerNorm(256), nn_.ReLU(), nn_.Dropout(0.35),
                )
                self.eval_layer = nn_.Sequential(
                    nn_.Linear(256, 128), nn_.LayerNorm(128), nn_.ReLU(), nn_.Dropout(0.35),
                    nn_.Linear(128, 128), nn_.LayerNorm(128), nn_.ReLU(), nn_.Dropout(0.35),
                    nn_.Linear(128, 32), nn_.LayerNorm(32), nn_.ReLU(), nn_.Dropout(0.35),
                    nn_.Linear(32, 1),
                )

            def forward(self, feats):
                from itertools import combinations

                combs = [list(c) for c in combinations(range(feats.shape[1]), 2)]
                o_embs = []
                for o in feats:
                    f = self.feat_layer(o)
                    cf = torch.stack([f[c].reshape(-1) for c in combs])
                    o_embs.append(self.emb_layer(cf).mean(dim=0))
                return self.eval_layer(torch.stack(o_embs)).view(-1)

        torch.manual_seed(13)
        tm = TorchEvaluator(64).eval()
        out = {"sd." + k: v.detach().numpy() for k, v in tm.state_dict().items()}
        with torch.no_grad():
            out["ref"] = tm(torch.from_numpy(x)).numpy()
        return out

    fix = oracle("compat_evaluator", compute)
    sd = {k[3:]: v for k, v in fix.items() if k.startswith("sd.")}
    model, template = init_fashion_evaluator(64, jax.random.PRNGKey(2))
    params = import_compat_params(template, sd)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, fix["ref"], rtol=1e-4, atol=1e-4)


def test_gather_outfit_feats_pointer_convention():
    cat = np.arange(10)[:, None].repeat(3, 1).astype(np.float32)
    gen = -np.arange(5)[:, None].repeat(3, 1).astype(np.float32) - 100
    outfits = np.array([[1, 2, -1], [0, 3, -2]])
    out = gather_outfit_feats(outfits, cat, gen)
    np.testing.assert_allclose(out[0, 0], cat[1])
    np.testing.assert_allclose(out[0, 2], gen[1])    # iid -1 -> gen[1]
    np.testing.assert_allclose(out[1, 0], gen[0])    # iid 0 -> gen[0]
    np.testing.assert_allclose(out[1, 2], gen[2])


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

def test_lpips_identity_is_zero():
    model, params = init_lpips(jax.random.PRNGKey(0), size=32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
    d = model.apply({"params": params}, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1
    d2 = model.apply({"params": params}, x, y)
    assert (np.asarray(d2) > 0).all()


def test_vgg_import_shapes():
    model, params = init_lpips(jax.random.PRNGKey(3), size=32)
    # synthetic torchvision-style state dict with correct shapes
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
    rng = np.random.RandomState(6)
    sd = {}
    for ti, (ci, co) in zip(tv_idx, chans):
        sd[f"features.{ti}.weight"] = rng.randn(co, ci, 3, 3).astype(np.float32)
        sd[f"features.{ti}.bias"] = rng.randn(co).astype(np.float32)
    new_vgg = import_vgg_params(params["vgg"], sd)
    np.testing.assert_allclose(
        new_vgg["conv_0"]["kernel"],
        np.transpose(sd["features.0.weight"], (2, 3, 1, 0)),
    )
    assert new_vgg["conv_12"]["kernel"].shape == (3, 3, 512, 512)


# ---------------------------------------------------------------------------
# OpenCLIP ViT
# ---------------------------------------------------------------------------

def test_clip_vit_tiny_shapes():
    vcfg, tcfg = ViTConfig.tiny(), TextConfig.tiny()
    vm, vp = init_clip_image(vcfg, jax.random.PRNGKey(0))
    tm, tp = init_clip_text_tower(tcfg, jax.random.PRNGKey(1))
    img = jnp.zeros((2, vcfg.image_size, vcfg.image_size, 3))
    emb = vm.apply({"params": vp}, img)
    assert emb.shape == (2, vcfg.embed_dim)
    ids = jnp.zeros((2, 77), jnp.int32).at[:, 0].set(1).at[:, 5].set(999)
    temb = tm.apply({"params": tp}, ids)
    assert temb.shape == (2, tcfg.embed_dim)


def test_openclip_import_roundtrip():
    """Build an openclip-style state dict from our params, re-import, verify."""
    vcfg, tcfg = ViTConfig.tiny(), TextConfig.tiny()
    vm, vp = init_clip_image(vcfg, jax.random.PRNGKey(2))
    tm, tp = init_clip_text_tower(tcfg, jax.random.PRNGKey(3))

    sd = {}
    sd["visual.conv1.weight"] = np.transpose(
        np.asarray(vp["patch_embed"]["kernel"]), (3, 2, 0, 1)
    )
    sd["visual.class_embedding"] = np.asarray(vp["class_embedding"])
    sd["visual.positional_embedding"] = np.asarray(vp["positional_embedding"])
    sd["visual.proj"] = np.asarray(vp["proj"])
    for ln in ("ln_pre", "ln_post"):
        sd[f"visual.{ln}.weight"] = np.asarray(vp[ln]["scale"])
        sd[f"visual.{ln}.bias"] = np.asarray(vp[ln]["bias"])
    for prefix, tree, n in (("visual.", vp, vcfg.layers), ("", tp, tcfg.layers)):
        for i in range(n):
            b = tree[f"resblocks_{i}"]
            p = f"{prefix}transformer.resblocks.{i}."
            sd[p + "ln_1.weight"] = np.asarray(b["ln_1"]["scale"])
            sd[p + "ln_1.bias"] = np.asarray(b["ln_1"]["bias"])
            sd[p + "ln_2.weight"] = np.asarray(b["ln_2"]["scale"])
            sd[p + "ln_2.bias"] = np.asarray(b["ln_2"]["bias"])
            sd[p + "attn.in_proj_weight"] = np.asarray(b["in_proj"]["kernel"]).T
            sd[p + "attn.in_proj_bias"] = np.asarray(b["in_proj"]["bias"])
            sd[p + "attn.out_proj.weight"] = np.asarray(b["out_proj"]["kernel"]).T
            sd[p + "attn.out_proj.bias"] = np.asarray(b["out_proj"]["bias"])
            sd[p + "mlp.c_fc.weight"] = np.asarray(b["c_fc"]["kernel"]).T
            sd[p + "mlp.c_fc.bias"] = np.asarray(b["c_fc"]["bias"])
            sd[p + "mlp.c_proj.weight"] = np.asarray(b["c_proj"]["kernel"]).T
            sd[p + "mlp.c_proj.bias"] = np.asarray(b["c_proj"]["bias"])
    sd["token_embedding.weight"] = np.asarray(tp["token_embedding"]["embedding"])
    sd["positional_embedding"] = np.asarray(tp["positional_embedding"])
    sd["ln_final.weight"] = np.asarray(tp["ln_final"]["scale"])
    sd["ln_final.bias"] = np.asarray(tp["ln_final"]["bias"])
    sd["text_projection"] = np.asarray(tp["text_projection"])

    vis2, txt2 = import_openclip_params(vp, tp, sd)
    for a, b in zip(jax.tree_util.tree_leaves(vp), jax.tree_util.tree_leaves(vis2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(tp), jax.tree_util.tree_leaves(txt2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preprocess_clip_image():
    imgs = np.random.RandomState(7).rand(2, 64, 48, 3).astype(np.float32)
    out = preprocess_clip_image(imgs, size=32)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# Inception
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_inception_structure():
    from difashion_tpu.eval.models.inception import init_inception

    model, variables = init_inception(
        jax.random.PRNGKey(0), num_classes=50, transform_input=True
    )
    x = jnp.zeros((1, 299, 299, 3))
    probs = model.apply(variables, x)
    assert probs.shape == (1, 50)
    np.testing.assert_allclose(float(jnp.sum(probs)), 1.0, rtol=1e-5)
    feats = model.apply(variables, x, features_only=True)
    assert feats.shape == (1, 2048)


@pytest.mark.slow
def test_fid_inception_variant_differs():
    from difashion_tpu.eval.models.inception import init_inception

    rng = jax.random.PRNGKey(1)
    m1, v1 = init_inception(rng, fid=False)
    m2, v2 = init_inception(rng, fid=True)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 299, 299, 3)) * 2 - 1
    f1 = m1.apply(v1, x)
    f2 = m2.apply(v2, x)
    assert f1.shape == f2.shape == (1, 2048)
    # same seed -> same weights; behavioral deltas (pool modes) must show up
    assert not np.allclose(np.asarray(f1), np.asarray(f2))


@pytest.mark.slow
def test_inception_importer_coverage():
    """Build a synthetic torchvision-style state dict covering every conv/bn/fc of our
    Inception tree and verify the importer fills params AND batch stats."""
    import jax.tree_util as jtu

    from difashion_tpu.eval.models.inception import (
        import_inception_params,
        init_inception,
    )

    model, variables = init_inception(jax.random.PRNGKey(0), num_classes=7)
    rng = np.random.RandomState(0)
    sd = {}

    def walk(tree, stats, prefix):
        for name, sub in tree.items():
            key = prefix + name if not prefix else prefix + "." + name
            if name == "conv" and "kernel" in sub:
                k = np.asarray(sub["kernel"])
                # small magnitude: random weights through ~94 convs otherwise overflow
                sd[key + ".weight"] = (0.05 * rng.randn(
                    k.shape[3], k.shape[2], k.shape[0], k.shape[1]
                )).astype(np.float32)
            elif name == "bn" and "scale" in sub:
                n = np.asarray(sub["scale"]).shape[0]
                sd[key + ".weight"] = rng.rand(n).astype(np.float32) + 0.5
                sd[key + ".bias"] = rng.randn(n).astype(np.float32)
                sd[key + ".running_mean"] = rng.randn(n).astype(np.float32)
                sd[key + ".running_var"] = rng.rand(n).astype(np.float32) + 0.5
            elif name == "fc" and "kernel" in sub:
                k = np.asarray(sub["kernel"])
                sd["fc.weight"] = rng.randn(k.shape[1], k.shape[0]).astype(np.float32)
                sd["fc.bias"] = rng.randn(k.shape[1]).astype(np.float32)
            elif isinstance(sub, dict):
                walk(sub, stats.get(name, {}), key)

    walk(variables["params"], variables.get("batch_stats", {}), "")
    new_vars = import_inception_params(variables, sd, num_classes=7)

    # every conv kernel and bn stat must have been replaced (not equal to init)
    def check(tree, new_tree, prefix):
        for name, sub in tree.items():
            if isinstance(sub, dict):
                check(sub, new_tree[name], prefix + "/" + name)
            else:
                if name in ("kernel", "scale", "mean", "var"):
                    assert not np.allclose(
                        np.asarray(sub), np.asarray(new_tree[name])
                    ), prefix + "/" + name

    check(variables["params"], new_vars["params"], "")
    check(variables["batch_stats"], new_vars["batch_stats"], "")
    # imported net still runs and softmaxes
    probs = model.apply(new_vars, jnp.zeros((1, 299, 299, 3)))
    np.testing.assert_allclose(float(jnp.sum(probs)), 1.0, rtol=1e-4)
