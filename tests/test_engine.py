"""Engine tests: guidance-spec algebra, mutual-condition assembly, full sampler scan,
training step (+EMA, +DP sharding on the 8-device CPU mesh)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difashion_tpu.core.config import Config, ModelConfig, TrainConfig
from difashion_tpu.engine import (
    GenerationInputs,
    TrainBatch,
    build_sampler,
    build_train_step,
    decode_and_postprocess,
    make_guidance_spec,
    make_mesh,
    shard_train_step,
)
from difashion_tpu.engine.generate import mutual_condition_input
from difashion_tpu.models import create_difashion


# ---------------------------------------------------------------------------
# Guidance spec
# ---------------------------------------------------------------------------

def test_guidance_full_matches_reference_combine():
    """sum(w * eps) must equal the reference 4-branch formula (difashion.py:525-532)."""
    spec = make_guidance_spec(12.0, 4.0, 5.0)
    assert spec.num_branches == 4
    rng = np.random.RandomState(0)
    eps = rng.randn(4, 3, 2, 2, 4).astype(np.float32)
    allcond, cate_mutual, cate, uncond = eps
    ref = (
        uncond
        + 4.0 * (allcond - cate_mutual)
        + 5.0 * (cate_mutual - cate)
        + 12.0 * (cate - uncond)
    )
    ours = np.tensordot(spec.weights, eps, axes=(0, 0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "cs,hs,ms,uh,um,nb",
    [
        (12.0, 4.0, 5.0, True, True, 4),
        (12.0, 4.0, 1.0, True, True, 3),   # mutual CFG off
        (12.0, 1.0, 5.0, True, True, 3),   # hist CFG off
        (12.0, 1.0, 1.0, True, True, 2),   # category only
        (1.0, 4.0, 1.0, True, True, 2),    # hist only
        (1.0, 1.0, 5.0, True, True, 2),    # mutual only
        (1.0, 4.0, 5.0, True, True, 2),    # !C & H & M quirk -> 2 branches
        (1.0, 1.0, 1.0, True, True, 1),    # no guidance
        (12.0, 4.0, 5.0, False, False, 2), # features disabled -> category only
    ],
)
def test_guidance_branch_counts(cs, hs, ms, uh, um, nb):
    spec = make_guidance_spec(cs, hs, ms, use_history=uh, use_mutual=um)
    assert spec.num_branches == nb
    np.testing.assert_allclose(spec.weights.sum(), 1.0, rtol=1e-6)


def test_guidance_weights_collapse_to_identity():
    """All scales 1 -> single unweighted branch with all-real conditions."""
    spec = make_guidance_spec(1.0, 1.0, 1.0)
    assert spec.num_branches == 1
    assert spec.hist_sel[0] == 1.0 and spec.mutual_sel[0] == 1.0


# ---------------------------------------------------------------------------
# Mutual condition assembly
# ---------------------------------------------------------------------------

def test_mutual_condition_matches_loop_reference():
    """Dense masked formulation == per-slot Python loop (FITB + GOR mixed batch)."""
    B, olen, h, w, C = 3, 4, 2, 2, 4
    rng = np.random.RandomState(1)
    known = rng.randn(B, olen, h, w, C).astype(np.float32)
    # outfit 0: generate slot 2; outfit 1: generate all 4; outfit 2: generate slots 0,3
    gen_mask = np.zeros((B, olen), bool)
    gen_mask[0, 2] = True
    gen_mask[1, :] = True
    gen_mask[2, [0, 3]] = True
    fills = [(b, j) for b in range(B) for j in range(olen) if gen_mask[b, j]]
    F = len(fills)
    latents = rng.randn(F, h, w, C).astype(np.float32)
    gen_index = np.zeros((B, olen), np.int32)
    for k, (b, j) in enumerate(fills):
        gen_index[b, j] = k
    outfit_idx = np.array([b for b, _ in fills], np.int32)

    out = np.asarray(
        mutual_condition_input(
            jnp.asarray(latents), jnp.asarray(outfit_idx), jnp.asarray(known),
            jnp.asarray(gen_mask), jnp.asarray(gen_index),
        )
    )

    for k, (b, jslot) in enumerate(fills):
        expect = np.zeros((h, w, C), np.float32)
        for j in range(olen):
            if j == jslot:
                continue
            if gen_mask[b, j]:
                expect += latents[gen_index[b, j]]
            else:
                expect += known[b, j]
        np.testing.assert_allclose(out[k], expect, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Sampler
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def _gen_inputs(cfg, model, params, key, B=2, mode="fitb"):
    olen = 4
    hdim = cfg.unet.sample_size
    C = cfg.vae.latent_channels
    D = cfg.text.hidden_size
    if mode == "fitb":
        gen_mask = np.zeros((B, olen), bool)
        gen_mask[:, 1] = True
    else:  # gor
        gen_mask = np.ones((B, olen), bool)
    fills = [(b, j) for b in range(B) for j in range(olen) if gen_mask[b, j]]
    F = len(fills)
    gen_index = np.zeros((B, olen), np.int32)
    for k, (b, j) in enumerate(fills):
        gen_index[b, j] = k
    ks = jax.random.split(key, 5)
    init = jax.random.normal(ks[0], (F, hdim, hdim, C))
    known = jax.random.normal(ks[1], (B, olen, hdim, hdim, C)) * 0.1
    hist = jax.random.normal(ks[2], (F, hdim, hdim, C)) * 0.1
    ids = jnp.zeros((F, 77), jnp.int32)
    cate_text = model.encode_text(params, ids)
    null_text = model.encode_text(params, jnp.zeros((1, 77), jnp.int32))[0]
    null_latent = jnp.zeros((hdim, hdim, C))
    return GenerationInputs(
        init_latents=init,
        outfit_idx=jnp.asarray([b for b, _ in fills], jnp.int32),
        known_latents=known,
        gen_mask=jnp.asarray(gen_mask),
        gen_index=jnp.asarray(gen_index),
        hist_latents=hist,
        cate_text=cate_text,
        null_text=null_text,
        null_latent=null_latent,
    ), F


@pytest.mark.parametrize("scheduler", ["pndm", "ddim", "dpmpp"])
@pytest.mark.parametrize("mode", ["fitb", "gor"])
def test_sampler_runs(tiny_model, scheduler, mode):
    cfg, model, params = tiny_model
    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = build_sampler(
        model, num_inference_steps=3, spec=spec, eta=0.1, scheduler=scheduler
    )
    inputs, F = _gen_inputs(cfg, model, params, jax.random.PRNGKey(1), mode=mode)
    lat = jax.jit(sampler)(params, inputs)
    s = cfg.unet.sample_size
    assert lat.shape == (F, s, s, cfg.vae.latent_channels)
    assert np.isfinite(np.asarray(lat)).all()
    imgs = decode_and_postprocess(model, params, lat)
    assert imgs.shape == (F, cfg.vae.sample_size, cfg.vae.sample_size, 3)
    assert float(jnp.min(imgs)) >= 0.0 and float(jnp.max(imgs)) <= 1.0


def test_sampler_guidance_scale_changes_output(tiny_model):
    cfg, model, params = tiny_model
    inputs, _ = _gen_inputs(cfg, model, params, jax.random.PRNGKey(2))
    out = {}
    for cs in (1.0, 12.0):
        spec = make_guidance_spec(cs, 1.0, 1.0)
        sampler = build_sampler(
            model, num_inference_steps=3, spec=spec, eta=0.1
        )
        out[cs] = np.asarray(sampler(params, inputs))
    assert not np.allclose(out[1.0], out[12.0])


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def _train_batch(cfg, key, B=2):
    olen = 4
    hdim = cfg.unet.sample_size
    C = cfg.vae.latent_channels
    ks = jax.random.split(key, 4)
    return TrainBatch(
        images=None,
        latent_mean=jax.random.normal(ks[0], (B, olen, hdim, hdim, C)) * 0.5,
        latent_logvar=jnp.full((B, olen, hdim, hdim, C), -6.0),
        input_ids=jnp.zeros((B, olen, 77), jnp.int32),
        hist_latents=jax.random.normal(ks[1], (B, olen, hdim, hdim, C)) * 0.1,
    )


def test_train_step_updates_only_trainable(tiny_model):
    cfg, model, params = tiny_model
    tcfg = TrainConfig(learning_rate=1e-3)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    hdim, C = cfg.unet.sample_size, cfg.vae.latent_channels
    batch = _train_batch(cfg, jax.random.PRNGKey(3))
    null_lat = jnp.zeros((hdim, hdim, C))
    null_text = jnp.zeros((77, cfg.text.hidden_size))
    state2, metrics = jax.jit(step_fn)(
        state, batch, null_lat, null_text, jax.random.PRNGKey(4)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # unet + fashion_encoder changed
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["unet"], state2.params["unet"],
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # frozen towers untouched
    for k in ("vae", "text_encoder"):
        same = jax.tree_util.tree_map(
            lambda a, b: bool((a == b).all()), state.params[k], state2.params[k]
        )
        assert all(jax.tree_util.tree_leaves(same))


def test_ema_warmup_decay(tiny_model):
    cfg, model, params = tiny_model
    tcfg = TrainConfig(learning_rate=1e-3)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    batch = _train_batch(cfg, jax.random.PRNGKey(5))
    hdim, C = cfg.unet.sample_size, cfg.vae.latent_channels
    null_lat = jnp.zeros((hdim, hdim, C))
    null_text = jnp.zeros((77, cfg.text.hidden_size))
    jitted = jax.jit(step_fn)
    s = state
    for i in range(3):
        s, _ = jitted(s, batch, null_lat, null_text, jax.random.PRNGKey(i))
    assert int(s.ema.step) == 3
    # step0 decay = 0.1 -> EMA should have moved noticeably toward new params
    e = jax.tree_util.tree_leaves(s.ema.params["unet"])[0]
    p0 = jax.tree_util.tree_leaves(state.params["unet"])[0]
    # EMA differs from the frozen initial params (it tracked updates)
    assert not np.allclose(np.asarray(e), np.asarray(p0))


def test_loss_decreases_over_steps(tiny_model):
    """Overfit a fixed batch for a few steps: loss should drop."""
    cfg, model, params = tiny_model
    tcfg = TrainConfig(learning_rate=3e-3, use_ema=False, use_ema_fashion=False)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    batch = _train_batch(cfg, jax.random.PRNGKey(6))
    hdim, C = cfg.unet.sample_size, cfg.vae.latent_channels
    null_lat = jnp.zeros((hdim, hdim, C))
    null_text = jnp.zeros((77, cfg.text.hidden_size))
    jitted = jax.jit(step_fn)
    losses = []
    for i in range(8):
        # same rng -> same noise/timesteps: pure optimization progress signal
        state, m = jitted(state, batch, null_lat, null_text, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_dp_sharded_step_matches_single_device(tiny_model):
    """8-way DP on the virtual CPU mesh == unsharded math (same rng, same batch)."""
    cfg, model, params = tiny_model
    tcfg = TrainConfig(learning_rate=1e-3, use_ema=False, use_ema_fashion=False)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    batch = _train_batch(cfg, jax.random.PRNGKey(7), B=8)
    hdim, C = cfg.unet.sample_size, cfg.vae.latent_channels
    null_lat = jnp.zeros((hdim, hdim, C))
    null_text = jnp.zeros((77, cfg.text.hidden_size))
    rng = jax.random.PRNGKey(8)

    _, m_single = jax.jit(step_fn)(state, batch, null_lat, null_text, rng)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    jitted, place_batch, place_repl = shard_train_step(step_fn, mesh)
    state_r = place_repl(state)
    batch_s = place_batch(batch)
    _, m_dp = jitted(state_r, batch_s, null_lat, null_text, rng)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-4
    )


def test_donated_step_matches_undonated(tiny_model):
    """The production loop's donated thread-through (`cli/train.py`:
    `state, m = jitted(state, ...)` with donate_state=True — the OOM fix for
    the 13.01 GiB SD2-base state) must be numerically identical to the
    undonated replay path, and its metrics must stay readable after the next
    donated call (the loop logs m after state was re-donated)."""
    cfg, model, params = tiny_model
    tcfg = TrainConfig(learning_rate=1e-3, use_ema=False, use_ema_fashion=False)
    step_fn, init_fn = build_train_step(model, tcfg)
    batch = _train_batch(cfg, jax.random.PRNGKey(21), B=8)
    hdim, C = cfg.unet.sample_size, cfg.vae.latent_channels
    null_lat = jnp.zeros((hdim, hdim, C))
    null_text = jnp.zeros((77, cfg.text.hidden_size))
    mesh = make_mesh()

    def run(donate: bool, n: int = 4):
        jitted, place_batch, place_repl = shard_train_step(
            step_fn, mesh, donate_state=donate)
        # fresh device placement per run: donation deletes the input buffers,
        # so the donated run must not share placements with anything else
        state = place_repl(init_fn(params))
        batch_s = place_batch(batch)
        losses, metrics = [], []
        for i in range(n):
            state, m = jitted(state, batch_s, null_lat, null_text,
                              jax.random.PRNGKey(100 + i))
            metrics.append(m)          # read AFTER later donated calls below
        losses = [float(m["loss"]) for m in metrics]
        leaf = np.asarray(jax.tree_util.tree_leaves(state.params["unet"])[0])
        return losses, leaf

    losses_ref, leaf_ref = run(donate=False)
    losses_don, leaf_don = run(donate=True)
    np.testing.assert_allclose(losses_ref, losses_don, rtol=1e-6)
    np.testing.assert_allclose(leaf_ref, leaf_don, rtol=1e-6, atol=1e-7)


def test_zero1_state_sharding_matches_replicated(tiny_model):
    """ZeRO-1 placement (sharded moments + EMA) must not change the math."""
    from difashion_tpu.engine.train import place_state_zero1

    cfg, model, params = tiny_model
    tcfg = TrainConfig(learning_rate=1e-3)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    batch = _train_batch(cfg, jax.random.PRNGKey(11), B=8)
    hdim, C = cfg.unet.sample_size, cfg.vae.latent_channels
    null_lat = jnp.zeros((hdim, hdim, C))
    null_text = jnp.zeros((77, cfg.text.hidden_size))
    rng = jax.random.PRNGKey(12)

    mesh = make_mesh()
    jitted, place_batch, place_repl = shard_train_step(step_fn, mesh)

    s_repl, m_repl = jitted(place_repl(state), place_batch(batch),
                            null_lat, null_text, rng)
    s_z1, m_z1 = jitted(place_state_zero1(state, mesh), place_batch(batch),
                        null_lat, null_text, rng)
    np.testing.assert_allclose(float(m_repl["loss"]), float(m_z1["loss"]),
                               rtol=1e-5)
    a = jax.tree_util.tree_leaves(s_repl.params["unet"])[0]
    b = jax.tree_util.tree_leaves(s_z1.params["unet"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)
