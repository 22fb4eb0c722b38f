"""Additional engine coverage: gradient accumulation, v-prediction, noise offset,
condition-dropout statistics, and remat."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difashion_tpu.core.config import ModelConfig, SchedulerConfig, TrainConfig
from difashion_tpu.engine import TrainBatch, build_train_step, difashion_loss
from difashion_tpu.engine.train import split_params
from difashion_tpu.models import create_difashion


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def _batch(cfg, key, B=4):
    h, C = cfg.unet.sample_size, cfg.vae.latent_channels
    ks = jax.random.split(key, 2)
    return TrainBatch(
        images=None,
        latent_mean=jax.random.normal(ks[0], (B, 4, h, h, C)) * 0.5,
        latent_logvar=jnp.full((B, 4, h, h, C), -6.0),
        input_ids=jnp.zeros((B, 4, 77), jnp.int32),
        hist_latents=jax.random.normal(ks[1], (B, 4, h, h, C)) * 0.1,
    )


def _nulls(cfg):
    h, C = cfg.unet.sample_size, cfg.vae.latent_channels
    return jnp.zeros((h, h, C)), jnp.zeros((77, cfg.text.hidden_size))


def test_gradient_accumulation_runs(tiny_model):
    cfg, model, params = tiny_model
    tcfg = TrainConfig(learning_rate=1e-3, gradient_accumulation_steps=2,
                       use_ema=False, use_ema_fashion=False)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    nl, nt = _nulls(cfg)
    state2, m = jax.jit(step_fn)(
        state, _batch(cfg, jax.random.PRNGKey(1)), nl, nt, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1


def test_v_prediction_loss(tiny_model):
    cfg, model, params = tiny_model
    tcfg = TrainConfig(prediction_type="v_prediction", snr_gamma=None)
    trainable, frozen = split_params(params)
    nl, nt = _nulls(cfg)
    loss, _ = difashion_loss(
        model, trainable, frozen, _batch(cfg, jax.random.PRNGKey(3)),
        nl, nt, jax.random.PRNGKey(4), tcfg,
    )
    assert np.isfinite(float(loss))


def test_noise_offset_changes_loss(tiny_model):
    cfg, model, params = tiny_model
    trainable, frozen = split_params(params)
    nl, nt = _nulls(cfg)
    batch = _batch(cfg, jax.random.PRNGKey(5))
    rng = jax.random.PRNGKey(6)
    l0, _ = difashion_loss(model, trainable, frozen, batch, nl, nt, rng,
                           TrainConfig(noise_offset=0.0))
    l1, _ = difashion_loss(model, trainable, frozen, batch, nl, nt, rng,
                           TrainConfig(noise_offset=0.5))
    assert float(l0) != float(l1)


def test_condition_dropout_statistics(tiny_model):
    """With dropout windows (0.2, 0.3, 0.2): P(hist masked) = 0.5,
    P(mutual masked) = 0.5, windows overlap on [0.2, 0.5) (difashion.py:186-213).
    Verify by instrumenting the same RNG split the loss uses."""
    cfg = TrainConfig()
    n = 200_000
    rng = jax.random.PRNGKey(7)
    # replicate the loss's r_mask stream semantics
    p = jax.random.uniform(rng, (n,))
    hist_mask = p < cfg.mask_ratio + cfg.coupling_mask_ratio
    mut_mask = (p >= cfg.mask_ratio) & (
        p < 2 * cfg.mask_ratio + cfg.coupling_mask_ratio
    )
    assert abs(float(jnp.mean(hist_mask)) - 0.5) < 0.01
    assert abs(float(jnp.mean(mut_mask)) - 0.5) < 0.01
    both = hist_mask & mut_mask
    assert abs(float(jnp.mean(both)) - 0.3) < 0.01  # overlap [0.2, 0.5)


def test_remat_unet_matches_no_remat(tiny_model):
    cfg, _, _ = tiny_model
    from difashion_tpu.models.unet import UNet2DCondition

    m1 = UNet2DCondition(cfg.unet, remat=False)
    m2 = UNet2DCondition(cfg.unet, remat=True)
    s = cfg.unet.sample_size
    x = jnp.ones((1, s, s, cfg.unet.in_channels))
    t = jnp.array([100])
    c = jnp.ones((1, 77, cfg.unet.cross_attention_dim))
    p = m1.init(jax.random.PRNGKey(8), x, t, c)["params"]
    o1 = m1.apply({"params": p}, x, t, c)
    o2 = m2.apply({"params": p}, x, t, c)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)
    # gradient flows under remat
    g = jax.grad(
        lambda p: jnp.sum(m2.apply({"params": p}, x, t, c) ** 2)
    )(p)
    assert np.isfinite(
        float(jnp.asarray([jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g)]).sum())
    )


def test_nonfinite_grad_guard(tiny_model):
    """A poisoned batch (NaN latents) must not corrupt params; the skip is counted."""
    cfg, model, params = tiny_model
    tcfg = TrainConfig(learning_rate=1e-3, use_ema=False, use_ema_fashion=False)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    nl, nt = _nulls(cfg)
    bad = _batch(cfg, jax.random.PRNGKey(20))
    bad = bad._replace(latent_mean=bad.latent_mean.at[0].set(jnp.nan))
    state2, m = jax.jit(step_fn)(state, bad, nl, nt, jax.random.PRNGKey(21))
    assert float(m["update_skipped"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(state.params["unet"]),
                    jax.tree_util.tree_leaves(state2.params["unet"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a clean batch still updates
    good = _batch(cfg, jax.random.PRNGKey(22))
    state3, m2 = jax.jit(step_fn)(state2, good, nl, nt, jax.random.PRNGKey(23))
    assert float(m2["update_skipped"]) == 0.0
    diff = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state2.params["unet"], state3.params["unet"])))
    assert diff > 0


def test_grad_accum_fresh_draws_per_microbatch(tiny_model):
    """Each microbatch must fold its index into the step rng: accum=2 grads equal
    the mean of two single-microbatch grad evaluations at fold_in(rng, 0/1) — and
    in particular the k microbatches do NOT share noise/timesteps/dropout draws."""
    cfg, model, params = tiny_model
    trainable, frozen = split_params(params)
    nl = jnp.zeros((cfg.unet.sample_size, cfg.unet.sample_size,
                    cfg.vae.latent_channels))
    nt = jnp.zeros((77, cfg.text.hidden_size))
    batch = _batch(cfg, jax.random.PRNGKey(7), B=4)
    rng = jax.random.PRNGKey(11)

    tcfg = TrainConfig(learning_rate=1e-3, gradient_accumulation_steps=2,
                       use_ema=False, use_ema_fashion=False)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    _, m_accum = jax.jit(step_fn)(state, batch, nl, nt, rng)

    def micro_loss(i):
        mb = jax.tree_util.tree_map(
            lambda x: x[2 * i:2 * i + 2] if x is not None else None, batch
        )
        l, _ = difashion_loss(model, trainable, frozen, mb, nl, nt,
                              jax.random.fold_in(rng, i), TrainConfig())
        return float(l)

    l0, l1 = micro_loss(0), micro_loss(1)
    np.testing.assert_allclose(float(m_accum["loss"]), (l0 + l1) / 2.0, rtol=1e-5)
    # and the microbatch rngs genuinely differ: same DATA through both slots
    # gives different losses (the pre-fix behavior made them identical)
    dup = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x[:2], x[:2]]) if x is not None else None, batch
    )
    _, m_dup = jax.jit(step_fn)(state, dup, nl, nt, rng)
    mb0 = jax.tree_util.tree_map(
        lambda x: x[:2] if x is not None else None, batch
    )
    l_shared0, _ = difashion_loss(model, trainable, frozen, mb0, nl, nt,
                                  jax.random.fold_in(rng, 0), TrainConfig())
    l_shared1, _ = difashion_loss(model, trainable, frozen, mb0, nl, nt,
                                  jax.random.fold_in(rng, 1), TrainConfig())
    assert abs(float(l_shared0) - float(l_shared1)) > 1e-6  # distinct draws
    np.testing.assert_allclose(
        float(m_dup["loss"]), (float(l_shared0) + float(l_shared1)) / 2.0,
        rtol=1e-5,
    )


def test_injected_empty_dict_is_production(tiny_model):
    """injected={} must behave exactly like injected=None (incl. the
    MutualEncoder-dropout determinism switch)."""
    cfg, model, params = tiny_model
    trainable, frozen = split_params(params)
    nl = jnp.zeros((cfg.unet.sample_size, cfg.unet.sample_size,
                    cfg.vae.latent_channels))
    nt = jnp.zeros((77, cfg.text.hidden_size))
    batch = _batch(cfg, jax.random.PRNGKey(8), B=2)
    rng = jax.random.PRNGKey(9)
    l_none, _ = difashion_loss(model, trainable, frozen, batch, nl, nt, rng,
                               TrainConfig(), injected=None)
    l_empty, _ = difashion_loss(model, trainable, frozen, batch, nl, nt, rng,
                                TrainConfig(), injected={})
    assert float(l_none) == float(l_empty)
