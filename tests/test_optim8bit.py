"""8-bit AdamW: quantization round-trip + optimization parity with fp32 AdamW."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from difashion_tpu.engine.optim8bit import (
    _dequantize,
    _quantize,
    adamw8bit,
    scale_by_adam8bit,
)


def test_quantize_roundtrip_accuracy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1000).astype(np.float32))
    q, s = _quantize(x)
    assert q.dtype == jnp.int8
    back = _dequantize(q, s, x.shape, x.size)
    # blockwise absmax int8: relative error bounded by ~1/127 of block max
    err = np.abs(np.asarray(back - x))
    assert err.max() < np.abs(np.asarray(x)).max() / 127 + 1e-6


def test_quantize_zero_block():
    x = jnp.zeros(512)
    q, s = _quantize(x)
    back = _dequantize(q, s, x.shape, x.size)
    np.testing.assert_array_equal(np.asarray(back), 0.0)


def test_adam8bit_matches_fp32_adam_trajectory():
    """Minimize a quadratic; 8-bit and fp32 Adam should land in the same place."""
    A = jnp.asarray(np.random.RandomState(1).randn(8, 8).astype(np.float32))
    Q = A @ A.T + jnp.eye(8)
    b = jnp.ones(8)

    def loss(x):
        return 0.5 * x @ Q @ x - b @ x

    def run(opt):
        x = jnp.zeros(8)
        state = opt.init(x)

        @jax.jit
        def step(x, state):
            g = jax.grad(loss)(x)
            u, state = opt.update(g, state, x)
            return optax.apply_updates(x, u), state

        for _ in range(200):
            x, state = step(x, state)
        return x

    x8 = run(adamw8bit(1e-2, weight_decay=0.0))
    x32 = run(optax.adamw(1e-2, weight_decay=0.0))
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x32), atol=5e-2)
    # both near the analytic optimum
    opt_x = np.linalg.solve(np.asarray(Q), np.asarray(b))
    assert np.linalg.norm(np.asarray(x8) - opt_x) < 0.5


def test_adam8bit_state_memory_is_int8():
    params = {"w": jnp.zeros((64, 64)), "b": jnp.zeros(64)}
    opt = scale_by_adam8bit()
    state = opt.init(params)
    for leaf in jax.tree_util.tree_leaves(state.mu_q):
        assert leaf.dtype == jnp.int8
    for leaf in jax.tree_util.tree_leaves(state.nu_q):
        assert leaf.dtype == jnp.int8


def test_train_step_with_8bit_adam():
    from difashion_tpu.core.config import ModelConfig, TrainConfig
    from difashion_tpu.engine import TrainBatch, build_train_step
    from difashion_tpu.models import create_difashion

    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(learning_rate=1e-3, use_8bit_adam=True,
                       use_ema=False, use_ema_fashion=False)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)
    h, C = cfg.unet.sample_size, cfg.vae.latent_channels
    batch = TrainBatch(
        images=None,
        latent_mean=jnp.ones((2, 4, h, h, C)) * 0.1,
        latent_logvar=jnp.full((2, 4, h, h, C), -6.0),
        input_ids=jnp.zeros((2, 4, 77), jnp.int32),
        hist_latents=jnp.zeros((2, 4, h, h, C)),
    )
    state2, m = jax.jit(step_fn)(
        state, batch, jnp.zeros((h, h, C)), jnp.zeros((77, cfg.text.hidden_size)),
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(m["loss"]))
    d = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["unet"], state2.params["unet"],
    ))
    assert max(d) > 0
