"""Pallas flash-attention kernel vs XLA reference SDPA (interpret mode on CPU)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difashion_tpu.nn.attention import sdpa
from difashion_tpu.nn.pallas.flash_attention import flash_attention


def _ref(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize(
    "b,h,sq,skv,d",
    [
        (1, 2, 256, 256, 64),    # self-attention, aligned
        (2, 1, 384, 384, 64),    # multiple q blocks
        (1, 2, 256, 77, 64),     # cross-attention: ragged KV needs masking
        (1, 1, 100, 50, 32),     # both dims ragged
    ],
)
def test_flash_matches_reference(b, h, sq, skv, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, skv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, skv, d), jnp.float32)
    out = flash_attention(q, k, v, block_q=128, block_kv=128, interpret=True)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_bf16_precision():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (1, 2, 256, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 2, 256, 64), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 2, 256, 64), jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _ref(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


@pytest.mark.parametrize(
    "b,h,sq,skv,d",
    [
        (1, 2, 256, 256, 64),    # self-attention
        (1, 1, 256, 77, 32),     # ragged cross-attention KV
        (2, 1, 130, 140, 32),    # both dims ragged/padded
    ],
)
def test_flash_backward_matches_reference_grads(b, h, sq, skv, d):
    """Custom-VJP (dq/dkv Pallas kernels) vs jax.grad of the XLA reference."""
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, skv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, skv, d), jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_kv=128, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref(q, k, v)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )


def test_flash_backward_value_and_grad_finite_bf16():
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (1, 2, 256, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 2, 256, 64), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 2, 256, 64), jnp.bfloat16)
    val, grads = jax.value_and_grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, interpret=True).astype(jnp.float32) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_sdpa_dispatch_equivalence():
    """sdpa with and without flash must agree (flash forced via interpret path)."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (2, 2, 128, 32))
    k = jax.random.normal(ks[1], (2, 2, 64, 32))
    v = jax.random.normal(ks[2], (2, 2, 64, 32))
    a = sdpa(q, k, v, use_flash=False)
    b = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bwd_bq,bwd_bkv", [(64, 128), (128, 64), (256, 128)])
def test_flash_backward_independent_bwd_blocks(bwd_bq, bwd_bkv):
    """dQ/dKV schedules decoupled from the forward's (round-4 bwd sweep knob):
    any valid (bwd_block_q, bwd_block_kv) must produce identical gradients."""
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (1, 2, 256, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 256, 64), jnp.float32)

    def loss(bq, bkv):
        return jax.grad(
            lambda q, k, v: jnp.sum(jnp.sin(flash_attention(
                q, k, v, block_q=128, block_kv=128, interpret=True,
                bwd_block_q=bq, bwd_block_kv=bkv))),
            argnums=(0, 1, 2),
        )(q, k, v)

    base = loss(None, None)
    alt = loss(bwd_bq, bwd_bkv)
    for a, b_ in zip(base, alt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_flash_backward_ragged_kv_with_bwd_blocks():
    """Ragged 77-token KV through non-default bwd schedules keeps the mask."""
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(ks[0], (1, 1, 256, 32), jnp.float32)
    k = jax.random.normal(ks[1], (1, 1, 77, 32), jnp.float32)
    v = jax.random.normal(ks[2], (1, 1, 77, 32), jnp.float32)
    gf = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(flash_attention(
            q, k, v, block_q=128, block_kv=128, interpret=True,
            bwd_block_q=64, bwd_block_kv=128))),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(_ref(q, k, v))),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)
