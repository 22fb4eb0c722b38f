"""Block-wise 8-bit AdamW as an optax transform.

The reference exposes bitsandbytes `AdamW8bit` as an option (`/root/reference/DiFashion/
train.py:573-583`). TPU-native equivalent: Adam moments stored as int8 with per-block
fp32 absmax scales (block = 256 flattened elements), dequantized/requantized inside the
jitted update — a 4x optimizer-memory saving (the UNet's two fp32 moments are ~7GB at
full scale). Dynamic-tree quantization is approximated with linear absmax blocks, which
on TPU vectorizes cleanly; accuracy is validated against fp32 Adam in tests.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


def _pad_len(n: int) -> int:
    return (n + BLOCK - 1) // BLOCK * BLOCK


def _quantize(x: jnp.ndarray):
    """fp32 [n] -> (int8 [n], fp32 scales [n/BLOCK]) with per-block absmax."""
    n = x.size
    xp = jnp.pad(x.reshape(-1), (0, _pad_len(n) - n)).reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(xp), axis=1, keepdims=True) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(xp / safe), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def _dequantize(q: jnp.ndarray, scale: jnp.ndarray, shape, n: int):
    x = q.astype(jnp.float32) * scale[:, None]
    return x.reshape(-1)[:n].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    mu_q: dict
    mu_s: dict
    nu_q: dict
    nu_s: dict


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999,
                      eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with int8 block-quantized moments (drop-in for optax.scale_by_adam)."""

    def init(params):
        def zq(p):
            q, s = _quantize(jnp.zeros(p.size, jnp.float32))
            return q, s

        flat = jax.tree_util.tree_map(lambda p: zq(p), params)
        mu_q = jax.tree_util.tree_map(lambda t: t[0], flat,
                                      is_leaf=lambda t: isinstance(t, tuple))
        mu_s = jax.tree_util.tree_map(lambda t: t[1], flat,
                                      is_leaf=lambda t: isinstance(t, tuple))
        flat2 = jax.tree_util.tree_map(lambda p: zq(p), params)
        nu_q = jax.tree_util.tree_map(lambda t: t[0], flat2,
                                      is_leaf=lambda t: isinstance(t, tuple))
        nu_s = jax.tree_util.tree_map(lambda t: t[1], flat2,
                                      is_leaf=lambda t: isinstance(t, tuple))
        return Adam8bitState(jnp.zeros((), jnp.int32), mu_q, mu_s, nu_q, nu_s)

    def update(grads, state, params=None):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, mq, ms, nq, ns):
            g = g.astype(jnp.float32)
            mu = _dequantize(mq, ms, g.shape, g.size)
            nu = _dequantize(nq, ns, g.shape, g.size)
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * g * g
            u = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            mq2, ms2 = _quantize(mu)
            nq2, ns2 = _quantize(nu)
            return u, mq2, ms2, nq2, ns2

        out = jax.tree_util.tree_map(
            upd, grads, state.mu_q, state.mu_s, state.nu_q, state.nu_s
        )
        pick = lambda i: jax.tree_util.tree_map(
            lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple)
        )
        updates = pick(0)
        new_state = Adam8bitState(count, pick(1), pick(2), pick(3), pick(4))
        return updates, new_state

    return optax.GradientTransformation(init, update)


def adamw8bit(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
              weight_decay=1e-2) -> optax.GradientTransformation:
    """AdamW with 8-bit moments (reference `--use_8bit_adam` equivalent)."""
    return optax.chain(
        scale_by_adam8bit(b1, b2, eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
