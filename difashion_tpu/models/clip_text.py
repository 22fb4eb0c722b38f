"""CLIP text encoder (SD2-base text tower: OpenCLIP ViT-H text in HF CLIPTextModel form).

TPU-native equivalent of the `CLIPTextModel` the reference loads at
`/root/reference/DiFashion/models/difashion.py:70-72` and calls as
`text_encoder(input_ids)[0]` (`difashion.py:224,340-342`): token + position embeddings,
N pre-LN transformer layers with causal masking, final LayerNorm, returning the full
last-hidden-state sequence [B, 77, width]. Frozen during DiFashion training
(`difashion.py:107`).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from difashion_tpu.core.config import CLIPTextConfig

Dtype = Any


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(f"unknown activation {name!r}")


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)
        q = dense("q_proj")(x) * (head_dim ** -0.5)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        b, s, _ = x.shape
        split = lambda t: t.reshape(b, s, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        logits = jnp.where(causal_mask, logits, jnp.finfo(jnp.float32).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm1")(x.astype(jnp.float32)).astype(self.dtype)
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm2")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids: [B, S] int32 -> last hidden state [B, S, hidden] (post final-LN)."""
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       param_dtype=jnp.float32, name="token_embedding")(input_ids)
        pos_ids = jnp.arange(s)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
                       param_dtype=jnp.float32, name="position_embedding")(pos_ids)
        x = tok + pos
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="final_layer_norm")(x.astype(jnp.float32))
        return x.astype(self.dtype)


def init_clip_text(config: CLIPTextConfig, rng: jax.Array, dtype=jnp.float32):
    model = CLIPTextEncoder(config, dtype=dtype)
    ids = jnp.zeros((1, config.max_position_embeddings), jnp.int32)
    params = model.init(rng, ids)["params"]
    return model, params
