"""MutualEncoder: the small MLP that turns the weighted co-item latent average into the
mutual-condition signal.

Behavior-parity with the reference (`/root/reference/DiFashion/models/difashion.py:21-46`):
flatten [B, h, w, C] -> Linear(C*h*w -> hid) -> LeakyReLU -> Dropout(0.1) ->
Linear(hid -> C*h*w) -> Tanh -> reshape. Initialized with xavier-normal weights and zero
biases (`difashion.py:731-746`). The reference also owns an *unused* category embedding
("useless embedding", `difashion.py:28`) that still appears in its checkpoints; we keep an
optional parameter slot for checkpoint compatibility but never touch it in compute.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from difashion_tpu.core.config import MutualEncoderConfig

Dtype = Any

_xavier = nn.initializers.xavier_normal()


class MutualEncoder(nn.Module):
    config: MutualEncoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mutual_emb: jnp.ndarray, deterministic: bool = True):
        """mutual_emb: [B, h, w, C] (NHWC latent) -> [B, h, w, C] in [-1, 1]."""
        cfg = self.config
        if cfg.keep_unused_category_embedding:
            # checkpoint-compat only; never used in compute (reference difashion.py:28)
            self.param(
                "category_embedding", _xavier, (cfg.cate_num, cfg.cate_emb_size),
                jnp.float32,
            )
        b = mutual_emb.shape[0]
        flat_dim = cfg.latent_channels * cfg.latent_size * cfg.latent_size
        x = mutual_emb.astype(self.dtype).reshape(b, -1)
        x = nn.Dense(cfg.hid_dim, dtype=self.dtype, kernel_init=_xavier,
                     bias_init=nn.initializers.zeros, name="mlp_0")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        x = nn.Dense(flat_dim, dtype=self.dtype, kernel_init=_xavier,
                     bias_init=nn.initializers.zeros, name="mlp_3")(x)
        x = jnp.tanh(x)
        return x.reshape(b, cfg.latent_size, cfg.latent_size, cfg.latent_channels)


def init_mutual_encoder(config: MutualEncoderConfig, rng: jax.Array, dtype=jnp.float32):
    model = MutualEncoder(config, dtype=dtype)
    x = jnp.zeros((1, config.latent_size, config.latent_size, config.latent_channels))
    params = model.init(rng, x)["params"]
    return model, params
