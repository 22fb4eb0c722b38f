"""AutoencoderKL (SD VAE) in NHWC flax.

TPU-native equivalent of the diffusers VAE the reference uses for catalog encoding,
per-batch training encodes, and end-of-sampling decodes
(`/root/reference/DiFashion/models/difashion.py:74-75,129,144-145,376,435-437,580`).
Encode produces a DiagonalGaussian (mean/logvar); `.sample(rng)` matches
`latent_dist.sample()` and `.mode()` matches `latent_dist.mode()`. The caller applies
`config.scaling_factor` (0.18215), same as the reference call sites.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from difashion_tpu.core.config import VAEConfig
from difashion_tpu.nn.attention import VAEAttention
from difashion_tpu.nn.layers import (
    Conv2d,
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    Upsample2D,
)

Dtype = Any


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        logvar = jnp.clip(self.logvar, -30.0, 20.0)
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + jnp.exp(logvar) - 1.0 - logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = Conv2d(cfg.block_out_channels[0], 3, dtype=self.dtype, name="conv_in")(x)
        for bi, out_ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    out_ch, use_time_emb=False, groups=cfg.norm_num_groups,
                    epsilon=1e-6, dtype=self.dtype, name=f"down_{bi}_resnet_{li}",
                )(h)
            if bi != len(cfg.block_out_channels) - 1:
                h = Downsample2D(out_ch, dtype=self.dtype, name=f"down_{bi}_downsample")(h)
        mid = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid, use_time_emb=False, groups=cfg.norm_num_groups,
                          epsilon=1e-6, dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(mid, cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(mid, use_time_emb=False, groups=cfg.norm_num_groups,
                          epsilon=1e-6, dtype=self.dtype, name="mid_resnet_1")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return Conv2d(2 * cfg.latent_channels, 3, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        rev = list(reversed(cfg.block_out_channels))
        h = Conv2d(rev[0], 3, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock2D(rev[0], use_time_emb=False, groups=cfg.norm_num_groups,
                          epsilon=1e-6, dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(rev[0], cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(rev[0], use_time_emb=False, groups=cfg.norm_num_groups,
                          epsilon=1e-6, dtype=self.dtype, name="mid_resnet_1")(h)
        for bi, out_ch in enumerate(rev):
            for li in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(
                    out_ch, use_time_emb=False, groups=cfg.norm_num_groups,
                    epsilon=1e-6, dtype=self.dtype, name=f"up_{bi}_resnet_{li}",
                )(h)
            if bi != len(rev) - 1:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{bi}_upsample")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return Conv2d(cfg.out_channels, 3, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Frozen in DiFashion training (`difashion.py:106`); encode/decode only."""

    config: VAEConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = Conv2d(2 * self.config.latent_channels, 1, dtype=self.dtype,
                                 name="quant_conv")
        self.post_quant_conv = Conv2d(self.config.latent_channels, 1, dtype=self.dtype,
                                      name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        """x: [B, H, W, 3] in [-1, 1] -> DiagonalGaussian over [B, H/8, W/8, C_lat]."""
        moments = self.quant_conv(self.encoder(x.astype(self.dtype)))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: [B, h, w, C_lat] (already divided by scaling_factor) -> [B, H, W, 3]."""
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)))

    def __call__(self, x, rng):
        dist = self.encode(x)
        z = dist.sample(rng)
        return self.decode(z), dist


def init_vae(config: VAEConfig, rng: jax.Array, dtype=jnp.float32):
    model = AutoencoderKL(config, dtype=dtype)
    x = jnp.zeros((1, config.sample_size, config.sample_size, config.in_channels))
    # __call__ traces encode AND decode so all params materialize.
    params = model.init({"params": rng}, x, jax.random.PRNGKey(0))["params"]
    return model, params
