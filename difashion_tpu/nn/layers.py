"""NHWC neural-net primitives shared by the UNet / VAE / CLIP models.

TPU-native counterparts of the reference's dependency-level torch modules (SURVEY.md §2b):
convs lower to XLA (MXU), everything stays NHWC (the TPU-friendly layout, vs the
reference's NCHW), params are fp32 with a configurable compute dtype (bf16 on TPU).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, matching the SD UNet's time_proj semantics
    (reference UNet consumes it inside diffusers; cited at
    `/root/reference/DiFashion/models/difashion.py:249-253`)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    if flip_sin_to_cos:
        emb = jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)
    else:
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """time_proj -> Linear -> SiLU -> Linear (SD UNet time embedding MLP)."""

    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class _GNParams(nn.Module):
    """Parameter holder producing the same tree path as flax's nn.GroupNorm
    (`.../GroupNorm_0/{scale,bias}`) so checkpoints/importers are unchanged."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class GroupNorm(nn.Module):
    """GroupNorm with torch-compatible semantics (eps 1e-5/1e-6, affine).

    `act="silu"` fuses the following activation into the normalize pass.

    Called with a second tensor, normalizes the *virtual concatenation*
    [x ; skip] along channels but returns the two normalized halves separately —
    the UNet up-path uses this with split convolutions so the lane-misaligned
    channel concat (C=320/640/1280 are not multiples of 128) never materializes
    (~0.7 ms per up-block conv on v5e, tools/bench_concat.py)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    act: Any = None  # None | "silu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: Optional[jnp.ndarray] = None):
        from difashion_tpu.nn.pallas.groupnorm import (
            group_norm_act,
            group_norm_cat_act,
        )

        features = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        scale, bias = _GNParams(features, name="GroupNorm_0")()
        if skip is None:
            return group_norm_act(
                x, scale, bias, groups=self.num_groups, eps=self.epsilon,
                act=self.act,
            )
        return group_norm_cat_act(
            (x, skip), scale, bias, groups=self.num_groups, eps=self.epsilon,
            act=self.act,
        )


class _ConvParams(nn.Module):
    """Param holder with nn.Conv's exact tree layout/initialization
    (`.../Conv_0/{kernel,bias}`, lecun-normal kernel, zero bias) so checkpoints
    and importers are unchanged while Conv2d controls the compute itself."""

    kernel_shape: tuple
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.kernel_shape, jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.kernel_shape[-1],), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class Conv2d(nn.Module):
    """3x3/1x1 NHWC conv wrapper with torch-style SAME-from-padding semantics.

    Called with a second tensor, computes conv(concat([x, skip], -1), kernel)
    WITHOUT materializing the concat: the kernel is sliced along its input-
    channel axis and the two partial convolutions are summed. The skip channel
    counts (320/640/1280) are not lane-tile multiples, so the explicit concat
    costs a 64-lane-shift relayout (~0.7 ms per up-block conv at the UNet's
    64x64 level, tools/bench_concat.py)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = None  # None -> torch default ((k-1)//2); or explicit pad list
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        k = self.kernel_size
        if self.padding is None:
            p = (k - 1) // 2
            padding = [(p, p), (p, p)]
        else:
            padding = self.padding
        c1 = x.shape[-1]
        in_features = c1 + (skip.shape[-1] if skip is not None else 0)
        kernel, bias = _ConvParams(
            (k, k, in_features, self.features), self.use_bias, name="Conv_0")()
        kernel = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        strides = (self.strides, self.strides)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel[:, :, :c1], strides, padding,
            dimension_numbers=dn,
        )
        if skip is not None:
            y = y + jax.lax.conv_general_dilated(
                skip.astype(self.dtype), kernel[:, :, c1:], strides, padding,
                dimension_numbers=dn,
            )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class ResnetBlock2D(nn.Module):
    """SD ResNet block: GN-SiLU-conv + time-emb add + GN-SiLU-(dropout)-conv, residual.

    Mirrors the behavior of diffusers ResnetBlock2D used throughout the reference UNet/VAE.
    """

    out_channels: int
    use_time_emb: bool = True
    dropout: float = 0.0
    groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True, skip=None):
        """With `skip`, behaves as if called on concat([x, skip], -1) but runs
        norm1/conv1/conv_shortcut in split form (GroupNorm/Conv2d docstrings) —
        the UNet up-path skip concat never materializes."""
        in_channels = x.shape[-1] + (0 if skip is None else skip.shape[-1])
        if skip is None:
            h = GroupNorm(self.groups, self.epsilon, dtype=self.dtype,
                          act="silu", name="norm1")(x)
            h = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        else:
            hx, hs = GroupNorm(self.groups, self.epsilon, dtype=self.dtype,
                               act="silu", name="norm1")(x, skip)
            h = Conv2d(self.out_channels, 3, dtype=self.dtype,
                       name="conv1")(hx, hs)
        if self.use_time_emb and temb is not None:
            t = nn.silu(temb)
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(t)
            h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, self.epsilon, dtype=self.dtype, act="silu",
                      name="norm2")(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = Conv2d(self.out_channels, 1, dtype=self.dtype,
                       name="conv_shortcut")(x, skip)
        elif skip is not None:  # pragma: no cover - not hit by SD topologies
            x = jnp.concatenate([x, skip], axis=-1)
        return x + h


class Downsample2D(nn.Module):
    """Stride-2 conv with asymmetric (0,1,0,1) padding (diffusers semantics)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
        return Conv2d(
            self.out_channels, 3, strides=2, padding=[(0, 0), (0, 0)],
            dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # 2x nearest as broadcast+reshape (identical to torch interpolate-nearest;
        # avoids jax.image.resize's gather lowering so XLA fuses it into the conv)
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        x = x.reshape(b, h * 2, w * 2, c)
        return Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv")(x)


class GEGLU(nn.Module):
    """GEGLU feed-forward gate used by SD transformer blocks."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """SD transformer FF: GEGLU(d -> 4d) -> Dropout -> Linear(4d -> d)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)
