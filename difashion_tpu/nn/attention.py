"""Attention modules: functional SDPA core with a Pallas flash-attention fast path,
plus the SD transformer blocks (self + cross attention, GEGLU FF).

Replaces the reference's xformers memory-efficient attention + diffusers Transformer2D
(`/root/reference/DiFashion/models/difashion.py:109-120` and the UNet internals it loads
at `:77-79`).
"""
from __future__ import annotations

import math
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from difashion_tpu.nn.layers import FeedForward, GroupNorm
from difashion_tpu.nn.pallas.flash_attention import flash_attention

Dtype = Any

# Flash attention engages for self-attention sequences at or above this length and only
# on TPU backends; XLA's fused attention handles the small cases well.
# DIFASHION_FLASH_MIN_SEQ overrides (tools/learning_proof_tpu.py lowers it so the
# Pallas kernels sit in the LEARNED path at its mid scale).
FLASH_MIN_SEQ = int(os.environ.get("DIFASHION_FLASH_MIN_SEQ", "1024"))
# ... and only when KV is at least this long: for the 77-token cross-attention XLA's
# fused softmax beats the kernel (1.9 vs 2.3 ms at the 64x64 level, tools/bench_flash.py
# — per-grid-cell overhead dominates when each cell's MXU work is a [*, 64]x[64, 128]
# sliver). Env-overridable for the same reason as FLASH_MIN_SEQ above.
FLASH_MIN_KV = int(os.environ.get("DIFASHION_FLASH_MIN_KV", "256"))


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def sdpa(q, k, v, scale=None, mask=None, use_flash: Optional[bool] = None):
    """Scaled dot-product attention over [B, H, S, D] tensors."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_flash is None:
        # d > 128 (the VAE's single 512-wide head) keeps the whole 4 MB K/V
        # resident per grid row; Mosaic's input double-buffering then overflows
        # the 16 MB scoped VMEM — XLA handles that one fine (it's a single
        # attention per decode).
        use_flash = (_on_tpu() and q.shape[2] >= FLASH_MIN_SEQ
                     and k.shape[2] >= FLASH_MIN_KV and q.shape[3] <= 128
                     and mask is None)
    if use_flash:
        return flash_attention(q, k, v, scale=scale)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


class CrossAttention(nn.Module):
    """Multi-head attention with optional cross-attention context (SD "Attention").

    No-bias q/k/v projections + bias out projection, matching SD UNet attention layers.
    """

    query_dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, sq, _ = q.shape
        skv = k.shape[1]
        # Head-major [B, H, S, D] with explicit transposes. Measured against
        # einsum-fused and packed-qkv alternatives in the real 4096-token
        # sandwich (tools/bench_attn_layout.py): all within 2% — XLA already
        # folds these relayouts well, and Mosaic's block rules preclude reading
        # [B, S, H, D] head slices directly (last-two-dims constraint).
        q = q.reshape(b, sq, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, skv, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, skv, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        out = sdpa(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF, all residual (SD block)."""

    dim: int
    heads: int
    head_dim: int
    context_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # LayerNorm stats are computed in fp32 inside flax regardless of `dtype`;
        # normalizing at compute dtype avoids materializing a fp32 copy of the
        # [B, S, C] activations three times per block (torch-fp16 reference
        # semantics are the same: half-precision LN with fp32 accumulation).
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.head_dim, dtype=self.dtype, name="attn1"
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.head_dim, context_dim=self.context_dim,
            dtype=self.dtype, name="attn2",
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class _Dense1x1(nn.Module):
    """nn.Dense-compatible params ([in, out] kernel + bias) computed as a 1x1
    convolution on the 4D NHWC activation. The profiler shows the Dense form of
    proj_out fused with the relayout into the following conv's tiled layout at
    1.49 ms/block (15x the same-shape to_out_0); the conv form keeps XLA on
    conv-native layouts end to end."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x4d):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x4d.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = jax.lax.conv_general_dilated(
            x4d.astype(self.dtype), kernel[None, None].astype(self.dtype),
            (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> N blocks -> proj_out -> +residual.

    SD2 uses linear (not 1x1-conv) projections (`use_linear_projection=True`);
    the math is identical either way, so on TPU the linear projections are
    *computed* as 1x1 convs on the NHWC activations (see _Dense1x1) while the
    checkpoint layout keeps the Dense [in, out] kernels.
    """

    heads: int
    head_dim: int
    depth: int
    context_dim: int
    use_linear_projection: bool = True
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, hgt, wid, c = x.shape
        residual = x
        h = GroupNorm(self.norm_num_groups, 1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            h = _Dense1x1(self.heads * self.head_dim, dtype=self.dtype,
                          name="proj_in")(h)
            h = h.reshape(b, hgt * wid, self.heads * self.head_dim)
        else:
            h = nn.Conv(
                self.heads * self.head_dim, (1, 1), dtype=self.dtype,
                param_dtype=jnp.float32, name="proj_in",
            )(h)
            h = h.reshape(b, hgt * wid, self.heads * self.head_dim)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.heads * self.head_dim, self.heads, self.head_dim,
                self.context_dim, dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(h, context)
        if self.use_linear_projection:
            h = h.reshape(b, hgt, wid, self.heads * self.head_dim)
            h = _Dense1x1(c, dtype=self.dtype, name="proj_out")(h)
        else:
            h = h.reshape(b, hgt, wid, self.heads * self.head_dim)
            h = nn.Conv(
                c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="proj_out"
            )(h)
        return h + residual


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used in the VAE mid-block (diffusers AttnBlock)."""

    channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hgt, wid, c = x.shape
        residual = x
        h = GroupNorm(self.norm_num_groups, 1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(b, hgt * wid, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h)
        # 512px inputs give a 4096-token single-head attention here with d=512;
        # sdpa routes that to the XLA path (the flash kernel's d<=128 gate:
        # whole-KV residency at d=512 overflows Mosaic's scoped VMEM, and this
        # runs once per decode, not per denoise step)
        out = sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, hgt, wid, c) + residual
