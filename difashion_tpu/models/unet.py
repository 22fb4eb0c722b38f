"""SD UNet2DCondition in NHWC flax — the DiFashion variant with an 8-channel conv_in.

Re-implements (TPU-first, not a port) the diffusers `UNet2DConditionModel` the reference
loads at `/root/reference/DiFashion/models/difashion.py:77-79` and then modifies:
conv_in widened 4->8 channels, the new input channels zero-initialized and the first four
copied from the pretrained kernel (`difashion.py:82-93`). Here the 8-channel conv_in is
native to the architecture; the importer reproduces the zero-init extension when loading
pretrained 4-channel weights (see `core/importer.py`).

Structure (SD2-base): conv_in -> time MLP -> 3x CrossAttnDownBlock + DownBlock ->
mid(Res, Transformer, Res) -> UpBlock + 3x CrossAttnUpBlock -> GN/SiLU/conv_out.
Skip connections collect after every resnet and downsample, and are consumed in reverse
by the up blocks (3 resnets each = layers_per_block+1).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from difashion_tpu.core.config import UNetConfig
from difashion_tpu.nn.attention import Transformer2D
from difashion_tpu.nn.layers import (
    Conv2d,
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    get_timestep_embedding,
)

Dtype = Any


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: Dtype = jnp.float32
    remat: bool = False  # jax.checkpoint each block (gradient checkpointing)
    # Rematerialization policy for the checkpointed blocks: None = save nothing
    # (recompute everything in bwd); "dots" = save MXU (matmul/conv) outputs and
    # recompute only the cheap elementwise/layout ops — trades HBM for the
    # copy/transpose traffic at remat boundaries (BASELINE.md train-step table).
    remat_policy: Any = None

    def _maybe_remat(self, cls):
        if not self.remat:
            return cls
        policies = {
            None: None,
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "dots_no_batch":
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        }
        policy = policies[self.remat_policy]
        return nn.remat(cls, policy=policy) if policy is not None else nn.remat(cls)

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray) -> jnp.ndarray:
        """sample: [B, H, W, C_in] latents (NHWC); timesteps: [B] int;
        encoder_hidden_states: [B, S, context_dim]. Returns [B, H, W, C_out]."""
        cfg = self.config
        ResBlock = self._maybe_remat(ResnetBlock2D)
        Spatial = self._maybe_remat(Transformer2D)

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # Time embedding (fp32 sinusoid -> MLP at compute dtype)
        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        )
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_emb.astype(self.dtype))

        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)

        h = Conv2d(cfg.block_out_channels[0], 3, dtype=self.dtype, name="conv_in")(sample)

        # ---- down path ----------------------------------------------------------
        skips = [h]
        for bi, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[bi]
            is_last = bi == len(cfg.down_block_types) - 1
            has_attn = block_type == "CrossAttnDownBlock2D"
            for li in range(cfg.layers_per_block):
                h = ResBlock(
                    out_ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f"down_{bi}_resnet_{li}",
                )(h, temb)
                if has_attn:
                    heads = cfg.fixed_num_heads or out_ch // cfg.attention_head_dim
                    h = Spatial(
                        heads, out_ch // heads, 1, cfg.cross_attention_dim,
                        use_linear_projection=cfg.use_linear_projection,
                        norm_num_groups=cfg.norm_num_groups,
                        dtype=self.dtype, name=f"down_{bi}_attn_{li}",
                    )(h, encoder_hidden_states)
                skips.append(h)
            if not is_last:
                h = Downsample2D(out_ch, dtype=self.dtype, name=f"down_{bi}_downsample")(h)
                skips.append(h)

        # ---- mid ---------------------------------------------------------------
        mid_ch = cfg.block_out_channels[-1]
        h = ResBlock(
            mid_ch, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_resnet_0"
        )(h, temb)
        mid_heads = cfg.fixed_num_heads or mid_ch // cfg.attention_head_dim
        h = Spatial(
            mid_heads, mid_ch // mid_heads, 1,
            cfg.cross_attention_dim,
            use_linear_projection=cfg.use_linear_projection,
            norm_num_groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_attn",
        )(h, encoder_hidden_states)
        h = ResBlock(
            mid_ch, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_resnet_1"
        )(h, temb)

        # ---- up path -----------------------------------------------------------
        rev_channels = list(reversed(cfg.block_out_channels))
        for bi, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_channels[bi]
            is_last = bi == len(cfg.up_block_types) - 1
            has_attn = block_type == "CrossAttnUpBlock2D"
            for li in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                # skip passed separately: norm1/conv1/shortcut run in split form
                # (no lane-misaligned channel concat; see ResnetBlock2D)
                h = ResBlock(
                    out_ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f"up_{bi}_resnet_{li}",
                )(h, temb, True, skip)
                if has_attn:
                    heads = cfg.fixed_num_heads or out_ch // cfg.attention_head_dim
                    h = Spatial(
                        heads, out_ch // heads, 1, cfg.cross_attention_dim,
                        use_linear_projection=cfg.use_linear_projection,
                        norm_num_groups=cfg.norm_num_groups,
                        dtype=self.dtype, name=f"up_{bi}_attn_{li}",
                    )(h, encoder_hidden_states)
            if not is_last:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{bi}_upsample")(h)

        # ---- out ---------------------------------------------------------------
        h = GroupNorm(cfg.norm_num_groups, dtype=self.dtype, act="silu",
                      name="conv_norm_out")(h)
        h = Conv2d(cfg.out_channels, 3, dtype=self.dtype, name="conv_out")(h)
        return h


def init_unet(config: UNetConfig, rng: jax.Array, dtype=jnp.float32,
              remat: bool = False, remat_policy=None):
    """Initialize a UNet; returns (module, params)."""
    model = UNet2DCondition(config, dtype=dtype, remat=remat,
                            remat_policy=remat_policy)
    sample = jnp.zeros((1, config.sample_size, config.sample_size, config.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, config.cross_attention_dim))
    params = model.init(rng, sample, t, ctx)["params"]
    return model, params
