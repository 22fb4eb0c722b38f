"""DiFashion composite model: UNet + VAE + CLIP text + MutualEncoder under one roof.

The reference's `DiFashion(ModelMixin)` (`/root/reference/DiFashion/models/difashion.py:48-120`)
owns scheduler+tokenizer+text-encoder+VAE+UNet+MutualEncoder as torch submodules. Here the
equivalent is a plain container of flax modules plus a params pytree with the same logical
split — trainable {unet, fashion_encoder} vs frozen {vae, text_encoder} — which is exactly
the split the training engine and checkpoint layout use (reference freezes vae+text at
`difashion.py:106-107`; checkpoints store unet / fashion_encoder / their EMAs,
`train.py:514-557`).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from difashion_tpu.core.config import ModelConfig
from difashion_tpu.diffusion.schedule import DiffusionSchedule
from difashion_tpu.models.clip_text import CLIPTextEncoder, init_clip_text
from difashion_tpu.models.mutual import MutualEncoder, init_mutual_encoder
from difashion_tpu.models.unet import UNet2DCondition, init_unet
from difashion_tpu.models.vae import AutoencoderKL, init_vae


@dataclass
class DiFashionModel:
    """Module bundle + schedule. Params travel separately as a pytree:
    {"unet": ..., "fashion_encoder": ..., "vae": ..., "text_encoder": ...}."""

    config: ModelConfig
    unet: UNet2DCondition
    vae: AutoencoderKL
    text_encoder: CLIPTextEncoder
    fashion_encoder: MutualEncoder
    schedule: DiffusionSchedule

    # ---- apply helpers (pure; params passed explicitly) ----------------------

    def apply_unet(self, params, sample, timesteps, encoder_hidden_states):
        return self.unet.apply({"params": params["unet"]}, sample, timesteps,
                               encoder_hidden_states)

    def encode_images(self, params, images, rng=None, sample: bool = False):
        """images [B,H,W,3] in [-1,1] -> scaled latents [B,h,w,C].
        sample=True matches `latent_dist.sample()` (training, difashion.py:144);
        sample=False matches `.mode()` (catalog/null/known-item latents)."""
        dist = self.vae.apply({"params": params["vae"]}, images,
                              method=AutoencoderKL.encode)
        z = dist.sample(rng) if sample else dist.mode()
        return z * self.config.vae.scaling_factor

    def decode_latents(self, params, latents):
        """scaled latents -> images [B,H,W,3] in [-1,1] (difashion.py:580)."""
        z = latents / self.config.vae.scaling_factor
        return self.vae.apply({"params": params["vae"]}, z,
                              method=AutoencoderKL.decode)

    def encode_text(self, params, input_ids):
        return self.text_encoder.apply({"params": params["text_encoder"]}, input_ids)

    def apply_mutual(self, params, mutual_emb, deterministic=True, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        return self.fashion_encoder.apply(
            {"params": params["fashion_encoder"]}, mutual_emb,
            deterministic=deterministic, rngs=rngs,
        )

    @property
    def trainable_keys(self):
        return ("unet", "fashion_encoder")

    @property
    def frozen_keys(self):
        return ("vae", "text_encoder")


def create_difashion(config: ModelConfig, rng: jax.Array, dtype=jnp.float32,
                     remat: bool = False, remat_policy=None):
    """Initialize all four towers. Returns (model, params)."""
    r_unet, r_vae, r_text, r_mut = jax.random.split(rng, 4)
    unet, unet_params = init_unet(config.unet, r_unet, dtype=dtype, remat=remat,
                                  remat_policy=remat_policy)
    vae, vae_params = init_vae(config.vae, r_vae, dtype=dtype)
    text, text_params = init_clip_text(config.text, r_text, dtype=dtype)
    mutual, mutual_params = init_mutual_encoder(config.mutual, r_mut, dtype=dtype)
    model = DiFashionModel(
        config=config,
        unet=unet,
        vae=vae,
        text_encoder=text,
        fashion_encoder=mutual,
        schedule=DiffusionSchedule.create(config.scheduler),
    )
    params = {
        "unet": unet_params,
        "vae": vae_params,
        "text_encoder": text_params,
        "fashion_encoder": mutual_params,
    }
    return model, params


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
