from difashion_tpu.models.clip_text import CLIPTextEncoder, init_clip_text
from difashion_tpu.models.difashion import (
    DiFashionModel,
    create_difashion,
    param_count,
)
from difashion_tpu.models.mutual import MutualEncoder, init_mutual_encoder
from difashion_tpu.models.unet import UNet2DCondition, init_unet
from difashion_tpu.models.vae import AutoencoderKL, DiagonalGaussian, init_vae

__all__ = [
    "CLIPTextEncoder",
    "init_clip_text",
    "DiFashionModel",
    "create_difashion",
    "param_count",
    "MutualEncoder",
    "init_mutual_encoder",
    "UNet2DCondition",
    "init_unet",
    "AutoencoderKL",
    "DiagonalGaussian",
    "init_vae",
]
