"""LPIPS (vgg variant) in flax.

TPU-native equivalent of the `lpips.LPIPS(net='vgg')` metric the reference uses
(`/root/reference/Evaluation/eval_utils.py:12,467-501`): VGG16 features at the 5 relu
stages (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), channel-unit-normalized, squared
difference, 1x1 linear heads, spatial mean, summed over stages. Inputs are [-1, 1]
images, shifted/scaled by the official (shift, scale) constants.

Weights import from the torchvision VGG16 state dict + the lpips linear-head state dict
via `import_vgg_params` / `import_lpips_lins`.
"""
from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# torchvision VGG16 conv layer indices (features.*) per stage
_VGG16_CFG = [(64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512)]
_LPIPS_CHANNELS = [64, 128, 256, 512, 512]

# official LPIPS input normalization (ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk; returns the 5 LPIPS stage activations (post-ReLU)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        li = 0
        for si, stage in enumerate(_VGG16_CFG):
            for ch in stage:
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"conv_{li}")(x)
                x = nn.relu(x)
                li += 1
            outs.append(x)
            if si < len(_VGG16_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return outs


class LPIPS(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        """img0, img1: [B, H, W, 3] in [-1, 1] -> distances [B]."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        f0 = vgg((img0 - shift) / scale)
        f1 = vgg((img1 - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10
            )
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10
            )
            diff = (a - b) ** 2
            w = self.param(
                f"lin_{i}", nn.initializers.ones, (diff.shape[-1], 1), jnp.float32
            )
            # 1x1 conv head == channel-weighted sum, then spatial mean
            d = jnp.einsum("bhwc,co->bhwo", diff.astype(jnp.float32), w)
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total


def init_lpips(rng: jax.Array, size: int = 64, dtype=jnp.float32):
    model = LPIPS(dtype=dtype)
    x = jnp.zeros((1, size, size, 3))
    params = model.init(rng, x, x)["params"]
    return model, params


def import_vgg_params(template_vgg, torch_sd) -> dict:
    """torchvision vgg16 `features.{idx}.weight/bias` -> conv_{i} (OIHW->HWIO).
    torchvision conv indices within features: 0,2, 5,7, 10,12,14, 17,19,21, 24,26,28."""
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = jax.tree_util.tree_map(np.asarray, template_vgg)
    for i, ti in enumerate(tv_idx):
        w = np.asarray(torch_sd[f"features.{ti}.weight"])
        b = np.asarray(torch_sd[f"features.{ti}.bias"])
        out[f"conv_{i}"]["kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv_{i}"]["bias"] = b
    return out


def import_lpips_lins(template, lpips_sd) -> dict:
    """lpips state dict `lin{i}.model.1.weight` [1, C, 1, 1] -> lin_{i} [C, 1]."""
    out = dict(template)
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lpips_sd:
                w = np.asarray(lpips_sd[key])
                out[f"lin_{i}"] = w.reshape(w.shape[1], 1)
                break
    return out
