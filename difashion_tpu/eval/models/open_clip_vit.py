"""OpenCLIP ViT-H/14 image + text towers in flax.

TPU-native equivalent of `open_clip.create_model_and_transforms('ViT-H-14')` used across
the reference's evaluation stack (`/root/reference/Evaluation/eval_utils.py:93`,
`extract_hist_embs.py:83`): image encoder (patch 14, width 1280, 32 layers, 16 heads,
class token, pre/post LN, projection to 1024) and text encoder (width 1024, 24 layers,
16 heads, 77 ctx, causal, argmax-EOS pooling, projection to 1024).

The image preprocessing the reference relies on (open_clip transform: resize 224 bicubic,
center crop, normalize with CLIP mean/std) lives in `preprocess_clip_image`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    embed_dim: int = 1024          # output projection dim

    @staticmethod
    def h14() -> "ViTConfig":
        return ViTConfig()

    @staticmethod
    def tiny() -> "ViTConfig":
        return ViTConfig(image_size=28, patch_size=14, width=32, layers=2,
                         heads=4, embed_dim=16)


@dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    width: int = 1024
    layers: int = 24
    heads: int = 16
    context_length: int = 77
    embed_dim: int = 1024

    @staticmethod
    def h14() -> "TextConfig":
        return TextConfig()

    @staticmethod
    def tiny() -> "TextConfig":
        return TextConfig(vocab_size=1000, width=32, layers=2, heads=4, embed_dim=16)


class ResidualBlock(nn.Module):
    """Pre-LN transformer block with standard (QuickGELU-free) GELU MLP.
    OpenCLIP ViT-H uses nn.GELU (not QuickGELU)."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        hd = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, S, _ = q.shape
        sh = lambda t: t.reshape(B, S, self.heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", sh(q), sh(k)) / jnp.sqrt(
            jnp.asarray(hd, self.dtype)
        )
        if attn_mask is not None:
            logits = jnp.where(attn_mask, logits, jnp.finfo(jnp.float32).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, sh(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, S, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(o)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x


class CLIPImageEncoder(nn.Module):
    config: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, 224, 224, 3] already CLIP-normalized -> [B, embed_dim]."""
        cfg = self.config
        B = images.shape[0]
        x = nn.Conv(
            cfg.width, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(B, -1, cfg.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.width,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, cfg.width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (x.shape[1], cfg.width), jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        for i in range(cfg.layers):
            x = ResidualBlock(cfg.width, cfg.heads, dtype=self.dtype,
                              name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(
            x[:, 0].astype(jnp.float32)
        ).astype(self.dtype)
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (cfg.width, cfg.embed_dim),
            jnp.float32,
        )
        return x @ proj.astype(self.dtype)


class CLIPTextTower(nn.Module):
    config: TextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids: [B, 77] -> [B, embed_dim] (argmax-EOS pooled + projected)."""
        cfg = self.config
        B, S = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.width, dtype=self.dtype,
                     param_dtype=jnp.float32, name="token_embedding")(input_ids)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (cfg.context_length, cfg.width), jnp.float32,
        )
        x = x + pos[:S].astype(self.dtype)
        causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
        for i in range(cfg.layers):
            x = ResidualBlock(cfg.width, cfg.heads, dtype=self.dtype,
                              name=f"resblocks_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x.astype(jnp.float32))
        eos = jnp.argmax(input_ids, axis=-1)        # OpenCLIP: EOS has the max id
        pooled = x[jnp.arange(B), eos].astype(self.dtype)
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02),
            (cfg.width, cfg.embed_dim), jnp.float32,
        )
        return pooled @ proj.astype(self.dtype)


def preprocess_clip_image(images01: np.ndarray, size: int = 224) -> np.ndarray:
    """[N, H, W, 3] in [0, 1] -> CLIP-normalized [N, size, size, 3] (bicubic resize
    + center crop + mean/std, the open_clip eval transform)."""
    import jax.image

    x = jnp.asarray(images01, jnp.float32)
    n, h, w, _ = x.shape
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    x = jax.image.resize(x, (n, nh, nw, 3), method="bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top:top + size, left:left + size, :]
    x = (x - CLIP_MEAN) / CLIP_STD
    return np.asarray(x)


def init_clip_image(config: ViTConfig, rng: jax.Array, dtype=jnp.float32):
    model = CLIPImageEncoder(config, dtype=dtype)
    x = jnp.zeros((1, config.image_size, config.image_size, 3))
    return model, model.init(rng, x)["params"]


def init_clip_text_tower(config: TextConfig, rng: jax.Array, dtype=jnp.float32):
    model = CLIPTextTower(config, dtype=dtype)
    ids = jnp.zeros((1, config.context_length), jnp.int32)
    return model, model.init(rng, ids)["params"]


# ---------------------------------------------------------------------------
# OpenCLIP state-dict import
# ---------------------------------------------------------------------------

def import_openclip_params(visual_template, text_template, state_dict):
    """Map an open_clip ViT-H-14 state dict onto (visual, text) param trees.
    OpenCLIP names: visual.conv1.weight, visual.class_embedding,
    visual.positional_embedding, visual.transformer.resblocks.{i}.{ln_1,attn.in_proj_*,
    attn.out_proj,ln_2,mlp.c_fc,mlp.c_proj}, visual.ln_pre/ln_post, visual.proj;
    token_embedding.weight, positional_embedding, transformer.resblocks.*, ln_final,
    text_projection."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def fill_block(tree, prefix, i):
        b = tree[f"resblocks_{i}"]
        p = f"{prefix}transformer.resblocks.{i}."
        b["ln_1"]["scale"] = sd[p + "ln_1.weight"]
        b["ln_1"]["bias"] = sd[p + "ln_1.bias"]
        b["ln_2"]["scale"] = sd[p + "ln_2.weight"]
        b["ln_2"]["bias"] = sd[p + "ln_2.bias"]
        b["in_proj"]["kernel"] = sd[p + "attn.in_proj_weight"].T
        b["in_proj"]["bias"] = sd[p + "attn.in_proj_bias"]
        b["out_proj"]["kernel"] = sd[p + "attn.out_proj.weight"].T
        b["out_proj"]["bias"] = sd[p + "attn.out_proj.bias"]
        b["c_fc"]["kernel"] = sd[p + "mlp.c_fc.weight"].T
        b["c_fc"]["bias"] = sd[p + "mlp.c_fc.bias"]
        b["c_proj"]["kernel"] = sd[p + "mlp.c_proj.weight"].T
        b["c_proj"]["bias"] = sd[p + "mlp.c_proj.bias"]

    import jax.tree_util as jtu

    vis = jtu.tree_map(np.asarray, visual_template)
    n_vis = sum(1 for k in vis if k.startswith("resblocks_"))
    vis["patch_embed"]["kernel"] = np.transpose(
        sd["visual.conv1.weight"], (2, 3, 1, 0)
    )
    vis["class_embedding"] = sd["visual.class_embedding"]
    vis["positional_embedding"] = sd["visual.positional_embedding"]
    vis["ln_pre"]["scale"] = sd["visual.ln_pre.weight"]
    vis["ln_pre"]["bias"] = sd["visual.ln_pre.bias"]
    vis["ln_post"]["scale"] = sd["visual.ln_post.weight"]
    vis["ln_post"]["bias"] = sd["visual.ln_post.bias"]
    vis["proj"] = sd["visual.proj"]
    for i in range(n_vis):
        fill_block(vis, "visual.", i)

    txt = jtu.tree_map(np.asarray, text_template)
    n_txt = sum(1 for k in txt if k.startswith("resblocks_"))
    txt["token_embedding"]["embedding"] = sd["token_embedding.weight"]
    txt["positional_embedding"] = sd["positional_embedding"]
    txt["ln_final"]["scale"] = sd["ln_final.weight"]
    txt["ln_final"]["bias"] = sd["ln_final.bias"]
    txt["text_projection"] = sd["text_projection"]
    for i in range(n_txt):
        fill_block(txt, "", i)
    return vis, txt
