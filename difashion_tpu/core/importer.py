"""HF-checkpoint <-> flax-pytree weight translation.

The reference pulls SD2-base weights from the hub via diffusers/transformers
`from_pretrained` (`/root/reference/DiFashion/models/difashion.py:63-79`) and widens the
UNet conv_in 4->8 channels with zero-init extension (`difashion.py:82-93`). This module
is the equivalent for the TPU build: it maps diffusers/transformers state dicts
(safetensors or torch .bin) onto our NHWC flax param trees — conv OIHW->HWIO, linear
transpose, norm weight->scale — and reproduces the conv_in extension when the source has
4 input channels. The inverse direction (`export_*`) emits an HF-style state dict, used
for checkpoint interchange and as a round-trip correctness test.

Layout expectations (diffusers model dir):
  unet/diffusion_pytorch_model.safetensors, vae/..., text_encoder/model.safetensors
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# state-dict IO
# ---------------------------------------------------------------------------

def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors or torch .bin/.pt state dict into numpy. Handles the
    common {'state_dict': ...} wrapper and bf16 tensors (numpy has no bfloat16,
    so those upcast to fp32)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    if path.endswith(".safetensors.index.json"):
        # sharded checkpoint: merge every shard named by the weight map
        import json

        from safetensors.numpy import load_file

        d = os.path.dirname(path)
        shards = sorted(set(json.load(open(path))["weight_map"].values()))
        sd: Dict[str, np.ndarray] = {}
        for s in shards:
            sd.update(load_file(os.path.join(d, s)))
        return sd
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and isinstance(
            sd["state_dict"], dict):
        sd = sd["state_dict"]

    def to_np(v):
        if v.dtype == torch.bfloat16:
            v = v.float()
        return v.numpy()

    return {k: to_np(v) for k, v in sd.items() if torch.is_tensor(v)}


def find_weights_file(model_dir: str, subfolder: str) -> str:
    d = os.path.join(model_dir, subfolder)
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
        # fp16-variant downloads (diffusers variant="fp16")
        "diffusion_pytorch_model.fp16.safetensors",
        "model.fp16.safetensors",
        "diffusion_pytorch_model.fp16.bin",
        "pytorch_model.fp16.bin",
    ):
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    import glob as _glob

    idx = sorted(_glob.glob(os.path.join(d, "*.safetensors.index.json")))
    if idx:
        return idx[0]   # sharded checkpoint; load_state_dict merges the shards
    raise FileNotFoundError(f"no weights file under {d}")


# ---------------------------------------------------------------------------
# path translation (our flax path -> HF dotted key)
# ---------------------------------------------------------------------------

_BLOCK_RES = re.compile(r"^(down|up)_(\d+)_resnet_(\d+)$")
_BLOCK_ATTN = re.compile(r"^(down|up)_(\d+)_attn_(\d+)$")
_BLOCK_DOWN = re.compile(r"^down_(\d+)_downsample$")
_BLOCK_UP = re.compile(r"^up_(\d+)_upsample$")
_MID_RES = re.compile(r"^mid_resnet_(\d+)$")
_TFB = re.compile(r"^transformer_blocks_(\d+)$")
_LAYERS = re.compile(r"^layers_(\d+)$")


def _translate_segment(seg: str, kind: str) -> str:
    m = _BLOCK_RES.match(seg)
    if m:
        return f"{m.group(1)}_blocks.{m.group(2)}.resnets.{m.group(3)}"
    m = _BLOCK_ATTN.match(seg)
    if m:
        return f"{m.group(1)}_blocks.{m.group(2)}.attentions.{m.group(3)}"
    m = _BLOCK_DOWN.match(seg)
    if m:
        return f"down_blocks.{m.group(1)}.downsamplers.0"
    m = _BLOCK_UP.match(seg)
    if m:
        return f"up_blocks.{m.group(1)}.upsamplers.0"
    m = _MID_RES.match(seg)
    if m:
        return f"mid_block.resnets.{m.group(1)}"
    if seg == "mid_attn":
        return "mid_block.attentions.0"
    m = _TFB.match(seg)
    if m:
        return f"transformer_blocks.{m.group(1)}"
    m = _LAYERS.match(seg)
    if m:
        return f"encoder.layers.{m.group(1)}"
    if seg == "to_out_0":
        return "to_out.0"
    if seg == "net_0":
        return "net.0"
    if seg == "net_2":
        return "net.2"
    if seg in ("Conv_0", "GroupNorm_0"):
        return ""  # wrapper modules are transparent in HF naming
    if kind == "text" and seg == "token_embedding":
        return "embeddings.token_embedding"
    if kind == "text" and seg == "position_embedding":
        return "embeddings.position_embedding"
    if kind == "text" and seg in ("fc1", "fc2"):
        return "mlp." + seg
    if kind == "mutual" and seg == "mlp_0":
        return "mlp.0"
    if kind == "mutual" and seg == "mlp_3":
        return "mlp.3"
    return seg


def flax_path_to_hf_key(path: Tuple[str, ...], kind: str) -> str:
    """('down_0_resnet_1', 'conv1', 'Conv_0', 'kernel') -> 'down_blocks.0.resnets.1.conv1.weight'."""
    *mods, leaf = path
    segs = [_translate_segment(s, kind) for s in mods]
    segs = [s for s in segs if s]
    if leaf in ("kernel", "scale", "embedding"):
        hf_leaf = "weight"
    elif leaf == "bias":
        hf_leaf = "bias"
    else:
        raise KeyError(f"unknown leaf {leaf!r} at {path}")
    prefix = "text_model." if kind == "text" else ""
    return prefix + ".".join(segs + [hf_leaf])


def _to_flax(value: np.ndarray, leaf: str) -> np.ndarray:
    if leaf == "kernel":
        if value.ndim == 4:      # OIHW -> HWIO
            return np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:      # [out, in] -> [in, out]
            return value.T
    return value


def _to_hf(value: np.ndarray, leaf: str) -> np.ndarray:
    if leaf == "kernel":
        if value.ndim == 4:      # HWIO -> OIHW
            return np.transpose(value, (3, 2, 0, 1))
        if value.ndim == 2:
            return value.T
    return value


def _mutual_latent_dims(flat_dim: int,
                        dims: Optional[Tuple[int, int]] = None) -> Tuple[int, int]:
    """(C, S) for a MutualEncoder flat latent dim C*S*S. Pass `dims` from the
    model config when available — the factorization is AMBIGUOUS from flat_dim
    alone (4*64*64 == 16*32*32), and guessing wrong silently permutes the MLP
    weights. The fallback assumes the SD-family constant C=4
    (reference `difashion.py:360`)."""
    if dims is not None:
        c, s = dims
        if c * s * s != flat_dim:
            raise ValueError(
                f"mutual dims {dims} inconsistent with flat dim {flat_dim}"
            )
        return c, s
    c = 4
    s = int(round((flat_dim / c) ** 0.5))
    if c * s * s != flat_dim:
        raise ValueError(f"cannot factor mutual flat dim {flat_dim} as 4*S*S")
    return c, s


def _mutual_kernel_to_flax(value: np.ndarray, seg: str,
                           dims: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Torch MutualEncoder flattens latents in NCHW order (`difashion.py:41`,
    `view(bsz, -1)` on [B,C,H,W]); our flax module flattens NHWC. Re-order the
    flattened axis of the two Linear kernels accordingly."""
    if seg == "mlp_0":           # torch weight [hid, C*S*S] -> flax kernel [S*S*C, hid]
        hid, flat = value.shape
        c, s = _mutual_latent_dims(flat, dims)
        return value.reshape(hid, c, s, s).transpose(0, 2, 3, 1).reshape(hid, flat).T
    if seg == "mlp_3":           # torch weight [C*S*S, hid] -> flax kernel [hid, S*S*C]
        flat, hid = value.shape
        c, s = _mutual_latent_dims(flat, dims)
        return value.reshape(c, s, s, hid).transpose(1, 2, 0, 3).reshape(flat, hid).T
    raise KeyError(seg)


def _mutual_kernel_to_hf(value: np.ndarray, seg: str,
                         dims: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Inverse of `_mutual_kernel_to_flax`."""
    if seg == "mlp_0":           # flax kernel [S*S*C, hid] -> torch weight [hid, C*S*S]
        flat, hid = value.shape
        c, s = _mutual_latent_dims(flat, dims)
        return value.T.reshape(hid, s, s, c).transpose(0, 3, 1, 2).reshape(hid, flat)
    if seg == "mlp_3":           # flax kernel [hid, S*S*C] -> torch weight [C*S*S, hid]
        hid, flat = value.shape
        c, s = _mutual_latent_dims(flat, dims)
        return value.T.reshape(s, s, c, hid).transpose(2, 0, 1, 3).reshape(flat, hid)
    raise KeyError(seg)


def _mutual_bias_to_flax(value: np.ndarray,
                         dims: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """mlp_3 bias lives in the flattened latent space: CHW order -> HWC order."""
    c, s = _mutual_latent_dims(value.shape[0], dims)
    return value.reshape(c, s, s).transpose(1, 2, 0).reshape(-1)


def _mutual_bias_to_hf(value: np.ndarray,
                       dims: Optional[Tuple[int, int]] = None) -> np.ndarray:
    c, s = _mutual_latent_dims(value.shape[0], dims)
    return value.reshape(s, s, c).transpose(2, 0, 1).reshape(-1)


# VAE attention: old diffusers checkpoints use query/key/value/proj_attn
_VAE_ATTN_ALIASES = {
    "to_q": "query", "to_k": "key", "to_v": "value", "to_out.0": "proj_attn",
}


def import_params(template, state_dict: Dict[str, np.ndarray], kind: str,
                  strict: bool = True,
                  mutual_dims: Optional[Tuple[int, int]] = None):
    """Fill a flax param tree (template gives structure/shapes) from an HF state
    dict. For kind='mutual', pass `mutual_dims=(latent_channels, latent_size)`
    from the model config — the NCHW->NHWC re-ordering cannot infer them from
    the flat dim alone (see `_mutual_latent_dims`)."""
    import jax.tree_util as jtu

    flat = jtu.tree_flatten_with_path(template)[0]
    out = {}
    used = set()
    missing = []
    for path_keys, leaf_val in flat:
        path = tuple(str(k.key) for k in path_keys)
        leaf = path[-1]
        if kind == "mutual" and path[0] == "category_embedding":
            key = "category_embedding.weight"
        else:
            key = flax_path_to_hf_key(path, kind)
        value = state_dict.get(key)
        if value is None and kind == "vae":
            for new, old in _VAE_ATTN_ALIASES.items():
                if new in key:
                    alt = key.replace(new, old)
                    value = state_dict.get(alt)
                    if value is not None:
                        key = alt
                        break
        if value is None:
            if kind == "mutual" and "category_embedding" in key:
                value = np.asarray(leaf_val)  # optional: absent in some ckpts
            else:
                missing.append(key)
                continue
        used.add(key)
        value = np.asarray(value)
        if kind == "mutual" and path[0] in ("mlp_0", "mlp_3") and leaf == "kernel":
            value = _mutual_kernel_to_flax(value, path[0], mutual_dims)
        elif kind == "mutual" and path[0] == "mlp_3" and leaf == "bias":
            value = _mutual_bias_to_flax(value, mutual_dims)
        else:
            value = _to_flax(value, leaf)
        expect = np.shape(leaf_val)
        if value.shape != expect:
            # conv_in 4->8 channel extension (difashion.py:82-93): zero-init new
            # input channels, copy pretrained into the first four. ONLY the
            # UNet's conv_in — anywhere else a channel mismatch is a wrong
            # checkpoint and must raise, not silently zero-pad.
            if (
                kind == "unet" and path[0] == "conv_in"
                and leaf == "kernel" and value.ndim == 4
                and value.shape[:2] == expect[:2]
                and value.shape[3] == expect[3]
                and value.shape[2] < expect[2]
            ):
                wide = np.zeros(expect, value.dtype)
                wide[:, :, : value.shape[2], :] = value
                value = wide
            else:
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: ckpt {value.shape} "
                    f"vs model {expect}"
                )
        out["/".join(path)] = value.astype(np.float32)
    if missing and strict:
        raise KeyError(f"{len(missing)} keys missing, e.g. {missing[:5]}")
    unconsumed = [
        k for k in state_dict.keys() - used
        # known benign extras in HF checkpoints
        if not k.endswith("position_ids") and "num_batches_tracked" not in k
    ]
    if unconsumed:
        # loud warning, not an error: real checkpoints legitimately carry extras
        # (EMA copies, processor state), but silence would hide naming drift
        import logging

        logging.getLogger("difashion_tpu").warning(
            "%d state-dict keys not consumed by any %s parameter "
            "(naming drift or extras?), e.g. %s",
            len(unconsumed), kind, sorted(unconsumed)[:5],
        )
    # rebuild the tree
    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return out.get("/".join(prefix), np.asarray(tree))

    return rebuild(template), missing


def export_params(params, kind: str,
                  mutual_dims: Optional[Tuple[int, int]] = None
                  ) -> Dict[str, np.ndarray]:
    """flax params -> HF-style state dict (inverse of import_params). For
    kind='mutual', pass `mutual_dims=(latent_channels, latent_size)` from the
    model config (see `_mutual_latent_dims`)."""
    import jax.tree_util as jtu

    sd = {}
    for path_keys, leaf_val in jtu.tree_flatten_with_path(params)[0]:
        path = tuple(str(k.key) for k in path_keys)
        if kind == "mutual" and path[0] == "category_embedding":
            key = "category_embedding.weight"
        else:
            key = flax_path_to_hf_key(path, kind)
        value = np.asarray(leaf_val)
        if kind == "mutual" and path[0] in ("mlp_0", "mlp_3") and path[-1] == "kernel":
            value = _mutual_kernel_to_hf(value, path[0], mutual_dims)
        elif kind == "mutual" and path[0] == "mlp_3" and path[-1] == "bias":
            value = _mutual_bias_to_hf(value, mutual_dims)
        else:
            value = _to_hf(value, path[-1])
        sd[key] = value
    return sd


# ---------------------------------------------------------------------------
# top-level: load a diffusers SD model dir into DiFashion params
# ---------------------------------------------------------------------------

def import_sd_checkpoint(model_dir: str, params, strict: bool = True):
    """Fill {unet, vae, text_encoder} from a local diffusers SD2-base directory.
    Returns updated params (fashion_encoder untouched — it's newly initialized, as in
    the reference, `difashion.py:95-102`)."""
    new = dict(params)
    for kind, sub in (("unet", "unet"), ("vae", "vae"), ("text", "text_encoder")):
        sd = load_state_dict(find_weights_file(model_dir, sub))
        new[sub], _ = import_params(params[sub], sd, kind, strict=strict)
    return new
