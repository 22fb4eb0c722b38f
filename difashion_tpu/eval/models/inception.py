"""InceptionV3 in flax — torchvision variant (finetuned 50-class IS/accuracy head) and
the FID variant (pytorch_fid / TF-FID structure).

TPU-native equivalents of the reference's two Inceptions:
  * `eval_utils.InceptionV3` (`/root/reference/Evaluation/eval_utils.py:17-89`):
    torchvision inception_v3 with fc replaced by a 50-class head, softmax output,
    plus a 2048-d feature extractor.
  * `eval_utils.FIDInceptionV3` (`eval_utils.py:137-337`): pytorch_fid's FID-Inception —
    same topology with three behavioral deltas: InceptionA/C/E use average pooling with
    count_include_pad=False, and the final InceptionE (Mixed_7c) uses MAX pooling in its
    pool branch.

Inputs: [B, 299, 299, 3] in [-1, 1] (the drivers bilinear-resize + renormalize exactly
like `eval_utils.py:263-270`). `transform_input=True` reproduces torchvision's ImageNet
renormalization.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class BasicConv2d(nn.Module):
    """Conv(no bias) + BatchNorm(eps 1e-3, inference) + ReLU."""

    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=self.padding,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=jnp.float32,
            param_dtype=jnp.float32, name="bn",
        )(x.astype(jnp.float32)).astype(self.dtype)
        return nn.relu(x)


def _avg_pool3(x, count_include_pad: bool):
    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
        count_include_pad=count_include_pad,
    )


class InceptionA(nn.Module):
    pool_features: int
    fid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, name, p=((0, 0), (0, 0)): BasicConv2d(
            f, k, padding=p, dtype=self.dtype, name=name
        )
        b1 = c(64, (1, 1), "branch1x1")(x)
        b5 = c(48, (1, 1), "branch5x5_1")(x)
        b5 = c(64, (5, 5), "branch5x5_2", ((2, 2), (2, 2)))(b5)
        b3 = c(64, (1, 1), "branch3x3dbl_1")(x)
        b3 = c(96, (3, 3), "branch3x3dbl_2", ((1, 1), (1, 1)))(b3)
        b3 = c(96, (3, 3), "branch3x3dbl_3", ((1, 1), (1, 1)))(b3)
        bp = _avg_pool3(x, count_include_pad=not self.fid)
        bp = c(self.pool_features, (1, 1), "branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, name, s=(1, 1), p=((0, 0), (0, 0)): BasicConv2d(
            f, k, strides=s, padding=p, dtype=self.dtype, name=name
        )
        b3 = c(384, (3, 3), "branch3x3", s=(2, 2))(x)
        bd = c(64, (1, 1), "branch3x3dbl_1")(x)
        bd = c(96, (3, 3), "branch3x3dbl_2", p=((1, 1), (1, 1)))(bd)
        bd = c(96, (3, 3), "branch3x3dbl_3", s=(2, 2))(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        c = lambda f, k, name, p=((0, 0), (0, 0)): BasicConv2d(
            f, k, padding=p, dtype=self.dtype, name=name
        )
        b1 = c(192, (1, 1), "branch1x1")(x)
        b7 = c(c7, (1, 1), "branch7x7_1")(x)
        b7 = c(c7, (1, 7), "branch7x7_2", ((0, 0), (3, 3)))(b7)
        b7 = c(192, (7, 1), "branch7x7_3", ((3, 3), (0, 0)))(b7)
        bd = c(c7, (1, 1), "branch7x7dbl_1")(x)
        bd = c(c7, (7, 1), "branch7x7dbl_2", ((3, 3), (0, 0)))(bd)
        bd = c(c7, (1, 7), "branch7x7dbl_3", ((0, 0), (3, 3)))(bd)
        bd = c(c7, (7, 1), "branch7x7dbl_4", ((3, 3), (0, 0)))(bd)
        bd = c(192, (1, 7), "branch7x7dbl_5", ((0, 0), (3, 3)))(bd)
        bp = _avg_pool3(x, count_include_pad=not self.fid)
        bp = c(192, (1, 1), "branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, name, s=(1, 1), p=((0, 0), (0, 0)): BasicConv2d(
            f, k, strides=s, padding=p, dtype=self.dtype, name=name
        )
        b3 = c(192, (1, 1), "branch3x3_1")(x)
        b3 = c(320, (3, 3), "branch3x3_2", s=(2, 2))(b3)
        b7 = c(192, (1, 1), "branch7x7x3_1")(x)
        b7 = c(192, (1, 7), "branch7x7x3_2", p=((0, 0), (3, 3)))(b7)
        b7 = c(192, (7, 1), "branch7x7x3_3", p=((3, 3), (0, 0)))(b7)
        b7 = c(192, (3, 3), "branch7x7x3_4", s=(2, 2))(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    fid: bool = False
    fid_max_pool: bool = False   # pytorch_fid's FIDInceptionE_2 (Mixed_7c)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, name, p=((0, 0), (0, 0)): BasicConv2d(
            f, k, padding=p, dtype=self.dtype, name=name
        )
        b1 = c(320, (1, 1), "branch1x1")(x)
        b3 = c(384, (1, 1), "branch3x3_1")(x)
        b3 = jnp.concatenate([
            c(384, (1, 3), "branch3x3_2a", ((0, 0), (1, 1)))(b3),
            c(384, (3, 1), "branch3x3_2b", ((1, 1), (0, 0)))(b3),
        ], axis=-1)
        bd = c(448, (1, 1), "branch3x3dbl_1")(x)
        bd = c(384, (3, 3), "branch3x3dbl_2", ((1, 1), (1, 1)))(bd)
        bd = jnp.concatenate([
            c(384, (1, 3), "branch3x3dbl_3a", ((0, 0), (1, 1)))(bd),
            c(384, (3, 1), "branch3x3dbl_3b", ((1, 1), (0, 0)))(bd),
        ], axis=-1)
        if self.fid_max_pool:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool3(x, count_include_pad=not self.fid)
        bp = c(192, (1, 1), "branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Full trunk. `num_classes=None` -> features-only (FID use)."""

    num_classes: Optional[int] = None
    fid: bool = False
    transform_input: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        """x: [B, 299, 299, 3] in [-1, 1]."""
        if self.transform_input:
            # torchvision _transform_input: undo 0.5-norm, apply ImageNet stats
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        x = x.astype(self.dtype)
        c = lambda f, k, name, s=(1, 1), p=((0, 0), (0, 0)): BasicConv2d(
            f, k, strides=s, padding=p, dtype=self.dtype, name=name
        )
        x = c(32, (3, 3), "Conv2d_1a_3x3", s=(2, 2))(x)
        x = c(32, (3, 3), "Conv2d_2a_3x3")(x)
        x = c(64, (3, 3), "Conv2d_2b_3x3", p=((1, 1), (1, 1)))(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = c(80, (1, 1), "Conv2d_3b_1x1")(x)
        x = c(192, (3, 3), "Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, fid=self.fid, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, fid=self.fid, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, fid=self.fid, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, fid=self.fid, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, fid=self.fid, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, fid=self.fid, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, fid=self.fid, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(fid=self.fid, dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE(fid=self.fid, fid_max_pool=self.fid, dtype=self.dtype,
                       name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))                      # adaptive avg pool 1x1
        if features_only or self.num_classes is None:
            return feats
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(feats)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def init_inception(rng: jax.Array, num_classes: Optional[int] = None,
                   fid: bool = False, transform_input: bool = False,
                   dtype=jnp.float32, size: int = 299):
    model = InceptionV3(num_classes=num_classes, fid=fid,
                        transform_input=transform_input, dtype=dtype)
    x = jnp.zeros((1, size, size, 3))
    variables = model.init(rng, x)
    return model, variables


def import_inception_params(template_vars, torch_sd, num_classes=None):
    """torchvision/pytorch_fid state dict -> our {params, batch_stats} variables.
    torch names: Mixed_5b.branch1x1.conv.weight, .bn.{weight,bias,running_mean,
    running_var}, fc.{weight,bias}; finetuned 50-class fc maps when num_classes set."""
    import jax.tree_util as jtu

    params = jtu.tree_map(np.asarray, template_vars["params"])
    stats = jtu.tree_map(np.asarray, template_vars.get("batch_stats", {}))
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k: np.asarray(v)
          for k, v in torch_sd.items()}

    def walk(tree, stats_tree, prefix):
        for name, sub in tree.items():
            tkey = prefix + name if not prefix else prefix + "." + name
            if name == "conv" and "kernel" in sub:
                sub["kernel"] = np.transpose(sd[tkey + ".weight"], (2, 3, 1, 0))
            elif name == "bn" and "scale" in sub:
                sub["scale"] = sd[tkey + ".weight"]
                sub["bias"] = sd[tkey + ".bias"]
                st = stats_tree[name]
                st["mean"] = sd[tkey + ".running_mean"]
                st["var"] = sd[tkey + ".running_var"]
            elif name == "fc" and "kernel" in sub:
                if "fc.weight" in sd and sd["fc.weight"].shape[0] == sub["kernel"].shape[1]:
                    sub["kernel"] = sd["fc.weight"].T
                    sub["bias"] = sd["fc.bias"]
            elif isinstance(sub, dict):
                walk(sub, stats_tree.get(name, {}), tkey)

    walk(params, stats, "")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
