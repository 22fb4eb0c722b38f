"""FashionEvaluator compatibility net in flax (vectorized, no per-outfit Python loop).

Behavior-parity with `/root/reference/Evaluation/compatibility_evaluator/
compatibility_net.py:14-81`: per-item Linear(1024->1024), all C(4,2)=6 ordered pair
concats (2048) -> 4-layer MLP (LayerNorm+ReLU+Dropout 0.35) -> 256 emb, mean over the 6
pairs, then a 4-layer eval head -> scalar logit; the caller applies sigmoid
(`eval_utils.py:585-587`). Checkpoints `ifashion_evaluator.pth` / `polyvore_evaluator.pth`
import via `import_compat_params`.
"""
from __future__ import annotations

import itertools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _mlp_block(x, features, name_prefix, dtype, deterministic, dropout=0.35):
    x = nn.Dense(features, dtype=dtype, name=f"{name_prefix}_dense")(x)
    x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"{name_prefix}_ln")(
        x.astype(jnp.float32)
    ).astype(dtype)
    x = nn.relu(x)
    return nn.Dropout(dropout)(x, deterministic=deterministic)


class FashionEvaluator(nn.Module):
    cnn_feat_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cnn_feats: jnp.ndarray, deterministic: bool = True):
        """cnn_feats: [B, olen, cnn_feat_dim] -> logits [B]."""
        B, olen, _ = cnn_feats.shape
        feats = nn.Dense(1024, dtype=self.dtype, name="feat_layer")(cnn_feats)
        pairs = list(itertools.combinations(range(olen), 2))   # 6 pairs for olen=4
        comb = jnp.stack(
            [jnp.concatenate([feats[:, i], feats[:, j]], axis=-1) for i, j in pairs],
            axis=1,
        )                                                       # [B, 6, 2048]
        x = comb.reshape(B * len(pairs), -1)
        for i, f in enumerate((512, 512, 256, 256)):
            x = _mlp_block(x, f, f"emb_{i}", self.dtype, deterministic)
        o_emb = x.reshape(B, len(pairs), -1).mean(axis=1)       # [B, 256]
        x = o_emb
        for i, f in enumerate((128, 128, 32)):
            x = _mlp_block(x, f, f"eval_{i}", self.dtype, deterministic)
        x = nn.Dense(1, dtype=self.dtype, name="eval_out")(x)
        return x.reshape(-1)


def init_fashion_evaluator(cnn_feat_dim: int, rng: jax.Array, dtype=jnp.float32):
    model = FashionEvaluator(cnn_feat_dim, dtype=dtype)
    x = jnp.zeros((1, 4, cnn_feat_dim))
    params = model.init(rng, x)["params"]
    return model, params


# torch state-dict layer indices -> our names
# emb_layer: Linear at 0,4,8,12; LayerNorm at 1,5,9,13
# eval_layer: Linear at 0,4,8; LayerNorm at 1,5,9; final Linear at 12
_EMB_LINEAR = {0: "emb_0_dense", 4: "emb_1_dense", 8: "emb_2_dense", 12: "emb_3_dense"}
_EMB_LN = {1: "emb_0_ln", 5: "emb_1_ln", 9: "emb_2_ln", 13: "emb_3_ln"}
_EVAL_LINEAR = {0: "eval_0_dense", 4: "eval_1_dense", 8: "eval_2_dense",
                12: "eval_out"}
_EVAL_LN = {1: "eval_0_ln", 5: "eval_1_ln", 9: "eval_2_ln"}


def import_compat_params(template, state_dict) -> dict:
    """Map a torch FashionEvaluator state dict onto our param tree."""
    out = jax.tree_util.tree_map(np.asarray, template)

    def put(name, w=None, b=None, is_ln=False):
        kw, kb = ("scale", "bias") if is_ln else ("kernel", "bias")
        if w is not None:
            out[name][kw] = w if is_ln else np.asarray(w).T
        if b is not None:
            out[name][kb] = np.asarray(b)

    for key, val in state_dict.items():
        val = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "feat_layer":
            put("feat_layer", w=val if parts[1] == "weight" else None,
                b=val if parts[1] == "bias" else None)
        elif parts[0] in ("emb_layer", "eval_layer"):
            idx = int(parts[1])
            lin = (_EMB_LINEAR if parts[0] == "emb_layer" else _EVAL_LINEAR).get(idx)
            ln = (_EMB_LN if parts[0] == "emb_layer" else _EVAL_LN).get(idx)
            if lin is not None:
                put(lin, w=val if parts[2] == "weight" else None,
                    b=val if parts[2] == "bias" else None)
            elif ln is not None:
                if parts[2] == "weight":
                    out[ln]["scale"] = val
                else:
                    out[ln]["bias"] = val
    return out


def gather_outfit_feats(outfits: np.ndarray, cnn_feats: np.ndarray,
                        cnn_feats_gen: np.ndarray | None) -> np.ndarray:
    """Reference pointer convention (`eval_utils.py:575-584`): iid > 0 indexes the
    catalog features; iid <= 0 indexes generated-image features at -iid.

    Vectorized (two fancy-indexed gathers + a mask select) — the reference's Python
    loop is O(B*olen) feature copies, which matters at catalog-scale grounding runs."""
    idx = np.asarray(outfits, np.int64)
    neg = idx <= 0
    out = cnn_feats[np.where(neg, 0, idx)]
    if neg.any():
        if cnn_feats_gen is None:
            raise ValueError("outfits contain generated-item pointers (iid <= 0) "
                             "but cnn_feats_gen is None")
        out[neg] = cnn_feats_gen[(-idx)[neg]]
    return out.astype(cnn_feats.dtype, copy=False)
