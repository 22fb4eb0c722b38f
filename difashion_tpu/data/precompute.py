"""Catalog precompute: VAE latents for every item, history means, tokenized prompts.

Mirrors the reference's `processed/` cache contract (`/root/reference/DiFashion/
data_utils.py:87-161`) with one TPU-first upgrade: instead of storing only `.mode()`
latents, the catalog cache stores the full DiagonalGaussian *moments* (mean, logvar), so
the training fast path can draw fresh `.sample()` latents per step on device — exactly
the reference's per-step `latent_dist.sample()` behavior (`difashion.py:144`) without
re-running the VAE encoder every step.

Artifacts (all .npz/.npy under `<data_path>/processed/`):
  * all_item_moments.npz: mean [N, h, w, C], logvar [N, h, w, C]  (unscaled)
  * all_item_latents.npy: mode * scaling_factor [N, h, w, C]      (reference contract)
  * {split}_hist_latents: via HistLatentStore.from_catalog
  * input_ids per outfit table via the tokenizer + train prompts
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from difashion_tpu.data.datasets import HistLatentStore, OutfitTable
from difashion_tpu.data.prompts import build_train_prompts
from difashion_tpu.models.difashion import DiFashionModel
from difashion_tpu.models.vae import AutoencoderKL


def encode_catalog(
    model: DiFashionModel,
    params,
    image_loader: Callable[[int], np.ndarray],
    num_items: int,
    batch_size: int = 64,
) -> dict:
    """VAE-encode the whole item catalog (reference `data_utils.py:115-136`, batches of
    64). `image_loader(i)` -> [H, W, 3] in [-1, 1]. Returns {mean, logvar} unscaled."""

    @jax.jit
    def encode(p, imgs):
        dist = model.vae.apply({"params": p["vae"]}, imgs,
                               method=AutoencoderKL.encode)
        return dist.mean, dist.logvar

    means, logvars = [], []
    for start in range(0, num_items, batch_size):
        end = min(start + batch_size, num_items)
        imgs = np.stack([image_loader(i) for i in range(start, end)])
        n = end - start
        if n < batch_size:
            # pad the ragged last batch to the compiled shape: a second full
            # VAE-encode compilation for one partial batch is tens of seconds
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - n,) + imgs.shape[1:], imgs.dtype)]
            )
        m, lv = encode(params, jnp.asarray(imgs))
        means.append(np.asarray(m[:n], np.float32))
        logvars.append(np.asarray(lv[:n], np.float32))
    return {
        "mean": np.concatenate(means, axis=0),
        "logvar": np.concatenate(logvars, axis=0),
    }


def moments_to_scaled_modes(moments: dict, scaling_factor: float) -> np.ndarray:
    """mode() * scaling_factor — the reference's `all_item_latents.npy` contract."""
    return moments["mean"] * scaling_factor


def tokenize_outfits(table: OutfitTable, id_cate_dict, tokenizer) -> np.ndarray:
    """Per-outfit [olen, 77] input_ids using the *training* prompt form
    (reference `data_utils.py:96-111`). Returns [N, olen, 77] int32."""
    N, olen = table.category.shape
    if N == 0:
        return np.zeros((0, olen, 77), np.int32)
    # tokenize each unique category once; outfits index into the table
    unique_cids = np.unique(table.category).astype(int).tolist()
    prompts = build_train_prompts(unique_cids, id_cate_dict)
    ids = tokenizer(prompts)                         # [U, 77]
    cid_to_row = {c: i for i, c in enumerate(unique_cids)}
    rows = np.vectorize(cid_to_row.get, otypes=[np.int64])(table.category)
    return ids[rows].astype(np.int32)                # [N, olen, 77]


def build_processed_cache(
    data_path: str,
    data,
    id_cate_dict,
    tokenizer,
    moments: dict,
    scaling_factor: float,
) -> dict:
    """Materialize the reference's `processed/` cache contract
    (`/root/reference/DiFashion/data_utils.py:87-161` + SURVEY.md §2d):

      new_train.npz / new_fitb_valid.npz / new_fitb_test.npz — outfit tables with
        per-outfit tokenized `input_ids` [olen, 77] added;
      all_item_latents.npy — mode() * scaling_factor per item;
      {split}_hist_latents.npy — {uid: {cid: mean latent}} + "null" entry.

    Plus the TPU-first extra `all_item_moments.npz` (mean, logvar) so training keeps
    fresh-sample semantics. Returns {table_name: path}.
    """
    out = {}
    pdir = os.path.join(data_path, "processed")
    os.makedirs(pdir, exist_ok=True)

    all_latents = moments_to_scaled_modes(moments, scaling_factor)
    np.save(os.path.join(pdir, "all_item_latents.npy"), all_latents)
    np.savez(os.path.join(pdir, "all_item_moments.npz"), **moments)
    out["all_item_latents"] = os.path.join(pdir, "all_item_latents.npy")

    for name, table in (("new_train", data.train),
                        ("new_fitb_valid", data.fitb_valid),
                        ("new_fitb_test", data.fitb_test)):
        if table is None:
            continue
        ids = tokenize_outfits(table, id_cate_dict, tokenizer)
        p = os.path.join(pdir, name + ".npz")
        np.savez(p, uids=table.uids, oids=table.oids, outfits=table.outfits,
                 category=table.category, input_ids=ids)
        out[name] = p

    for split, hist in data.history.items():
        store = HistLatentStore.from_catalog(hist, all_latents)
        payload = dict(store.hist)
        payload["null"] = store.null
        p = os.path.join(pdir, f"{split}_hist_latents.npy")
        np.save(p, np.array(payload, dtype=object))
        out[f"{split}_hist_latents"] = p
    return out


def save_processed(data_path: str, name: str, **arrays):
    os.makedirs(os.path.join(data_path, "processed"), exist_ok=True)
    np.savez(os.path.join(data_path, "processed", name + ".npz"), **arrays)


def load_processed(data_path: str, name: str) -> Optional[dict]:
    p = os.path.join(data_path, "processed", name + ".npz")
    if not os.path.exists(p):
        return None
    with np.load(p, allow_pickle=True) as z:
        return {k: z[k] for k in z.files}
