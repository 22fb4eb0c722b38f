"""Feature-extraction CLI: catalog VAE moments + CLIP features + history means.

Covers two reference preprocessing flows:
  * `preprocess_dataset`'s catalog VAE encode + hist-latent means
    (`/root/reference/DiFashion/data_utils.py:87-161`) -> `--stage vae`
  * `extract_hist_embs.py` catalog CLIP features + per-(uid,cate) mean CLIP embs
    (`/root/reference/Evaluation/extract_hist_embs.py:81-166`) -> `--stage clip`
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from difashion_tpu.core.config import Config
from difashion_tpu.core.logging import setup_logging
from difashion_tpu.data.datasets import FashionData, load_npy
from difashion_tpu.data.precompute import (
    encode_catalog,
    moments_to_scaled_modes,
    save_processed,
)
from difashion_tpu.data.preprocessing import load_catalog_image


def make_item_loader(img_folder: str, image_paths, size: int):
    """Prefers the native C++ pipeline (libjpeg/libpng + threaded Lanczos) when built;
    falls back to the PIL path."""
    from difashion_tpu.data import native

    if native.native_available():
        def load_native(iid: int):
            return native.prepare_image(
                os.path.join(img_folder, str(image_paths[iid])), size=size
            )

        return load_native

    # PIL fallback: the SAME pipeline as the native path (white-composite ->
    # pad-square -> Lanczos), NOT the training transform — otherwise catalog
    # moments silently differ between machines with and without the .so
    from PIL import Image

    from difashion_tpu.data.preprocessing import prepare_catalog_image

    def load(iid: int):
        img = Image.open(os.path.join(img_folder, str(image_paths[iid])))
        arr = np.asarray(prepare_catalog_image(img, size=size), np.float32)
        return 2.0 * (arr / 255.0) - 1.0

    return load


def main(argv=None):
    p = argparse.ArgumentParser(description="DiFashion-TPU feature extraction")
    p.add_argument("--data_path", required=True)
    p.add_argument("--img_folder_path", required=True)
    p.add_argument("--image_paths_npy", required=True)
    p.add_argument("--stage", choices=["vae", "clip", "all"], default="all")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--clip_batch_size", type=int, default=200)
    p.add_argument("--weights_dir", default=None)
    p.add_argument("--pretrained_dir", default=None)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    log = setup_logging()
    cfg = Config.preset_tiny() if args.tiny else Config.preset_eta01()
    image_paths = load_npy(args.image_paths_npy)
    n_items = len(image_paths)
    data = FashionData.load(args.data_path)

    if args.stage in ("vae", "all"):
        from difashion_tpu.models.difashion import create_difashion

        model, params = create_difashion(cfg.model, jax.random.PRNGKey(0))
        if args.pretrained_dir:
            from difashion_tpu.core.importer import import_sd_checkpoint

            params = import_sd_checkpoint(args.pretrained_dir, params)
        loader = make_item_loader(
            args.img_folder_path, image_paths, cfg.model.vae.sample_size
        )
        log.info("VAE-encoding %d catalog items ...", n_items)
        moments = encode_catalog(model, params, loader, n_items,
                                 batch_size=args.batch_size)
        save_processed(args.data_path, "all_item_moments", **moments)
        all_latents = moments_to_scaled_modes(
            moments, cfg.model.vae.scaling_factor
        )
        np.save(os.path.join(args.data_path, "processed", "all_item_latents.npy"),
                all_latents)
        log.info("saved all_item_moments.npz / all_item_latents.npy")

    if args.stage in ("clip", "all"):
        from difashion_tpu.eval.drivers import (
            extract_catalog_clip_features,
            process_history_clip_embs,
        )
        from difashion_tpu.eval.extractors import build_extractors

        X = build_extractors(args.weights_dir, batch_size=args.clip_batch_size,
                             tiny=args.tiny)

        def loader01(iid: int):
            img = load_catalog_image(
                os.path.join(args.img_folder_path, str(image_paths[iid])), size=512
            )
            return (img + 1.0) / 2.0

        log.info("CLIP-encoding %d catalog items ...", n_items)
        feats = extract_catalog_clip_features(X, loader01, n_items,
                                              batch_size=args.clip_batch_size)
        np.save(os.path.join(args.data_path, "processed",
                             "cnn_features_clip.npy"), feats)
        for split, hist in data.history.items():
            embs = process_history_clip_embs(hist, feats)
            np.save(os.path.join(args.data_path, "processed",
                                 f"{split}_history_clipembs.npy"),
                    np.array(embs, dtype=object))
            log.info("saved %s_history_clipembs.npy", split)


if __name__ == "__main__":
    main()
