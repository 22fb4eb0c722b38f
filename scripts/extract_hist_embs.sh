#!/bin/sh
# Catalog feature extraction (reference Evaluation/extract_hist_embs.sh + the
# preprocess_dataset VAE cache): VAE moments + CLIP features + history means.
python -m difashion_tpu extract-features \
    --data_path "${DATA_PATH:-datasets/polyvore}" \
    --img_folder_path "${IMG_FOLDER:-images}" \
    --image_paths_npy "${IMAGE_PATHS:-all_item_image_paths.npy}" "$@" 2>&1 | tee extract_features.log
