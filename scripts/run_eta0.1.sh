#!/bin/sh
# Canonical training recipe — the reference's run_eta0.1.sh
# (/root/reference/DiFashion/run_eta0.1.sh:1) on the TPU stack: lr 1e-5, eta 0.1,
# min-SNR gamma 5.0, bsz 2, EMA on, 20k steps, resume from latest.
python -m difashion_tpu train \
    --data_path "${DATA_PATH:-datasets/polyvore}" \
    --output_dir "${OUTPUT_DIR:-ckpt}" \
    --pretrained_dir "${PRETRAINED_DIR:-}" \
    --resume_from_checkpoint latest "$@" 2>&1 | tee train.log
