#!/bin/sh
# Fast-serving recipe (beyond-reference): warm-model HTTP service with the
# DPM-Solver++(2M) 20-step scheduler — ~2.5x the 50-step PNDM generation
# throughput at comparable quality (BASELINE.md: 1.91 vs 0.76 outfit-img/s/chip).
# Drop --scheduler/--num_inference_steps for the reference-parity PNDM-50 path.
python -m difashion_tpu serve \
    --data_path "${DATA_PATH:-datasets/polyvore}" \
    --ckpt_dir "${CKPT_DIR:-ckpt}" \
    --scheduler dpmpp --num_inference_steps 20 \
    --port "${PORT:-8080}" 2>&1 | tee serve.log
