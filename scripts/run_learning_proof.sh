#!/usr/bin/env bash
# Mid-scale learning proof on the TPU: 128px DiFashion overfit through the real
# train -> generate CLIs with the production 4-branch CFG + 50-step PNDM path,
# gated on image-space reconstruction. Artifact: tools/logs/learning_proof_tpu.json
# (see tools/learning_proof_tpu.py; the CPU-tiny twin is tests/test_learning_e2e.py).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python tools/learning_proof_tpu.py --workdir "${WORKDIR:-/tmp/lproof}" \
  --steps "${STEPS:-900}" --img "${IMG:-128}" \
  --inference_steps "${INFERENCE_STEPS:-50}" "$@"
