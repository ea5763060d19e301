#!/usr/bin/env bash
# TPU training job: Program Generator (thesis bi-LSTM + Luong attention).
set -euo pipefail

DATA_DIR=${DATA_DIR:-data}
CKPT_DIR=${CKPT_DIR:-checkpoints/generator}

python -m explainable_spatial_vqa_tpu.cli train \
  --preset generator \
  --questions_h5 "${DATA_DIR}/train_questions.h5" \
  --checkpoint_dir "${CKPT_DIR}" \
  --history_json "${CKPT_DIR}/history.json" \
  "$@"
