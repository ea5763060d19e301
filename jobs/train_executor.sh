#!/usr/bin/env bash
# TPU training job: thesis-final Program Executor.
# Replaces the reference's SGE launchers (code/scripts/*.sh — qsub, 24h, 80G,
# 1x A100): one command per job, preemption-safe via orbax resume (the trainer
# restarts from the latest checkpoint automatically).
set -euo pipefail

DATA_DIR=${DATA_DIR:-data}
CKPT_DIR=${CKPT_DIR:-checkpoints/executor}

python -m explainable_spatial_vqa_tpu.cli train \
  --preset executor \
  --features_h5 "${DATA_DIR}/train_features.h5" \
  --annotated_h5 "${DATA_DIR}/annotated_questions.h5" \
  --split_vocab_json "${DATA_DIR}/vocab3.json" \
  --checkpoint_dir "${CKPT_DIR}" \
  --history_json "${CKPT_DIR}/history.json" \
  "$@"
