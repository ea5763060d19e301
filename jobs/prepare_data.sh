#!/usr/bin/env bash
# Full offline data preparation: CLEVR download dir -> all training artifacts.
# Mirrors the reference pipeline stages (SURVEY.md §1 layer map L1-L3).
set -euo pipefail

CLEVR_DIR=${CLEVR_DIR:-data/CLEVR_v1.0}
OUT_DIR=${OUT_DIR:-data}
RESNET_WEIGHTS=${RESNET_WEIGHTS:-}   # optional torchvision resnet101 .pth

mkdir -p "${OUT_DIR}"

# 1. three-way vocab over val/test/train question JSONs (reference order)
python -m explainable_spatial_vqa_tpu.cli build-vocab \
  --inputs "${CLEVR_DIR}/questions/CLEVR_val_questions.json" \
           "${CLEVR_DIR}/questions/CLEVR_test_questions.json" \
           "${CLEVR_DIR}/questions/CLEVR_train_questions.json" \
  --output "${OUT_DIR}/vocab.json"

# 2. encoded questions h5 per split
for split in train val test; do
  python -m explainable_spatial_vqa_tpu.cli preprocess-questions \
    --input_questions_json "${CLEVR_DIR}/questions/CLEVR_${split}_questions.json" \
    --input_vocab_json "${OUT_DIR}/vocab.json" \
    --output_h5_file "${OUT_DIR}/${split}_questions.h5"
done

# 3. image features (frozen ResNet-101 conv4)
for split in train val; do
  python -m explainable_spatial_vqa_tpu.cli extract-features \
    --input_image_dir "${CLEVR_DIR}/images/${split}" \
    --output_h5_file "${OUT_DIR}/${split}_features.h5" \
    ${RESNET_WEIGHTS:+--torch-weights "${RESNET_WEIGHTS}"}
done

# 4. scenes h5 (boxes + 96-way labels)
python -m explainable_spatial_vqa_tpu.cli export-scenes \
  --input_scenes_json "${CLEVR_DIR}/scenes/CLEVR_train_scenes.json" \
  --output_h5_file "${OUT_DIR}/train_scenes.h5"

# 5. per-step annotations (thesis-canonical v3 + executor-training full mode)
python -m explainable_spatial_vqa_tpu.cli annotate --mode v3 \
  --scenes "${CLEVR_DIR}/scenes/CLEVR_train_scenes.json" \
  --questions "${CLEVR_DIR}/questions/CLEVR_train_questions.json" \
  --output_h5 "${OUT_DIR}/annotated_questions_v3.h5" \
  --vocab_output "${OUT_DIR}/vocab3.json" \
  --workers "$(nproc)"

python -m explainable_spatial_vqa_tpu.cli annotate --mode full \
  --scenes "${CLEVR_DIR}/scenes/CLEVR_train_scenes.json" \
  --questions "${CLEVR_DIR}/questions/CLEVR_train_questions.json" \
  --output_h5 "${OUT_DIR}/annotated_questions.h5" \
  --vocab_output "${OUT_DIR}/full_annotations_vocab.json" \
  --workers "$(nproc)"
