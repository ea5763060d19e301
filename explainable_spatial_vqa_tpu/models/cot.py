"""Chain-of-thought (bbox-as-tokens) IQAP variant helpers.

In the CoT design branch, bounding-box coordinates appear inline in the
decoded program/answer sequence as quantized text tokens ('0.123').  The
reference (train_transformer_iqap_cot.py:85-137, 360-386):

- skips bbox-coordinate tokens in the CE loss,
- re-parses '(x , y , x , y)' groups from decoded token strings by regex for
  a (non-differentiable) IoU report.

TPU redesign: the skip set is precomputed once into a boolean table indexed
by token id, so the masked CE is a gather + the standard weighted CE — fully
on device and batched (the reference filters token-by-token in Python inside
the train step).  The regex IoU remains a host-side *metric* (it carried no
gradient in the reference either — its 'bbox loss' was a constant tensor).

The model for this variant is TransformerIQAP decoding the combined sequence;
these helpers supply its loss/metric plumbing.
"""

from __future__ import annotations

import re
from typing import Dict, List, Mapping, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from explainable_spatial_vqa_tpu.evalsuite.detection import box_iou_matrix
from explainable_spatial_vqa_tpu.train.losses import cross_entropy

__all__ = [
    "is_bbox_token",
    "bbox_token_table",
    "cross_entropy_skip_bbox",
    "parse_bboxes_from_tokens",
    "mean_sequential_iou",
]

_BBOX_TOKEN_RE = re.compile(r"^[0-1]\.\d{3}$")
_BBOX_GROUP_RE = re.compile(
    r"\(\s*([0-1]\.\d{3})\s*,\s*([0-1]\.\d{3})\s*,\s*([0-1]\.\d{3})\s*,\s*([0-1]\.\d{3})\s*\)"
)


def is_bbox_token(token: str) -> bool:
    return bool(_BBOX_TOKEN_RE.match(token))


def bbox_token_table(idx_to_token: Mapping[int, str], vocab_size: int) -> np.ndarray:
    """bool[vocab_size]: True where the token is a bbox coordinate."""
    table = np.zeros(vocab_size, bool)
    for idx, token in idx_to_token.items():
        if 0 <= int(idx) < vocab_size and is_bbox_token(str(token)):
            table[int(idx)] = True
    return table


def cross_entropy_skip_bbox(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    bbox_table: jnp.ndarray,
    ignore_index: int = 0,
) -> jnp.ndarray:
    """CE over non-bbox, non-pad target positions (device-side gather mask)."""
    keep = jnp.logical_not(jnp.take(jnp.asarray(bbox_table), targets))
    return cross_entropy(
        logits, targets, ignore_index=ignore_index, label_weights=keep.astype(jnp.float32)
    )


def parse_bboxes_from_tokens(
    token_ids: Sequence[int], idx_to_token: Mapping[int, str]
) -> List[Tuple[float, float, float, float]]:
    text = " ".join(idx_to_token.get(int(t), "<UNK>") for t in token_ids)
    return [tuple(float(g) for g in m.groups()) for m in _BBOX_GROUP_RE.finditer(text)]


def mean_sequential_iou(
    pred_seqs: np.ndarray,
    gt_seqs: np.ndarray,
    idx_to_token: Mapping[int, str],
) -> Dict[str, float]:
    """Position-paired mean IoU over parsed boxes, as the reference reports
    (pairs the i-th predicted box with the i-th GT box)."""
    total, count = 0.0, 0
    for pred_row, gt_row in zip(pred_seqs, gt_seqs):
        pred = parse_bboxes_from_tokens(pred_row, idx_to_token)
        gt = parse_bboxes_from_tokens(gt_row, idx_to_token)
        if pred and gt:
            pairs = min(len(pred), len(gt))
            iou = box_iou_matrix(np.asarray(pred[:pairs]), np.asarray(gt[:pairs]))
            total += float(np.mean(np.diag(iou)))
            count += 1
    return {"mean_iou": total / count if count else 0.0, "evaluated": float(count)}
