"""On-device metric computations shared by training and the eval suite.

Mirrors the reference's inline epoch metrics (train_transformer_iqap.py:326-345):
answer accuracy, program exact-match, program token accuracy; plus mean IoU
(train_transformer_iqap_bb.py:126-150).  All are sums/counts so they aggregate
exactly across sharded batches.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from explainable_spatial_vqa_tpu.ops.matching import box_iou

__all__ = [
    "answer_metrics",
    "program_metrics",
    "masked_token_metrics",
    "mean_iou",
    "MetricAccumulator",
]


def answer_metrics(answer_logits: jnp.ndarray, answers: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    pred = jnp.argmax(answer_logits, axis=-1)
    return {"answer_correct": jnp.sum(pred == answers), "answer_total": answers.shape[0]}


def program_metrics(
    program_pred: jnp.ndarray, program_targets: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Exact-match counts over full sequences + token counts (reference
    compares all positions including padding, train_transformer_iqap.py:331-337)."""
    token_eq = program_pred == program_targets
    return {
        "program_em": jnp.sum(jnp.all(token_eq, axis=-1)),
        "program_em_total": program_targets.shape[0],
        "token_correct": jnp.sum(token_eq),
        "token_total": token_eq.size,
    }


def masked_token_metrics(
    pred: jnp.ndarray, targets: jnp.ndarray, pad_id: int = 0
) -> Dict[str, jnp.ndarray]:
    """Token accuracy over non-pad positions (the _new.py executor metric)."""
    valid = targets != pad_id
    return {
        "token_correct": jnp.sum((pred == targets) & valid),
        "token_total": jnp.sum(valid),
    }


def mean_iou(
    pred_boxes: jnp.ndarray, target_boxes: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> Dict[str, jnp.ndarray]:
    iou = box_iou(pred_boxes, target_boxes)
    if mask is None:
        mask = jnp.ones(iou.shape, bool)
    return {"iou_sum": jnp.sum(jnp.where(mask, iou, 0.0)), "iou_count": jnp.sum(mask)}


class MetricAccumulator:
    """Host-side sum accumulator for count-style metric dicts."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}

    def update(self, metrics: Dict[str, jnp.ndarray]) -> None:
        for key, value in metrics.items():
            self.totals[key] = self.totals.get(key, 0.0) + float(value)

    def ratio(self, num: str, den: str) -> float:
        d = self.totals.get(den, 0.0)
        return self.totals.get(num, 0.0) / d if d else 0.0

    def mean(self, key: str, count_key: str = "batches") -> float:
        return self.ratio(key, count_key)
