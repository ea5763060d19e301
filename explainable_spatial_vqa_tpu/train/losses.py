"""Loss functions.

- ``cross_entropy``: token CE with optional ignore-index masking (parity with
  the reference's ``nn.CrossEntropyLoss(ignore_index=0)``,
  train_transformer_full_annotation_new.py:241).
- ``executor_set_loss``: the thesis executor objective (§3.4.2 pp.20-22):
  routing CE (weight 0.1) + for box-branch samples a Hungarian-matched
  L1+GIoU regression with confidence BCE (weight 5.0) + for token-branch
  samples a value-token CE (weight 1.0).  Matching cost
  ``l1_w*L1 + giou_w*(1-GIoU) - conf_w*log(s)`` with assignments computed
  exactly on device (in-jit Jonker-Volgenant, the default), exactly on host
  (scipy callback, legacy), or via on-device Sinkhorn relaxation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
from explainable_spatial_vqa_tpu.ops.matching import (
    box_giou,
    hungarian_assignment,
    hungarian_assignment_jax,
    pairwise_giou,
    pairwise_l1,
    sinkhorn_assignment,
)

__all__ = ["cross_entropy", "binary_cross_entropy", "executor_set_loss",
           "smooth_l1", "masked_box_regression_loss", "perturb_input_boxes"]


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: Optional[int] = None,
    label_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean token-level CE over non-ignored positions.

    logits: (..., V); targets: (...) int.  Averages over positions where
    ``targets != ignore_index`` (matching torch semantics)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    if label_weights is None:
        label_weights = jnp.ones_like(nll)
    if ignore_index is not None:
        label_weights = label_weights * (targets != ignore_index)
    total = jnp.sum(label_weights)
    return jnp.sum(nll * label_weights) / jnp.maximum(total, 1.0)


def binary_cross_entropy(probs: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    probs = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    return -(targets * jnp.log(probs) + (1.0 - targets) * jnp.log(1.0 - probs))


def executor_set_loss(
    outputs: Dict[str, jnp.ndarray],
    target_boxes: jnp.ndarray,
    target_box_mask: jnp.ndarray,
    token_targets: jnp.ndarray,
    is_box_branch: jnp.ndarray,
    config: ExecutorConfig,
    sample_weight: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full executor objective.

    outputs: ProgramExecutor output dict; target_boxes (B, T, 4);
    target_box_mask (B, T) bool (valid targets contiguous from slot 0);
    token_targets (B,) int; is_box_branch (B,) bool.
    ``sample_weight`` (B,) optionally down-weights/masks rows (e.g. inactive
    chain positions in scheduled-sampling training); None = all ones.
    Returns dict with 'loss' plus components.
    """
    pred_boxes = outputs["pred_boxes"].astype(jnp.float32)  # (B, Q, 4)
    pred_conf = outputs["pred_conf"].astype(jnp.float32)  # (B, Q)

    # --- matching cost (stop-grad; assignments are constants as in DETR) ---
    cost = (
        config.cost_l1 * pairwise_l1(pred_boxes, target_boxes)
        + config.cost_giou * (1.0 - pairwise_giou(pred_boxes, target_boxes))
        - config.cost_conf * jnp.log(jnp.clip(pred_conf, 1e-7, 1.0))[..., None]
    )
    cost = jax.lax.stop_gradient(cost)
    matcher = config.matcher
    if matcher == "auto":
        # exact Hungarian fully in-jit: works on every backend (no host
        # callback) and closes the Sinkhorn accuracy gap on TPU
        matcher = "hungarian_jax"
    if matcher == "hungarian_jax":
        assign = hungarian_assignment_jax(cost, target_box_mask)  # (B, Q), -1 = unmatched
    elif matcher == "hungarian":
        assign = hungarian_assignment(cost, target_box_mask)  # host callback (legacy)
    else:
        assign = sinkhorn_assignment(
            cost, target_box_mask,
            n_iters=config.sinkhorn_iters, tau=config.sinkhorn_tau,
        )
        # every query gets a "match"; mark queries beyond the target count
        # unmatched by confidence target only when targets exist at the slot
        valid_at = jnp.take_along_axis(target_box_mask, jnp.clip(assign, 0, None), axis=-1)
        assign = jnp.where(valid_at, assign, -1)

    matched = assign >= 0  # (B, Q)
    safe_assign = jnp.clip(assign, 0, None)
    matched_targets = jnp.take_along_axis(
        target_boxes, safe_assign[..., None], axis=1
    )  # (B, Q, 4)

    l1 = jnp.sum(jnp.abs(pred_boxes - matched_targets), axis=-1)  # (B, Q)
    giou = box_giou(pred_boxes, matched_targets)  # (B, Q)
    reg = jnp.where(matched, l1 + (1.0 - giou), 0.0)

    weight = (
        jnp.ones(is_box_branch.shape, jnp.float32)
        if sample_weight is None else sample_weight.astype(jnp.float32)
    )
    box_sample = is_box_branch.astype(jnp.float32) * weight  # (B,)
    num_matched = jnp.sum(jnp.where(matched, 1.0, 0.0) * box_sample[:, None])
    box_reg_loss = jnp.sum(reg * box_sample[:, None]) / jnp.maximum(num_matched, 1.0)

    conf_bce = binary_cross_entropy(pred_conf, matched.astype(jnp.float32))  # (B, Q)
    num_box_queries = jnp.maximum(jnp.sum(box_sample) * pred_conf.shape[1], 1.0)
    conf_loss = jnp.sum(conf_bce * box_sample[:, None]) / num_box_queries

    box_loss = box_reg_loss + conf_loss

    # --- token branch ---
    tok_sample = (1.0 - is_box_branch.astype(jnp.float32)) * weight
    token_loss = cross_entropy(
        outputs["token_logits"], token_targets, label_weights=tok_sample
    )

    # --- routing (0 = box branch, 1 = token branch) ---
    routing_targets = (1 - is_box_branch.astype(jnp.int32))
    routing_loss = cross_entropy(
        outputs["routing_logits"], routing_targets, label_weights=weight
    )

    total = (
        config.routing_weight * routing_loss
        + config.bbox_weight * box_loss
        + config.token_weight * token_loss
    )
    return {
        "loss": total,
        "routing_loss": routing_loss,
        "box_loss": box_loss,
        "box_reg_loss": box_reg_loss,
        "conf_loss": conf_loss,
        "token_loss": token_loss,
        "assignment": assign,
    }


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber/SmoothL1 (torch convention; used by the iqap_bb
    variant's masked box regression, train_transformer_iqap_bb.py:104-125)."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def masked_box_regression_loss(
    pred_boxes: jnp.ndarray,  # (B, S, 4)
    target_boxes: jnp.ndarray,  # (B, S, 4)
    mask: jnp.ndarray,  # (B, S) bool
) -> jnp.ndarray:
    """Mean SmoothL1 over valid box slots."""
    per_box = jnp.sum(smooth_l1(pred_boxes, target_boxes), axis=-1)
    valid = mask.astype(jnp.float32)
    return jnp.sum(per_box * valid) / jnp.maximum(jnp.sum(valid) * 4.0, 1.0)


def perturb_input_boxes(
    boxes: jnp.ndarray,  # (B, S, 4)
    mask: jnp.ndarray,  # (B, S) bool
    rng: jax.Array,
    noise_scale: float,
    drop_prob: float,
) -> tuple:
    """Grounding-noise augmentation for executor training.

    At chained inference the executor consumes its own imperfect box
    predictions; teacher-forced training never sees that distribution
    (exposure bias).  This jitters dependency boxes by Gaussian noise on the
    corners and randomly drops valid slots, approximating upstream error.
    """
    noise_rng, drop_rng = jax.random.split(rng)
    if noise_scale > 0.0:
        noise = noise_scale * jax.random.normal(noise_rng, boxes.shape)
        boxes = jnp.clip(boxes + noise * mask[..., None], 0.0, 1.0)
    if drop_prob > 0.0:
        keep = jax.random.bernoulli(drop_rng, 1.0 - drop_prob, mask.shape)
        mask = jnp.logical_and(mask, keep)
    return boxes, mask
