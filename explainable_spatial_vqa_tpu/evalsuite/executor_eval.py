"""Executor step evaluation: per-function box P/R @ IoU 0.5 and token
accuracy (thesis Tables 4.3 / 4.4).

Runs a trained ProgramExecutor over executor step records (teacher-forced
inputs, as the thesis per-step evaluation does) in jitted batches, then
tallies detections per function on host.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from explainable_spatial_vqa_tpu.evalsuite.detection import (
    DetectionTally,
    box_iou_matrix,
    calibrate_conf_threshold,
)

__all__ = [
    "evaluate_executor_steps",
    "tally_predicted_chains",
    "calibrate_chain_conf_threshold",
]


def evaluate_executor_steps(
    model: Any,
    variables: Any,
    batches: Iterable[Dict[str, np.ndarray]],
    function_names: Mapping[int, str],
    conf_threshold: float = 0.5,
    iou_threshold: float = 0.5,
) -> DetectionTally:
    """``batches`` yield executor_step_arrays-format dicts plus ``image``.

    function_names maps function-vocab ids -> fused token text (e.g.
    'filter_size[large]'); the tally keys on the base function name.
    """
    forward = jax.jit(
        lambda image, boxes, box_mask, text, text_mask: model.apply(
            variables, image, boxes, box_mask, text, text_mask
        )
    )
    tally = DetectionTally(iou_threshold=iou_threshold)
    for batch in batches:
        out = forward(
            jnp.asarray(batch["image"]),
            jnp.asarray(batch["input_boxes"]),
            jnp.asarray(batch["input_box_mask"]),
            jnp.asarray(batch["text"]),
            jnp.asarray(batch["text_mask"]),
        )
        pred_boxes = np.asarray(out["pred_boxes"])
        pred_conf = np.asarray(out["pred_conf"])
        token_pred = np.argmax(np.asarray(out["token_logits"]), axis=-1)
        for i in range(len(pred_boxes)):
            function = function_names.get(int(batch["text"][i][0]), "unknown")
            if batch["is_box_branch"][i]:
                keep = pred_conf[i] >= conf_threshold
                gt = batch["target_boxes"][i][batch["target_box_mask"][i]]
                tally.add_box_step(function, pred_boxes[i][keep], gt)
            else:
                tally.add_token_step(
                    function, int(token_pred[i]), int(batch["token_target"][i])
                )
    return tally


def _gt_step(step, function_vocab, inv_function, value_vocab):
    """(function_name, is_box, gt_boxes, gt_token_id) for one annotated step.

    Accepts raw OR vocab-converted records (same semantics as
    train.datasets.executor_step_arrays: converted functions are id digits;
    converted token outputs are ids except verbatim numerals)."""
    from explainable_spatial_vqa_tpu.clevr.executor import NON_SPATIAL_FUNCTIONS
    from explainable_spatial_vqa_tpu.core.vocab import canonicalize
    from explainable_spatial_vqa_tpu.train.datasets import parse_boxes

    function = step["function"]
    converted = False
    if function not in function_vocab and function.strip().isdigit():
        fid = int(function)
        if fid in inv_function:
            function = inv_function[fid]
            converted = True
    base = function.split("[")[0]
    is_box = base not in NON_SPATIAL_FUNCTIONS
    out_text = step["output_values"].strip()
    if is_box:
        return function, True, parse_boxes(out_text), -1
    can = canonicalize(out_text)
    if converted and base != "count" and can.isdigit():
        token_id = int(can)
    else:
        token_id = value_vocab.get(can, -1)
    return function, False, None, token_id


def tally_predicted_chains(
    run_out: Dict[str, np.ndarray],
    annotated: Any,
    function_vocab: Mapping[str, int],
    value_vocab: Mapping[str, int],
    conf_threshold: float = 0.5,
    iou_threshold: float = 0.5,
    max_steps: int = 28,
) -> DetectionTally:
    """Per-function box P/R + token accuracy on the executor's PREDICTED
    chains (thesis Table 4.3/4.4 protocol, p.28-30): the chain runner executed
    the GT program structure but every step consumed the executor's own
    predicted boxes/tokens; each step's outputs are scored against the
    symbolic executor's ground truth for that step.

    ``run_out``: ExecutorChainRunner.run output (box_cache/conf_cache/
    token_cache/token_branch) for chains built from the SAME ``annotated``
    records in order.
    """
    inv_function = {v: k for k, v in function_vocab.items()}
    tally = DetectionTally(iou_threshold=iou_threshold)
    for i, q in enumerate(annotated):
        for k, step in enumerate(q["annotated_program"][:max_steps]):
            function, is_box, gt_boxes, gt_token = _gt_step(
                step, function_vocab, inv_function, value_vocab
            )
            if is_box:
                if len(gt_boxes) == 0 and not step["output_values"].strip():
                    continue  # degenerate post-INVALID step
                conf = run_out["conf_cache"][i, k]
                keep = conf >= conf_threshold
                tally.add_box_step(function, run_out["box_cache"][i, k][keep], gt_boxes)
            else:
                if gt_token < 0:
                    continue
                # a step routed to the box branch cannot produce the token
                pred = (
                    int(run_out["token_cache"][i, k])
                    if run_out["token_branch"][i, k]
                    else -1
                )
                tally.add_token_step(function, pred, gt_token)
    return tally


def calibrate_chain_conf_threshold(
    run_out: Dict[str, np.ndarray],
    annotated: Any,
    function_vocab: Mapping[str, int],
    value_vocab: Mapping[str, int],
    iou_threshold: float = 0.5,
    max_steps: int = 28,
):
    """F1-maximizing confidence threshold over all chained box predictions.

    For every spatial step, predictions are greedily matched to unclaimed GT
    boxes in confidence order (threshold 0); the resulting (confidence,
    is-true-positive) pairs feed evalsuite.detection.calibrate_conf_threshold.
    Returns (best_threshold, best_f1)."""
    inv_function = {v: k for k, v in function_vocab.items()}
    confs = []
    tps = []
    for i, q in enumerate(annotated):
        for k, step in enumerate(q["annotated_program"][:max_steps]):
            function, is_box, gt_boxes, _ = _gt_step(
                step, function_vocab, inv_function, value_vocab
            )
            if not is_box:
                continue
            conf = run_out["conf_cache"][i, k]
            pred = run_out["box_cache"][i, k]
            order = np.argsort(-conf)
            iou = box_iou_matrix(pred[order], np.asarray(gt_boxes))
            claimed = np.zeros(len(gt_boxes), bool)
            for rank, p in enumerate(order):
                hit = False
                if len(gt_boxes):
                    avail = np.where(claimed, -1.0, iou[rank])
                    g = int(np.argmax(avail))
                    if avail[g] >= iou_threshold:
                        claimed[g] = True
                        hit = True
                confs.append(float(conf[p]))
                tps.append(hit)
    if not confs:
        return 0.5, 0.0
    return calibrate_conf_threshold(np.asarray(confs), np.asarray(tps))
