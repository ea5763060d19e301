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
    "calibrate_chain_conf_thresholds_per_function",
    "build_conf_threshold_vector",
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


def tally_predicted_chains(
    run_out: Dict[str, np.ndarray],
    annotated: Any,
    function_vocab: Mapping[str, int],
    value_vocab: Mapping[str, int],
    conf_threshold: Any = 0.5,  # float or {base function -> thr} mapping
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
    records in order.  GT parsing is the training builder's
    ``_parse_question_steps`` (one source of truth for raw vs
    vocab-converted record semantics); ``valid`` there encodes exactly the
    degenerate-step skips (empty post-INVALID box steps, unresolvable
    tokens).
    """
    from explainable_spatial_vqa_tpu.train.datasets import _parse_question_steps

    # conf_threshold: scalar, or a per-function mapping {base name -> thr}
    # with the fallback under "__global__" (the output of
    # calibrate_chain_conf_thresholds_per_function)
    if isinstance(conf_threshold, Mapping):
        default = conf_threshold.get("__global__", 0.5)

        def _thr(fn: str) -> float:
            return conf_threshold.get(fn.split("[")[0], default)
    else:
        def _thr(fn: str) -> float:
            return conf_threshold

    tally = DetectionTally(iou_threshold=iou_threshold)
    for i, q in enumerate(annotated):
        parsed = _parse_question_steps(q, function_vocab, value_vocab)
        for k, p in enumerate(parsed[:max_steps]):
            if not p["valid"]:
                continue
            if p["is_box"]:
                conf = run_out["conf_cache"][i, k]
                keep = conf >= _thr(p["function"])
                tally.add_box_step(
                    p["function"], run_out["box_cache"][i, k][keep],
                    p["target_boxes"],
                )
            else:
                # a step routed to the box branch cannot produce the token
                pred = (
                    int(run_out["token_cache"][i, k])
                    if run_out["token_branch"][i, k]
                    else -1
                )
                tally.add_token_step(p["function"], pred, p["token_id"])
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
    Degenerate steps are skipped with exactly ``tally_predicted_chains``'s
    rules, so the calibrated threshold optimizes the same objective the
    tally reports.  Returns (best_threshold, best_f1)."""
    confs, tps, _fns, total_gt = _collect_chain_detections(
        run_out, annotated, function_vocab, value_vocab, iou_threshold,
        max_steps)
    if not confs:
        return 0.5, 0.0
    return calibrate_conf_threshold(
        np.asarray(confs), np.asarray(tps), total_gt=total_gt
    )


def _collect_chain_detections(
    run_out, annotated, function_vocab, value_vocab, iou_threshold, max_steps
):
    """(confidence, is-true-positive, base function) triples for every
    chained box prediction, greedily matched in confidence order at
    threshold 0 — the shared front half of both calibrators."""
    from explainable_spatial_vqa_tpu.train.datasets import _parse_question_steps

    confs = []
    tps = []
    fns = []
    total_gt = 0
    for i, q in enumerate(annotated):
        parsed = _parse_question_steps(q, function_vocab, value_vocab)
        for k, p in enumerate(parsed[:max_steps]):
            if not p["is_box"] or not p["valid"]:
                continue
            base = p["function"].split("[")[0]
            gt_boxes = p["target_boxes"]
            total_gt += len(gt_boxes)
            conf = run_out["conf_cache"][i, k]
            pred = run_out["box_cache"][i, k]
            order = np.argsort(-conf)
            iou = box_iou_matrix(pred[order], np.asarray(gt_boxes))
            claimed = np.zeros(len(gt_boxes), bool)
            for rank, j in enumerate(order):
                hit = False
                if len(gt_boxes):
                    avail = np.where(claimed, -1.0, iou[rank])
                    g = int(np.argmax(avail))
                    if avail[g] >= iou_threshold:
                        claimed[g] = True
                        hit = True
                confs.append(float(conf[j]))
                tps.append(hit)
                fns.append(base)
    return confs, tps, fns, total_gt


def calibrate_chain_conf_thresholds_per_function(
    run_out: Dict[str, np.ndarray],
    annotated: Any,
    function_vocab: Mapping[str, int],
    value_vocab: Mapping[str, int],
    iou_threshold: float = 0.5,
    max_steps: int = 28,
    min_preds: int = 50,
):
    """Per-FUNCTION F1-maximizing confidence thresholds.

    Functions differ systematically in confidence calibration: the box_roi
    flagship's global F1 threshold landed at 0.90, where same_color recall
    reads 0.073 — its true positives live below the global bar while the
    filters' live above (DEMO.md round-4 tables).  A per-function operating
    point is standard detection practice and matches how the thesis reports
    Table 4.3 (per-function P/R rows).

    Returns ({base function -> threshold, "__global__": fallback},
    {base function -> f1, "__global__": global f1}).  Functions with fewer
    than ``min_preds`` matched predictions keep the global fallback (a
    handful of boxes cannot support their own operating point)."""
    confs, tps, fns, total_gt = _collect_chain_detections(
        run_out, annotated, function_vocab, value_vocab, iou_threshold,
        max_steps)
    if not confs:
        return {"__global__": 0.5}, {"__global__": 0.0}
    confs = np.asarray(confs)
    tps = np.asarray(tps)
    fns = np.asarray(fns)
    # per-function GT totals (recall denominators) need the GT counts split
    # by function, not the matched predictions
    from explainable_spatial_vqa_tpu.train.datasets import _parse_question_steps

    gt_by_fn: Dict[str, int] = {}
    for i, q in enumerate(annotated):
        parsed = _parse_question_steps(q, function_vocab, value_vocab)
        for p in parsed[:max_steps]:
            if p["is_box"] and p["valid"]:
                base = p["function"].split("[")[0]
                gt_by_fn[base] = gt_by_fn.get(base, 0) + len(p["target_boxes"])
    g_thr, g_f1 = calibrate_conf_threshold(confs, tps, total_gt=total_gt)
    thr_map = {"__global__": float(g_thr)}
    f1_map = {"__global__": float(g_f1)}
    for fn in sorted(set(fns.tolist())):
        sel = fns == fn
        if int(sel.sum()) < min_preds:
            continue
        thr, f1 = calibrate_conf_threshold(
            confs[sel], tps[sel], total_gt=gt_by_fn.get(fn, 0))
        thr_map[fn] = float(thr)
        f1_map[fn] = float(f1)
    return thr_map, f1_map


def build_conf_threshold_vector(
    function_vocab: Mapping[str, int],
    thr_map: Mapping[str, float],
    default: float = 0.5,
) -> np.ndarray:
    """Function-vocab-id-indexed threshold vector for the chain runners'
    ``conf_thresholds`` (per-function propagation gating).  Vocab keys are
    fused tokens (e.g. 'filter_size[large]'); thresholds key on the base
    name, falling back to thr_map['__global__'] then ``default``."""
    fallback = float(thr_map.get("__global__", default))
    size = max(function_vocab.values()) + 1
    vec = np.full(size, fallback, np.float32)
    for token, idx in function_vocab.items():
        vec[idx] = float(thr_map.get(token.split("[")[0], fallback))
    return vec
