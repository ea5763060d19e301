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

from explainable_spatial_vqa_tpu.evalsuite.detection import DetectionTally

__all__ = ["evaluate_executor_steps"]


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
