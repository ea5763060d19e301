#!/usr/bin/env python
"""Diagnostic: does ROI content injection fix attribute-at-box readout?

DEMO.md Table 4.4 shows query_color at 0.125 (= chance over 8 colors) and
query_shape at 0.279 (~= chance over 3 shapes) while query_size (geometric,
0.938) and the box-branch filters (~0.90 precision) are strong: the executor
can SEE attributes (filters read the image directly) but cannot READ the
attribute AT a dependency box — box<->patch positional binding is trained by
only ~1/24 of the corpus.  Trains the protocol executor twice on the SAME
corpus/seed — ``ExecutorConfig.box_roi`` off vs on (coverage-pooled image
content added to each input-box token; models/executor.py) — and reports
GT-fed per-function token accuracy and box P/R side by side
(evalsuite.evaluate_executor_steps; isolates step readout from chain error
propagation).

Env knobs: DIAG_SCENES (400), DIAG_QPS (8), DIAG_STEPS (4000), DIAG_SEED (7),
DIAG_DMODEL (0 = protocol default d=96), DEMO_PLATFORM (tpu), DEMO_OUT.
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DEMO_PLATFORM", "tpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from explainable_spatial_vqa_tpu.clevr import annotate as ann
from explainable_spatial_vqa_tpu.clevr import synthetic as syn
from explainable_spatial_vqa_tpu.clevr.scenes import Scene
from explainable_spatial_vqa_tpu.core import vocab as voc
from explainable_spatial_vqa_tpu.evalsuite.executor_eval import (
    evaluate_executor_steps,
)
from explainable_spatial_vqa_tpu.train import datasets as ds
from explainable_spatial_vqa_tpu.train.synthetic_protocol import (
    train_executor_synthetic,
)

logging.basicConfig(level=logging.INFO, format="%(message)s")

BEGIN = "<!-- box-roi-diag:begin -->"
END = "<!-- box-roi-diag:end -->"


def _eval_tally(model, variables, cfg, eval_ann, vocabs, features, batch=256):
    arrays = ds.executor_step_arrays(
        eval_ann, vocabs["function"], vocabs["other"],
        max_input_boxes=cfg.max_input_boxes, max_output_boxes=cfg.num_queries,
    )
    n = len(arrays["text"])
    names = {v: k for k, v in vocabs["function"].items()}

    def batches():
        for lo in range(0, n, batch):
            sl = slice(lo, min(lo + batch, n))
            out = {k: v[sl] for k, v in arrays.items()}
            out["image"] = features[arrays["image_index"][sl]]
            yield out

    return evaluate_executor_steps(model, variables, batches(), names)


def main():
    t0 = time.time()
    num_scenes = int(os.environ.get("DIAG_SCENES", "400"))
    qps = int(os.environ.get("DIAG_QPS", "8"))
    steps = int(os.environ.get("DIAG_STEPS", "4000"))
    seed = int(os.environ.get("DIAG_SEED", "7"))
    d_model = int(os.environ.get("DIAG_DMODEL", "0"))

    print(f"synthesizing corpus ({num_scenes} scenes x {qps})...")
    scenes_raw, questions = syn.synthesize_dataset(
        num_scenes, qps, seed=seed, hop_prob=0.3)
    scenes = {s["image_index"]: Scene.from_raw(s) for s in scenes_raw}
    annotated = ann.annotate_questions(questions, scenes)
    vocabs = voc.build_split_vocab(annotated)
    features = np.stack([
        syn.scene_feature_map(s).reshape(64, -1).T for s in scenes_raw
    ]).astype(np.float32)

    train_scenes = set(range(int(num_scenes * 0.8)))
    train_ann = [a for a in annotated if a["image_index"] in train_scenes]
    eval_ann = [a for a in annotated if a["image_index"] not in train_scenes]
    print(f"{len(train_ann)} train / {len(eval_ann)} eval questions")

    exe_config = None
    if d_model:
        from explainable_spatial_vqa_tpu.core.config import ExecutorConfig

    results = {}
    for roi in (False, True):
        tag = "roi" if roi else "base"
        print(f"training executor ({tag}, {steps} steps)...")
        if d_model:
            exe_config = ExecutorConfig(
                vocab_size=len(vocabs["function"]) + 1, d_model=d_model,
                num_heads=4, encoder_layers=3, box_decoder_layers=1,
                num_queries=8, num_image_tokens=196, image_feature_dim=64,
                max_input_boxes=8, token_classes=len(vocabs["other"]) + 1,
                dropout=0.0, input_box_noise=0.03, input_box_drop=0.1,
                box_roi=roi,
            )
        model, variables, cfg, loss = train_executor_synthetic(
            train_ann, vocabs, features, steps=steps, seed=seed,
            noise=0.03, drop=0.1, lr_schedule="cosine", config=exe_config,
            box_roi=roi)
        print(f"  final loss {loss:.4f}")
        results[tag] = _eval_tally(model, variables, cfg, eval_ann, vocabs,
                                   features)

    tok_fns = sorted(set(results["base"].token_accuracy())
                     | set(results["roi"].token_accuracy()))
    box_fns = sorted(set(results["base"].precision_recall())
                     | set(results["roi"].precision_recall()))
    elapsed = time.time() - t0

    lines = [
        BEGIN,
        "## Box-ROI readout diagnostic (GT-fed steps, off vs on)",
        "",
        f"`scripts/diag_box_roi.py` — {num_scenes} scenes × {qps} questions, "
        f"{steps} steps each arm (same corpus/seed={seed}, protocol "
        f"executor{f' d={d_model}/3L' if d_model else ''}, cosine lr, "
        f"grounding noise 0.03/0.1), GT-fed per-step eval on held-out "
        f"scenes, platform {os.environ.get('DEMO_PLATFORM', 'tpu')}, "
        f"{elapsed:.0f}s.",
        "",
        "### Token accuracy by function",
        "",
        "| function | base | box_roi | n |",
        "|---|---|---|---|",
    ]
    for fn in tok_fns:
        a = results["base"].token_accuracy().get(fn, float("nan"))
        b = results["roi"].token_accuracy().get(fn, float("nan"))
        n = results["base"].token_total.get(fn, 0)
        lines.append(f"| {fn} | {a:.3f} | {b:.3f} | {n} |")
    lines += [
        "",
        "### Box P/R @ IoU 0.5 (conf 0.5, uncalibrated)",
        "",
        "| function | base P | base R | roi P | roi R | gt boxes |",
        "|---|---|---|---|---|---|",
    ]
    for fn in box_fns:
        a = results["base"].precision_recall().get(
            fn, {"precision": float("nan"), "recall": float("nan")})
        b = results["roi"].precision_recall().get(
            fn, {"precision": float("nan"), "recall": float("nan")})
        n = results["base"].box_gt.get(fn, 0)
        lines.append(
            f"| {fn} | {a['precision']:.3f} | {a['recall']:.3f} "
            f"| {b['precision']:.3f} | {b['recall']:.3f} | {n} |")
    lines.append(END)
    section = "\n".join(lines)

    from demo_common import splice_section

    demo_path = splice_section(section, BEGIN, END)
    print(f"wrote section to {demo_path}")
    print(section)


if __name__ == "__main__":
    main()
