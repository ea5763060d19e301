#!/usr/bin/env python
"""Diagnostic: does the input-box-count embedding fix count/exist readout?

DEMO.md Table 4.4 has count as the weakest token function (0.504-0.593 on
predicted chains; 0.445-0.558 answer accuracy) while the chains feeding it
are mostly right — counting set members through attention pooling is the
bottleneck, not the boxes.  ``ExecutorConfig.count_embed`` gives CLS the
input-set size directly (GT set size in training, thresholded confident
boxes at inference).  Trains the protocol executor twice on the SAME
corpus/seed — box_roi vs box_roi+count_embed — and reports GT-fed
per-function token accuracy and box P/R side by side (the same harness as
scripts/diag_box_roi.py; GT-fed isolates step readout from chain error
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
from explainable_spatial_vqa_tpu.train.synthetic_protocol import (
    train_executor_synthetic,
)

from diag_box_roi import _eval_tally

logging.basicConfig(level=logging.INFO, format="%(message)s")

BEGIN = "<!-- count-embed-diag:begin -->"
END = "<!-- count-embed-diag:end -->"


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

    results = {}
    for cnt in (False, True):
        tag = "count" if cnt else "base"
        print(f"training executor ({tag}, {steps} steps)...")
        exe_config = None
        if d_model:
            from explainable_spatial_vqa_tpu.core.config import ExecutorConfig

            exe_config = ExecutorConfig(
                vocab_size=len(vocabs["function"]) + 1, d_model=d_model,
                num_heads=4, encoder_layers=3, box_decoder_layers=1,
                num_queries=8, num_image_tokens=196, image_feature_dim=64,
                max_input_boxes=8, token_classes=len(vocabs["other"]) + 1,
                dropout=0.0, input_box_noise=0.03, input_box_drop=0.1,
                box_roi=True, count_embed=cnt,
            )
        model, variables, cfg, loss = train_executor_synthetic(
            train_ann, vocabs, features, steps=steps, seed=seed,
            noise=0.03, drop=0.1, lr_schedule="cosine", config=exe_config,
            box_roi=True, count_embed=cnt)
        print(f"  final loss {loss:.4f}")
        results[tag] = _eval_tally(model, variables, cfg, eval_ann, vocabs,
                                   features)

    tok_fns = sorted(set(results["base"].token_accuracy())
                     | set(results["count"].token_accuracy()))
    box_fns = sorted(set(results["base"].precision_recall())
                     | set(results["count"].precision_recall()))
    elapsed = time.time() - t0

    lines = [
        BEGIN,
        "## Count-embedding readout diagnostic (GT-fed steps, off vs on; "
        "both arms box_roi)",
        "",
        f"`scripts/diag_count_embed.py` — {num_scenes} scenes × {qps} "
        f"questions, {steps} steps each arm (same corpus/seed={seed}, "
        f"protocol executor{f' d={d_model}/3L' if d_model else ''} + "
        f"box_roi, cosine lr, grounding noise 0.03/0.1), GT-fed per-step "
        f"eval on held-out scenes, platform "
        f"{os.environ.get('DEMO_PLATFORM', 'tpu')}, {elapsed:.0f}s.",
        "",
        "### Token accuracy by function",
        "",
        "| function | box_roi | + count_embed | n |",
        "|---|---|---|---|",
    ]
    for fn in tok_fns:
        a = results["base"].token_accuracy().get(fn, float("nan"))
        b = results["count"].token_accuracy().get(fn, float("nan"))
        n = results["base"].token_total.get(fn, 0)
        lines.append(f"| {fn} | {a:.3f} | {b:.3f} | {n} |")
    lines += [
        "",
        "### Box P/R @ IoU 0.5 (conf 0.5, uncalibrated)",
        "",
        "| function | base P | base R | cnt P | cnt R | gt boxes |",
        "|---|---|---|---|---|---|",
    ]
    for fn in box_fns:
        a = results["base"].precision_recall().get(
            fn, {"precision": float("nan"), "recall": float("nan")})
        b = results["count"].precision_recall().get(
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
