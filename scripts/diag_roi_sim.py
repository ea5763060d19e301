#!/usr/bin/env python
"""Diagnostic: does the content-similarity channel fix same_*/relate recall?

DEMO.md Table 4.3 (round-4 flagship, relational corpus): same_color box P/R
0.467/0.100 and same_shape 0.420/0.167 are the only rows far below thesis
shape (0.70/0.75 and 0.85/0.82, Table 4.3 p.28).  box_roi tells the model
what the dependency box CONTAINS, but same_* must then mark every OTHER
patch with matching content — a content-content matching problem positional
cross-attention learns slowly.  ``ExecutorConfig.roi_sim``
(models/executor.py) exposes that match map directly: a learned-bilinear
similarity between each input box's pooled ROI content and every image
token, injected into the image tokens through a zero-init projection.

Trains the protocol executor twice on the SAME relational corpus/seed —
box_roi alone vs box_roi + roi_sim — and reports GT-fed per-function token
accuracy and box P/R side by side (isolates step readout from chain error
propagation, same protocol as scripts/diag_box_roi.py).

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
from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
from explainable_spatial_vqa_tpu.evalsuite.executor_eval import (
    evaluate_executor_steps,
)
from explainable_spatial_vqa_tpu.train import datasets as ds
from explainable_spatial_vqa_tpu.train.synthetic_protocol import (
    train_executor_synthetic,
)

logging.basicConfig(level=logging.INFO, format="%(message)s")

BEGIN = "<!-- roi-sim-diag:begin -->"
END = "<!-- roi-sim-diag:end -->"


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
    sim_heads = int(os.environ.get("DIAG_SIM_HEADS", "1"))

    print(f"synthesizing relational corpus ({num_scenes} scenes x {qps})...")
    scenes_raw, questions = syn.synthesize_dataset(
        num_scenes, qps, seed=seed, hop_prob=1.0, chain_prob=0.8,
        max_nodes=16)
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
    for sim in (False, True):
        tag = "roi_sim" if sim else "box_roi"
        print(f"training executor ({tag}, {steps} steps)...")
        exe_config = None
        if d_model:
            exe_config = ExecutorConfig(
                vocab_size=len(vocabs["function"]) + 1, d_model=d_model,
                num_heads=4, encoder_layers=3, box_decoder_layers=1,
                num_queries=8, num_image_tokens=196, image_feature_dim=64,
                max_input_boxes=8, token_classes=len(vocabs["other"]) + 1,
                dropout=0.0, input_box_noise=0.03, input_box_drop=0.1,
                box_roi=True, roi_sim=sim, roi_sim_heads=sim_heads,
            )
        model, variables, cfg, loss = train_executor_synthetic(
            train_ann, vocabs, features, steps=steps, seed=seed,
            noise=0.03, drop=0.1, lr_schedule="cosine", config=exe_config,
            box_roi=True, roi_sim=sim,
            roi_sim_heads=sim_heads if sim else None)
        print(f"  final loss {loss:.4f}")
        results[tag] = _eval_tally(model, variables, cfg, eval_ann, vocabs,
                                   features)

    tok_fns = sorted(set(results["box_roi"].token_accuracy())
                     | set(results["roi_sim"].token_accuracy()))
    box_fns = sorted(set(results["box_roi"].precision_recall())
                     | set(results["roi_sim"].precision_recall()))
    elapsed = time.time() - t0

    lines = [
        BEGIN,
        "## Content-similarity (roi_sim) diagnostic (GT-fed steps, "
        "box_roi vs box_roi+roi_sim)",
        "",
        f"`scripts/diag_roi_sim.py` — {num_scenes} scenes × {qps} questions "
        f"on the relational corpus (hop 1.0 / chain 0.8), {steps} steps each "
        f"arm (same corpus/seed={seed}, protocol "
        f"executor{f' d={d_model}/3L' if d_model else ''}, cosine lr, "
        f"grounding noise 0.03/0.1), GT-fed per-step eval on held-out "
        f"scenes, platform {os.environ.get('DEMO_PLATFORM', 'tpu')}, "
        f"{elapsed:.0f}s.",
        "",
        "### Token accuracy by function",
        "",
        "| function | box_roi | +roi_sim | n |",
        "|---|---|---|---|",
    ]
    for fn in tok_fns:
        a = results["box_roi"].token_accuracy().get(fn, float("nan"))
        b = results["roi_sim"].token_accuracy().get(fn, float("nan"))
        n = results["box_roi"].token_total.get(fn, 0)
        lines.append(f"| {fn} | {a:.3f} | {b:.3f} | {n} |")
    lines += [
        "",
        "### Box P/R @ IoU 0.5 (conf 0.5, uncalibrated)",
        "",
        "| function | roi P | roi R | +sim P | +sim R | gt boxes |",
        "|---|---|---|---|---|---|",
    ]
    for fn in box_fns:
        a = results["box_roi"].precision_recall().get(
            fn, {"precision": float("nan"), "recall": float("nan")})
        b = results["roi_sim"].precision_recall().get(
            fn, {"precision": float("nan"), "recall": float("nan")})
        n = results["box_roi"].box_gt.get(fn, 0)
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
