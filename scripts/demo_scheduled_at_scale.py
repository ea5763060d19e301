#!/usr/bin/env python
"""Scheduled sampling composed with the flagship recipe, multi-seed.

VERDICT r3 #6: the +0.040 scheduled-from-scratch win (5/5 seeds,
demo_scheduled_stats.py) was measured at small scale (160 scenes / 2000
steps / d=96).  This script asks whether it survives when composed with the
headline accuracy recipe — d_model 192 / 3L encoder / cosine lr / grounding
noise / box_roi — on the scene-aware relational corpus.  Two regimes per
seed (paired: shared corpus, generator, and eval set):

  (a) grounding noise only        — the flagship recipe as shipped,
  (b) + scheduled sampling        — same config with chain-level scheduled
                                    sampling from scratch (p_max, ramp 50%).

Appends/refreshes the '## Scheduled sampling at scale' DEMO.md section.
Env knobs: DEMO_PLATFORM (tpu), DEMO_SEEDS (3), DEMO_SCENES (700),
DEMO_EXE_STEPS (12000), DEMO_GEN_STEPS (2000), DEMO_EVAL_SCENES (150),
DEMO_P (0.3), DEMO_NOISE (0.03), DEMO_DROP (0.1), DEMO_DMODEL (192),
DEMO_LAYERS (3), DEMO_BOX_ROI (1), DEMO_CKPT, DEMO_OUT.
"""

import json
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
from explainable_spatial_vqa_tpu.train.synthetic_protocol import (
    evaluate_pipeline_synthetic,
    train_executor_scheduled_synthetic,
    train_executor_synthetic,
    train_generator_synthetic,
)

logging.basicConfig(level=logging.INFO, format="%(message)s")

BEGIN = "<!-- scheduled-at-scale:begin -->"
END = "<!-- scheduled-at-scale:end -->"


def main():
    t0 = time.time()
    seeds = list(range(int(os.environ.get("DEMO_SEEDS", "3"))))
    num_scenes = int(os.environ.get("DEMO_SCENES", "700"))
    exe_steps = int(os.environ.get("DEMO_EXE_STEPS", "12000"))
    gen_steps = int(os.environ.get("DEMO_GEN_STEPS", "2000"))
    eval_scenes_n = int(os.environ.get("DEMO_EVAL_SCENES", "150"))
    p = float(os.environ.get("DEMO_P", "0.3"))
    noise = float(os.environ.get("DEMO_NOISE", "0.03"))
    drop = float(os.environ.get("DEMO_DROP", "0.1"))
    d_model = int(os.environ.get("DEMO_DMODEL", "192"))
    layers = int(os.environ.get("DEMO_LAYERS", "3"))
    box_roi = bool(int(os.environ.get("DEMO_BOX_ROI", "1")))
    hop_prob, chain_prob, max_steps = 1.0, 0.8, 16

    # ---- ONE fixed eval set shared by every seed and regime ----
    eval_scenes_raw, eval_q = syn.synthesize_dataset(
        eval_scenes_n, 8, seed=999, hop_prob=hop_prob, chain_prob=chain_prob,
        max_nodes=max_steps)
    for s in eval_scenes_raw:
        s["image_index"] += num_scenes
    for q in eval_q:
        q["image_index"] += num_scenes
    eval_features = np.stack([
        syn.scene_feature_map(s).reshape(64, -1).T for s in eval_scenes_raw
    ]).astype(np.float32)
    print(f"fixed eval set: {len(eval_q)} questions over {eval_scenes_n} "
          f"held-out scenes")

    regimes = [
        f"flagship recipe (noise {noise}/{drop}, cosine, d={d_model}, "
        f"{layers}L{', box_roi' if box_roi else ''})",
        f"+ scheduled sampling (p_max={p}, from scratch)",
    ]
    results = {r: [] for r in regimes}

    # Default under results/ — /tmp is wiped on sandbox resets, and a lost
    # checkpoint costs hours of seed reruns (learned the hard way in r4).
    ckpt_path = os.environ.get(
        "DEMO_CKPT",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results",
            "scheduled_at_scale_ckpt.json"))
    done_seeds = 0
    params_sig = [num_scenes, exe_steps, gen_steps, eval_scenes_n, p, noise,
                  drop, d_model, layers, int(box_roi)]
    if os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            saved = json.load(f)
        if saved.get("params") == params_sig:
            results = {r: list(v) for r, v in zip(regimes, saved["scores"])}
            done_seeds = min(len(v) for v in results.values())
            print(f"resuming: {done_seeds} seeds loaded from {ckpt_path}")

    for seed in seeds:
        if seed < done_seeds:
            continue
        print(f"=== seed {seed} ===", flush=True)
        scenes_raw, questions = syn.synthesize_dataset(
            num_scenes, 6, seed=seed, hop_prob=hop_prob,
            chain_prob=chain_prob, max_nodes=max_steps)
        scenes = {s["image_index"]: Scene.from_raw(s) for s in scenes_raw}
        clevr_vocab = voc.build_clevr_vocab([questions + eval_q])
        annotated = ann.annotate_questions(questions, scenes)
        split_vocab = voc.build_split_vocab(annotated)
        features = np.concatenate([
            np.stack([syn.scene_feature_map(s).reshape(64, -1).T
                      for s in scenes_raw]).astype(np.float32),
            eval_features,
        ])
        cfg = ExecutorConfig(
            vocab_size=len(split_vocab["function"]) + 1,
            d_model=d_model, num_heads=4, encoder_layers=layers,
            box_decoder_layers=1, num_queries=8, num_image_tokens=196,
            image_feature_dim=64, max_input_boxes=8,
            token_classes=len(split_vocab["other"]) + 1, dropout=0.0,
            input_box_noise=noise, input_box_drop=drop, box_roi=box_roi,
        )

        generator, gen_vars, _gcfg, gen_loss = train_generator_synthetic(
            questions, clevr_vocab, steps=gen_steps, seed=seed,
            lr_schedule="cosine")
        print(f"  generator loss {gen_loss:.4f}", flush=True)

        def evaluate(executor, exe_vars, exe_cfg):
            _tally, acc = evaluate_pipeline_synthetic(
                generator, gen_vars, executor, exe_vars, exe_cfg,
                eval_q, features, clevr_vocab, split_vocab,
                max_steps=max_steps)
            return acc["overall"]

        executor, exe_vars, exe_cfg, _ = train_executor_synthetic(
            annotated, split_vocab, features, steps=exe_steps, seed=seed,
            config=cfg, lr_schedule="cosine")
        acc = evaluate(executor, exe_vars, exe_cfg)
        results[regimes[0]].append(acc)
        print(f"  [noise] {acc:.3f}", flush=True)

        import dataclasses

        sched_cfg = dataclasses.replace(cfg, scheduled_p_max=p)
        executor, exe_vars, exe_cfg, _ = train_executor_scheduled_synthetic(
            annotated, split_vocab, features, steps=exe_steps, seed=seed,
            p_max=p, ramp_fraction=0.5, max_steps=max_steps,
            config=sched_cfg, lr_schedule="cosine")
        acc = evaluate(executor, exe_vars, exe_cfg)
        results[regimes[1]].append(acc)
        print(f"  [noise+sched] {acc:.3f}", flush=True)

        with open(ckpt_path, "w") as f:
            json.dump({"params": params_sig,
                       "scores": [results[r] for r in regimes]}, f)

    base = np.asarray(results[regimes[0]])
    rows = []
    for r in regimes:
        a = np.asarray(results[r])
        d = a - base
        if r == regimes[0]:
            delta = "—"
        else:
            se = d.std(ddof=1) / np.sqrt(len(d)) if len(d) > 1 else np.nan
            t = d.mean() / se if se and se > 0 else float("nan")
            delta = (f"{d.mean():+.3f} ± {d.std(ddof=1):.3f} "
                     f"(t={t:.2f}, {int(np.sum(d > 0))}/{len(d)} seeds up)")
        per_seed = " ".join(f"{v:.3f}" for v in a)
        rows.append(f"| {r} | {a.mean():.3f} ± {a.std(ddof=1):.3f} "
                    f"| {delta} | {per_seed} |")

    elapsed = time.time() - t0
    platform = os.environ.get("DEMO_PLATFORM", "tpu")
    section = "\n".join([
        BEGIN,
        "## Scheduled sampling at scale (composed with the flagship recipe)",
        "",
        f"`scripts/demo_scheduled_at_scale.py` — {len(seeds)} seeds × 2 "
        f"regimes, {num_scenes} train scenes / {exe_steps} executor steps "
        f"per run on the scene-aware relational corpus (hop 1.0 / chain "
        f"0.8), ONE fixed {len(eval_q)}-question eval set on "
        f"{eval_scenes_n} never-trained scenes, platform {platform}, "
        f"{elapsed:.0f}s.  Paired per-seed comparison (shared corpus, "
        "generator, eval).",
        "",
        "| training regime | overall (mean ± std) | Δ vs noise-only "
        "(paired) | per-seed |",
        "|---|---|---|---|",
        *rows,
        END,
    ])

    from demo_common import splice_section

    demo_path = splice_section(section, BEGIN, END)
    print(f"wrote section to {demo_path}")
    print(section)


if __name__ == "__main__":
    main()
