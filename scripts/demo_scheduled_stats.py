#!/usr/bin/env python
"""Multi-seed scheduled-sampling ablation with paired statistics.

VERDICT r2 #3: the single-seed ablation (demo_scheduled_sampling.py) had no
statistical power — the TF control itself swung 0.359-0.458 on a
192-question eval.  This script runs >=5 seeds per regime against ONE fixed
1000-question held-out eval set and reports mean±std plus PAIRED per-seed
differences vs the teacher-forced control (each seed shares its corpus,
generator, and init across regimes, so the difference isolates the training
regime).

Regimes: (a) teacher-forced (reference protocol), (b) grounding-noise
augmentation, (c) chain-level scheduled sampling from scratch, (d) TF-first
then scheduled fine-tune (curriculum).

Appends/refreshes the '## Scheduled sampling' DEMO.md section (idempotent
markers).  Env knobs: DEMO_PLATFORM (default tpu), DEMO_SEEDS, DEMO_SCENES,
DEMO_EXE_STEPS, DEMO_EVAL_SCENES, DEMO_EVAL_QPS, DEMO_P, DEMO_NOISE,
DEMO_DROP, DEMO_OUT.
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
from explainable_spatial_vqa_tpu.train.synthetic_protocol import (
    evaluate_pipeline_synthetic,
    train_executor_scheduled_synthetic,
    train_executor_synthetic,
    train_generator_synthetic,
)

logging.basicConfig(level=logging.INFO, format="%(message)s")

BEGIN = "<!-- scheduled-sampling:begin -->"
END = "<!-- scheduled-sampling:end -->"


def main():
    t0 = time.time()
    seeds = list(range(int(os.environ.get("DEMO_SEEDS", "5"))))
    num_scenes = int(os.environ.get("DEMO_SCENES", "160"))
    exe_steps = int(os.environ.get("DEMO_EXE_STEPS", "2000"))
    gen_steps = int(os.environ.get("DEMO_GEN_STEPS", "400"))
    eval_scenes_n = int(os.environ.get("DEMO_EVAL_SCENES", "100"))
    eval_qps = int(os.environ.get("DEMO_EVAL_QPS", "10"))
    p = float(os.environ.get("DEMO_P", "0.3"))
    noise = float(os.environ.get("DEMO_NOISE", "0.05"))
    drop = float(os.environ.get("DEMO_DROP", "0.15"))
    ft_frac = float(os.environ.get("DEMO_FT_FRAC", "0.2"))

    # ---- ONE fixed eval set shared by every seed and regime ----
    eval_scenes_raw, eval_q = syn.synthesize_dataset(
        eval_scenes_n, eval_qps, seed=999)
    for s in eval_scenes_raw:  # shift to image indices above every train set
        s["image_index"] += num_scenes
    for q in eval_q:
        q["image_index"] += num_scenes
    eval_features = np.stack([
        syn.scene_feature_map(s).reshape(64, -1).T for s in eval_scenes_raw
    ]).astype(np.float32)
    print(f"fixed eval set: {len(eval_q)} questions over {eval_scenes_n} "
          f"held-out scenes")

    regimes = [
        "teacher-forced (reference protocol)",
        f"grounding noise ({noise}/{drop})",
        f"scheduled sampling (p_max={p}, from scratch)",
        f"TF then scheduled fine-tune (last {ft_frac:.0%} @ p={p})",
    ]
    results = {r: [] for r in regimes}  # regime -> [overall per seed]

    # per-seed checkpoint: each completed seed appends its 4 regime scores,
    # so an interrupted run (each seed is ~1h of TPU time) resumes instead of
    # restarting.  Delete the file to force a fresh run.
    ckpt_path = os.environ.get("DEMO_CKPT", "/tmp/scheduled_stats_partial.json")
    done_seeds = 0
    if os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            saved = json.load(f)
        if saved.get("regimes") == regimes and saved.get("params") == [
            num_scenes, exe_steps, gen_steps, eval_scenes_n, eval_qps,
            p, noise, drop, ft_frac
        ]:
            results = {r: list(v) for r, v in zip(regimes, saved["scores"])}
            done_seeds = min(len(v) for v in results.values())
            print(f"resuming: {done_seeds} seeds loaded from {ckpt_path}")

    for seed in seeds:
        if seed < done_seeds:
            continue
        print(f"=== seed {seed} ===")
        scenes_raw, questions = syn.synthesize_dataset(num_scenes, 6, seed=seed)
        scenes = {s["image_index"]: Scene.from_raw(s) for s in scenes_raw}
        clevr_vocab = voc.build_clevr_vocab([questions + eval_q])
        annotated = ann.annotate_questions(questions, scenes)
        split_vocab = voc.build_split_vocab(annotated)
        features = np.concatenate([
            np.stack([syn.scene_feature_map(s).reshape(64, -1).T
                      for s in scenes_raw]).astype(np.float32),
            eval_features,
        ])

        generator, gen_vars, _gcfg, gen_loss = train_generator_synthetic(
            questions, clevr_vocab, steps=gen_steps, seed=seed)
        print(f"  generator loss {gen_loss:.4f}")

        def evaluate(executor, exe_vars, exe_cfg):
            _tally, acc = evaluate_pipeline_synthetic(
                generator, gen_vars, executor, exe_vars, exe_cfg,
                eval_q, features, clevr_vocab, split_vocab, max_steps=12)
            return acc["overall"]

        # (a) TF control
        executor, exe_vars, exe_cfg, _ = train_executor_synthetic(
            annotated, split_vocab, features, steps=exe_steps, seed=seed)
        acc = evaluate(executor, exe_vars, exe_cfg)
        results[regimes[0]].append(acc)
        print(f"  [tf] {acc:.3f}")

        # (b) grounding noise
        executor, exe_vars, exe_cfg, _ = train_executor_synthetic(
            annotated, split_vocab, features, steps=exe_steps, seed=seed,
            noise=noise, drop=drop)
        acc = evaluate(executor, exe_vars, exe_cfg)
        results[regimes[1]].append(acc)
        print(f"  [noise] {acc:.3f}")

        # (c) scheduled from scratch
        executor, exe_vars, exe_cfg, _ = train_executor_scheduled_synthetic(
            annotated, split_vocab, features, steps=exe_steps, seed=seed,
            p_max=p)
        acc = evaluate(executor, exe_vars, exe_cfg)
        results[regimes[2]].append(acc)
        print(f"  [sched] {acc:.3f}")

        # (d) TF warm start, scheduled fine-tune at constant p
        import dataclasses

        ft_steps = int(exe_steps * ft_frac)
        executor, exe_vars, exe_cfg, _ = train_executor_synthetic(
            annotated, split_vocab, features, steps=exe_steps - ft_steps,
            seed=seed)
        sched_cfg = dataclasses.replace(exe_cfg, scheduled_p_max=p)
        executor, exe_vars, exe_cfg, _ = train_executor_scheduled_synthetic(
            annotated, split_vocab, features, steps=ft_steps, seed=seed,
            p_max=p, ramp_fraction=0.25, config=sched_cfg,
            init_variables=exe_vars)
        acc = evaluate(executor, exe_vars, exe_cfg)
        results[regimes[3]].append(acc)
        print(f"  [tf+sched] {acc:.3f}")

        with open(ckpt_path, "w") as f:
            json.dump({
                "regimes": regimes,
                "params": [num_scenes, exe_steps, gen_steps, eval_scenes_n,
                           eval_qps, p, noise, drop, ft_frac],
                "scores": [results[r] for r in regimes],
            }, f)

    # ---- statistics ----
    tf = np.asarray(results[regimes[0]])
    rows = []
    stats = {}
    for r in regimes:
        a = np.asarray(results[r])
        d = a - tf
        mean, std = a.mean(), a.std(ddof=1)
        if r == regimes[0]:
            delta = "—"
        else:
            se = d.std(ddof=1) / np.sqrt(len(d)) if len(d) > 1 else np.nan
            t = d.mean() / se if se > 0 else np.nan
            delta = (f"{d.mean():+.3f} ± {d.std(ddof=1):.3f} "
                     f"(t={t:.2f}, {np.sum(d > 0)}/{len(d)} seeds up)")
        per_seed = " ".join(f"{v:.3f}" for v in a)
        rows.append(f"| {r} | {mean:.3f} ± {std:.3f} | {delta} | {per_seed} |")
        stats[r] = {"per_seed": a.tolist(), "mean": float(mean),
                    "std": float(std), "delta_vs_tf": d.tolist()}

    elapsed = time.time() - t0
    platform = os.environ.get("DEMO_PLATFORM", "tpu")
    n_eval = len(eval_q)
    section = "\n".join([
        BEGIN,
        "## Scheduled sampling: multi-seed paired ablation "
        "(chained accuracy, fixed held-out eval)",
        "",
        f"`scripts/demo_scheduled_stats.py` — {len(seeds)} seeds × "
        f"{len(regimes)} regimes, {num_scenes} train scenes / {exe_steps} "
        f"executor steps per run, ONE fixed {n_eval}-question eval set on "
        f"{eval_scenes_n} never-trained scenes, platform {platform}, "
        f"{elapsed:.0f}s.  Each seed shares its corpus/generator across "
        "regimes, so Δ vs TF is a paired per-seed comparison "
        "(±: sample std over seeds; t: paired mean/SE).",
        "",
        "| training regime | overall (mean ± std) | Δ vs TF (paired) "
        "| per-seed |",
        "|---|---|---|---|",
        *rows,
        END,
    ])

    from demo_common import splice_section

    demo_path = splice_section(section, BEGIN, END)
    with open("/tmp/scheduled_stats.json", "w") as f:
        json.dump(stats, f, indent=2)
    print(f"wrote section to {demo_path}")
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
