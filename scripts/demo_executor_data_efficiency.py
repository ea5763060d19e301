#!/usr/bin/env python
"""Executor data-efficiency sweep (thesis §4.2.3 / Fig 4.4b protocol).

The thesis's Fig 4.4 asymmetry: the generator saturates with a few hundred
programs (Fig 4.4a — `demo_data_efficiency.py`), but the EXECUTOR is
data-hungry — its accuracy keeps climbing over 7k/70k/700k training
questions (Fig 4.4b p.34-35).  This script reproduces the executor half:
a fixed evaluation set on held-out scenes, a fixed training recipe
(protocol executor + box_roi, grounding noise, cosine lr), and the number
of training QUESTIONS swept over ~3 decades.  Evaluation runs the chained
executor on GT program structure (generator held perfect, isolating the
executor curve exactly as the thesis does) and reports final-answer
accuracy + per-step token accuracy.

Appends/refreshes the '## Executor data efficiency' DEMO.md section.
Env knobs: DEMO_PLATFORM (default tpu), DEMO_SCENES (default 1400),
DEMO_QPS (6), DEMO_SIZES (comma list of train-question counts; default
"70,700,5600"), DEMO_EXE_STEPS (8000), DEMO_SEED (0), DEMO_BOX_ROI (1).
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
from explainable_spatial_vqa_tpu.core.vocab import canonicalize
from explainable_spatial_vqa_tpu.evalsuite.accuracy import answer_accuracy_by_type
from explainable_spatial_vqa_tpu.evalsuite.executor_eval import tally_predicted_chains
from explainable_spatial_vqa_tpu.infer.chain import ChainArrays, ExecutorChainRunner
from explainable_spatial_vqa_tpu.train.datasets import (
    _parse_question_steps,
    executor_chain_step_arrays,
)
from explainable_spatial_vqa_tpu.train.synthetic_protocol import (
    train_executor_synthetic,
)

logging.basicConfig(level=logging.INFO, format="%(message)s")

BEGIN = "<!-- executor-data-efficiency:begin -->"
END = "<!-- executor-data-efficiency:end -->"


def main():
    t0 = time.time()
    num_scenes = int(os.environ.get("DEMO_SCENES", "1400"))
    qps = int(os.environ.get("DEMO_QPS", "6"))
    sizes = [int(s) for s in
             os.environ.get("DEMO_SIZES", "70,700,5600").split(",")]
    exe_steps = int(os.environ.get("DEMO_EXE_STEPS", "8000"))
    seed = int(os.environ.get("DEMO_SEED", "0"))
    box_roi = bool(int(os.environ.get("DEMO_BOX_ROI", "1")))
    hop_prob, chain_prob, max_steps = 1.0, 0.8, 16

    print(f"synthesizing corpus ({num_scenes} scenes x {qps})...")
    scenes_raw, questions = syn.synthesize_dataset(
        num_scenes, qps, seed=seed, hop_prob=hop_prob,
        chain_prob=chain_prob, max_nodes=max_steps)
    scenes = {s["image_index"]: Scene.from_raw(s) for s in scenes_raw}
    annotated = ann.annotate_questions(questions, scenes)
    split_vocab = voc.build_split_vocab(annotated)
    features = np.stack([
        syn.scene_feature_map(s).reshape(64, -1).T for s in scenes_raw
    ]).astype(np.float32)

    # fixed held-out eval set (last 20% of scenes), fixed across sizes
    train_scenes = set(range(int(num_scenes * 0.8)))
    train_ann_pool = [a for a in annotated if a["image_index"] in train_scenes]
    eval_ann = [a for a in annotated if a["image_index"] not in train_scenes]
    eval_q = [q for q in questions if q["image_index"] not in train_scenes]
    eval_ann = [a for a in eval_ann
                if 0 < len(_parse_question_steps(
                    a, split_vocab["function"], split_vocab["other"]))
                <= max_steps]
    keep_keys = {(a["image_index"], a["question_index"]) for a in eval_ann}
    eval_q = [q for q in eval_q
              if (q["image_index"], q["question_index"]) in keep_keys]
    arrays = executor_chain_step_arrays(
        eval_ann, split_vocab["function"], split_vocab["other"],
        max_steps=max_steps, max_output_boxes=8)
    chains = ChainArrays(
        image_index=arrays["image_index"], functions=arrays["functions"],
        deps=arrays["deps"], num_steps=arrays["num_steps"], answers=[])
    gt_value_ids = np.asarray([
        split_vocab["other"].get(canonicalize(a["answer"]), -2)
        for a in eval_ann
    ])
    final_functions = [q["program"][-1]["function"] for q in eval_q]

    from demo_common import splice_section

    # Per-point resume file: a killed sweep (session end / sandbox reset)
    # leaves completed points here; the next launch skips them and still
    # splices a COMBINED table. Lives under results/ (committed by the
    # driver), never /tmp (wiped on resets).
    rows_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", f"dataeff_rows_{exe_steps}.json")

    # Protocol signature stored with the rows: a resume under different
    # corpus/recipe knobs must NOT silently merge into the same table
    # (same guard demo_scheduled_at_scale.py uses).
    params_sig = {
        "scenes": num_scenes, "qps": qps, "seed": seed, "box_roi": box_roi,
        "hop_prob": hop_prob, "chain_prob": chain_prob,
        "max_steps": max_steps, "exe_steps": exe_steps,
    }

    def load_rows():
        if not os.path.exists(rows_path):
            return []
        with open(rows_path) as f:
            data = json.load(f)
        if isinstance(data, list):  # legacy pre-signature format
            print(f"WARNING: {rows_path} has no params signature "
                  f"(legacy format) — assuming current protocol")
            raw = data
        else:
            if data["sig"] != params_sig:
                raise SystemExit(
                    f"refusing to resume: {rows_path} was written under a "
                    f"different protocol\n  stored:  {data['sig']}\n"
                    f"  current: {params_sig}\n"
                    f"Move/delete the file to start a fresh sweep.")
            raw = data["rows"]
        return [(int(n), acc, float(tok), float(loss))
                for n, acc, tok, loss in raw]

    def save_rows(rows):
        os.makedirs(os.path.dirname(rows_path), exist_ok=True)
        with open(rows_path, "w") as f:
            json.dump({"sig": params_sig, "rows": rows}, f)

    def write_section(rows, partial):
        # Splice after EVERY point so a partial sweep is still harvested
        # if the session dies mid-run; rows render in ascending-n order
        # regardless of the sweep execution order.
        elapsed = time.time() - t0
        platform = os.environ.get("DEMO_PLATFORM", "tpu")
        type_keys = ["overall"] + sorted(
            {k for _, acc, _, _ in rows for k in acc if k != "overall"})
        done = clamped_sizes & {n for n, *_ in rows}
        note = (f"  PARTIAL — {len(done)}/{len(clamped_sizes)} points "
                f"done, sweep in progress." if partial else "")
        lines = [
            BEGIN,
            "## Executor data efficiency (thesis §4.2.3 / Fig 4.4b "
            "protocol)",
            "",
            f"`scripts/demo_executor_data_efficiency.py` — executor "
            f"trained on N questions (fixed {exe_steps}-step recipe, "
            f"cosine lr, grounding noise 0.03/0.1"
            f"{', box_roi' if box_roi else ''}), evaluated on a FIXED "
            f"{len(eval_ann)}-question held-out-scene set with GT program "
            f"structure (generator held perfect — the executor curve in "
            f"isolation, as Fig 4.4b).  Platform {platform}, "
            f"{elapsed:.0f}s.{note}",
            "",
            "| train questions | " + " | ".join(type_keys) +
            " | step-token acc | final train loss |",
            "|---|" + "---|" * (len(type_keys) + 2),
        ]
        for n_train, acc, tok_overall, loss in sorted(rows):
            lines.append(
                f"| {n_train} | "
                + " | ".join(f"{acc.get(k, float('nan')):.3f}"
                             for k in type_keys)
                + f" | {tok_overall:.3f} | {loss:.2f} |")
        lines += ["", END]
        section = "\n".join(lines)
        demo_path = splice_section(section, BEGIN, END)
        print(f"wrote section to {demo_path}")
        print(section, flush=True)

    # The pending set is computed over CLAMPED requested sizes so that (a)
    # a resume with a narrower DEMO_SIZES never labels an incomplete sweep
    # complete, and (b) two sizes clamping to the same pool size can't
    # leave the table marked PARTIAL forever.
    clamped_sizes = {min(s, len(train_ann_pool)) for s in sizes}

    rows = load_rows()
    if rows:
        print(f"resuming: {sorted(n for n, *_ in rows)} already done "
              f"({rows_path}; delete it to force a full rerun)")
    ran_any = False
    for n_train in sorted(clamped_sizes, reverse=True):
        if any(n == n_train for n, *_ in rows):
            continue
        # Per-size RNG: the training subset for a given N is identical no
        # matter what order the sweep runs in (lets us run largest-first).
        rng = np.random.RandomState(seed + 1 + n_train)
        pick = rng.choice(len(train_ann_pool), n_train, replace=False)
        subset = [train_ann_pool[i] for i in sorted(pick)]
        print(f"training executor on {n_train} questions "
              f"({exe_steps} steps, box_roi={box_roi})...", flush=True)
        executor, exe_vars, exe_cfg, loss = train_executor_synthetic(
            subset, split_vocab, features, steps=exe_steps, seed=seed,
            noise=0.03, drop=0.1, lr_schedule="cosine", box_roi=box_roi)
        runner = ExecutorChainRunner(executor, exe_vars, exe_cfg,
                                     max_steps=max_steps)
        out = runner.run_sorted(features[chains.image_index], chains,
                                batch=128)
        pred = np.where(out["final_is_token"],
                        out["final_tokens"], -1)
        acc = answer_accuracy_by_type(pred, gt_value_ids, final_functions)
        det = tally_predicted_chains(
            out, eval_ann, split_vocab["function"], split_vocab["other"],
            conf_threshold=0.5, max_steps=max_steps)
        tok_overall = (
            sum(det.token_correct.values()) /
            max(1, sum(det.token_total.values())))
        rows.append((n_train, acc, tok_overall, float(loss)))
        print(f"  answer acc {acc['overall']:.3f}, "
              f"step-token acc {tok_overall:.3f}, final loss {loss:.4f}",
              flush=True)
        ran_any = True
        save_rows(rows)
        write_section(
            rows, partial=bool(clamped_sizes - {n for n, *_ in rows}))
    if not ran_any:
        print("all requested points already complete — nothing to do")


if __name__ == "__main__":
    main()
