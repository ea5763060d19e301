#!/usr/bin/env python
"""Thesis-shaped accuracy + per-function P/R tables on synthetic data.

One run produces every table format the thesis reports (VERDICT r2 #4/#7):

- Table 4.2: answer accuracy by question type (full generate->parse->chain
  pipeline on held-out scenes),
- Table 4.3/4.4: per-function box P/R @ IoU 0.5 + token accuracy on the
  executor's PREDICTED chains (GT program structure, model's own dependency
  outputs), with F1-max confidence calibration,
- Table 4.5: faithfulness quadrants,
- program EM from the generator.

Appends/refreshes the '## Accuracy tables' DEMO.md section (idempotent
markers).  Env knobs: DEMO_PLATFORM (default tpu), DEMO_SCENES, DEMO_QPS,
DEMO_HOP_PROB, DEMO_GEN_STEPS, DEMO_EXE_STEPS, DEMO_NOISE, DEMO_DROP,
DEMO_SEED, DEMO_OUT.
"""

import logging
import os
import pickle
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
from explainable_spatial_vqa_tpu.core.artifacts import encode_questions
from explainable_spatial_vqa_tpu.core.vocab import canonicalize, invert_vocab
from explainable_spatial_vqa_tpu.evalsuite.executor_eval import (
    calibrate_chain_conf_threshold,
    tally_predicted_chains,
)
from explainable_spatial_vqa_tpu.evalsuite.accuracy import answer_accuracy_by_type
from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner
from explainable_spatial_vqa_tpu.infer.pipeline import InferencePipeline
from explainable_spatial_vqa_tpu.train.datasets import executor_chain_step_arrays
from explainable_spatial_vqa_tpu.train.synthetic_protocol import (
    train_executor_synthetic,
    train_generator_synthetic,
)

logging.basicConfig(level=logging.INFO, format="%(message)s")

BEGIN = "<!-- accuracy-tables:begin -->"
END = "<!-- accuracy-tables:end -->"


def _ckpt_path() -> str:
    """Per-run params checkpoint under results/ (NEVER /tmp — CLAUDE.md),
    keyed by the DEMO_OUT basename so concurrent protocols don't collide."""
    out = os.environ.get("DEMO_OUT", "")
    tag = os.path.splitext(os.path.basename(out))[0] if out else "default"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, "results", f"acc_ckpt_{tag}.pkl")


def _load_ckpt(path: str, sig: dict) -> dict:
    """Load the trained-params checkpoint if its protocol signature matches
    (mismatched knobs silently merging runs is the dataeff-sweep bug class —
    ADVICE r4 #3)."""
    if not os.path.exists(path):
        return {"sig": sig}
    try:
        with open(path, "rb") as f:
            ck = pickle.load(f)
    except Exception as e:  # truncated file from a mid-write kill
        print(f"checkpoint {path} unreadable ({e}) — starting fresh")
        return {"sig": sig}
    if ck.get("sig") != sig:
        print(f"checkpoint {path} protocol-signature mismatch — ignoring")
        return {"sig": sig}
    return ck


def _save_ckpt(path: str, ck: dict) -> None:
    import jax as _jax

    os.makedirs(os.path.dirname(path), exist_ok=True)
    ck = {k: (_jax.tree_util.tree_map(lambda a: np.asarray(a), v)
              if isinstance(v, dict) and "vars" in v else v)
          for k, v in ck.items()}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(ck, f)
    os.replace(tmp, path)  # atomic — a mid-write kill can't corrupt


def main():
    t0 = time.time()
    num_scenes = int(os.environ.get("DEMO_SCENES", "800"))
    qps = int(os.environ.get("DEMO_QPS", "6"))
    # hop 1.0 / chain 0.8 put relate+same_* at ~15% of steps (scene-aware
    # sampling, VERDICT r3 #2); the legacy r3 corpus was hop 0.3 / chain 0
    hop_prob = float(os.environ.get("DEMO_HOP_PROB", "1.0"))
    chain_prob = float(os.environ.get("DEMO_CHAIN_PROB", "0.8"))
    palette = int(os.environ.get("DEMO_PALETTE", "4"))  # 8 = legacy colors
    gen_steps = int(os.environ.get("DEMO_GEN_STEPS", "1000"))
    exe_steps = int(os.environ.get("DEMO_EXE_STEPS", "12000"))
    noise = float(os.environ.get("DEMO_NOISE", "0.03"))
    drop = float(os.environ.get("DEMO_DROP", "0.1"))
    seed = int(os.environ.get("DEMO_SEED", "3"))
    lr_schedule = os.environ.get("DEMO_LR_SCHEDULE", "constant")
    d_model = int(os.environ.get("DEMO_DMODEL", "0"))  # 0 = protocol default
    layers = int(os.environ.get("DEMO_LAYERS", "2"))  # encoder layers
    box_roi = bool(int(os.environ.get("DEMO_BOX_ROI", "1")))  # ROI content
    roi_sim = bool(int(os.environ.get("DEMO_ROI_SIM", "0")))  # sim channel
    sim_heads = int(os.environ.get("DEMO_SIM_HEADS", "1"))
    count_embed = bool(int(os.environ.get("DEMO_COUNT_EMBED", "0")))
    per_fn_conf = bool(int(os.environ.get("DEMO_PER_FN_CONF", "0")))
    # conf-threshold calibration split: "eval" (legacy: fit on the eval
    # questions themselves — 1 fitted param for the global gate, 13 for
    # per-function) or "train" (fit on held-in TRAIN-scene chains, making
    # every reported number out-of-sample — DEMO.md round-5 caveat (1))
    conf_fit = os.environ.get("DEMO_CONF_FIT", "eval")
    assert conf_fit in ("eval", "train"), conf_fit
    conf_fit_n = int(os.environ.get("DEMO_CONF_FIT_N", "1500"))
    max_steps = 16  # chained hops reach 16 nodes (max_nodes below)

    print(f"synthesizing corpus ({num_scenes} scenes x {qps}, "
          f"hop_prob={hop_prob}, chain_prob={chain_prob})...")
    scenes_raw, questions = syn.synthesize_dataset(
        num_scenes, qps, seed=seed, hop_prob=hop_prob,
        chain_prob=chain_prob, max_nodes=max_steps, palette_size=palette)
    scenes = {s["image_index"]: Scene.from_raw(s) for s in scenes_raw}
    clevr_vocab = voc.build_clevr_vocab([questions])
    annotated = ann.annotate_questions(questions, scenes)
    split_vocab = voc.build_split_vocab(annotated)
    features = np.stack([
        syn.scene_feature_map(s).reshape(64, -1).T for s in scenes_raw
    ]).astype(np.float32)

    train_scenes = set(range(int(num_scenes * 0.8)))
    train_q = [q for q in questions if q["image_index"] in train_scenes]
    train_ann = [a for a in annotated if a["image_index"] in train_scenes]
    eval_q = [q for q in questions if q["image_index"] not in train_scenes]
    eval_ann = [a for a in annotated if a["image_index"] not in train_scenes]

    # Trained params checkpoint: the round-5 roi_sim flagship trained 24k
    # steps (~48 min of TPU) then crashed in eval, losing everything — save
    # params after each training phase so eval-side failures are resumable.
    sig = dict(scenes=num_scenes, qps=qps, hop_prob=hop_prob,
               chain_prob=chain_prob, palette=palette, gen_steps=gen_steps,
               exe_steps=exe_steps, noise=noise, drop=drop, seed=seed,
               lr_schedule=lr_schedule, d_model=d_model, layers=layers,
               box_roi=box_roi, roi_sim=roi_sim, sim_heads=sim_heads,
               count_embed=count_embed)
    ckpt_path = _ckpt_path()
    ck = _load_ckpt(ckpt_path, sig)

    if "gen" in ck:
        print("resuming TRAINED generator from checkpoint (0 steps)...")
        generator, gen_vars, _gcfg, _ = train_generator_synthetic(
            train_q, clevr_vocab, steps=0, seed=seed,
            lr_schedule=lr_schedule, init_variables=ck["gen"]["vars"])
        gen_loss = float(ck["gen"]["loss"])
    else:
        print(f"training generator on {len(train_q)} questions...")
        generator, gen_vars, _gcfg, gen_loss = train_generator_synthetic(
            train_q, clevr_vocab, steps=gen_steps, seed=seed,
            lr_schedule=lr_schedule)
        ck["gen"] = {"vars": gen_vars, "loss": gen_loss}
        _save_ckpt(ckpt_path, ck)
    print(f"  final loss {gen_loss:.4f}")

    exe_config = None
    if d_model or layers != 2:
        from explainable_spatial_vqa_tpu.core.config import ExecutorConfig

        exe_config = ExecutorConfig(
            vocab_size=len(split_vocab["function"]) + 1,
            d_model=d_model or 96, num_heads=4, encoder_layers=layers,
            box_decoder_layers=1, num_queries=8, num_image_tokens=196,
            image_feature_dim=64, max_input_boxes=8,
            token_classes=len(split_vocab["other"]) + 1, dropout=0.0,
            input_box_noise=noise, input_box_drop=drop, box_roi=box_roi,
            roi_sim=roi_sim, roi_sim_heads=sim_heads,
            count_embed=count_embed,
        )
    if "exe" in ck:
        print("resuming TRAINED executor from checkpoint (0 steps)...")
        executor, exe_vars, exe_cfg, _ = train_executor_synthetic(
            train_ann, split_vocab, features, steps=0, seed=seed,
            noise=noise, drop=drop, lr_schedule=lr_schedule,
            config=exe_config, box_roi=box_roi, roi_sim=roi_sim,
            roi_sim_heads=sim_heads if roi_sim else None,
            count_embed=count_embed, init_variables=ck["exe"]["vars"])
        exe_loss = float(ck["exe"]["loss"])
    else:
        print(f"training executor on {len(train_ann)} annotated questions "
              f"({exe_steps} steps, noise={noise}, drop={drop}, "
              f"lr_schedule={lr_schedule}"
              + (f", d_model={d_model}" if d_model else "") + ")...")
        executor, exe_vars, exe_cfg, exe_loss = train_executor_synthetic(
            train_ann, split_vocab, features, steps=exe_steps, seed=seed,
            noise=noise, drop=drop, lr_schedule=lr_schedule, config=exe_config,
            box_roi=box_roi, roi_sim=roi_sim,
            roi_sim_heads=sim_heads if roi_sim else None,
            count_embed=count_embed)
        ck["exe"] = {"vars": exe_vars, "loss": exe_loss}
        _save_ckpt(ckpt_path, ck)
    print(f"  final loss {exe_loss:.4f}")

    # ---- Table 4.2 + 4.5: full pipeline on held-out scenes ----
    enc_eval = encode_questions(eval_q, clevr_vocab)
    program_inv = invert_vocab(clevr_vocab["program_token_to_idx"])
    answer_inv = invert_vocab(clevr_vocab["answer_token_to_idx"])
    runner = ExecutorChainRunner(executor, exe_vars, exe_cfg,
                                 max_steps=max_steps)
    pipeline = InferencePipeline(
        generator, gen_vars, runner, program_inv, split_vocab["function"])
    gt_value_ids = np.asarray([
        split_vocab["other"].get(canonicalize(answer_inv.get(int(a), "")), -2)
        for a in enc_eval.answers
    ])
    result = pipeline.run(
        enc_eval.questions, features, enc_eval.image_idxs,
        gt_answers=gt_value_ids, gt_programs=enc_eval.programs)
    final_functions = [q["program"][-1]["function"] for q in eval_q]
    pred = np.where(result.answer_valid, result.answers, -1)
    acc = answer_accuracy_by_type(pred, gt_value_ids, final_functions)
    print("by-type accuracy:", {k: round(v, 3) for k, v in acc.items()})

    # ---- Table 4.3/4.4: per-function P/R on PREDICTED chains ----
    # pre-filter with the builder's own skip rule so tally rows align
    from explainable_spatial_vqa_tpu.train.datasets import _parse_question_steps

    eval_ann = [a for a in eval_ann
                if 0 < len(_parse_question_steps(
                    a, split_vocab["function"], split_vocab["other"]))
                <= max_steps]
    arrays = executor_chain_step_arrays(
        eval_ann, split_vocab["function"], split_vocab["other"],
        max_steps=max_steps, max_output_boxes=exe_cfg.num_queries)
    from explainable_spatial_vqa_tpu.infer.chain import ChainArrays

    chains = ChainArrays(
        image_index=arrays["image_index"], functions=arrays["functions"],
        deps=arrays["deps"], num_steps=arrays["num_steps"], answers=[])
    img = features[arrays["image_index"]]
    run_out = runner.run_sorted(img, chains, batch=128)

    # calibration set: the eval chains themselves (legacy) or a subsample
    # of held-in TRAIN-scene chains run through the same runner (honest
    # out-of-sample operating points)
    if conf_fit == "train":
        calib_ann = [a for a in train_ann
                     if 0 < len(_parse_question_steps(
                         a, split_vocab["function"], split_vocab["other"]))
                     <= max_steps]
        if len(calib_ann) > conf_fit_n:
            rng = np.random.default_rng(seed + 1)
            idx = rng.choice(len(calib_ann), size=conf_fit_n, replace=False)
            calib_ann = [calib_ann[i] for i in sorted(idx)]
        cal_arrays = executor_chain_step_arrays(
            calib_ann, split_vocab["function"], split_vocab["other"],
            max_steps=max_steps, max_output_boxes=exe_cfg.num_queries)
        cal_chains = ChainArrays(
            image_index=cal_arrays["image_index"],
            functions=cal_arrays["functions"], deps=cal_arrays["deps"],
            num_steps=cal_arrays["num_steps"], answers=[])
        cal_img = features[cal_arrays["image_index"]]
        calib_run_out = runner.run_sorted(cal_img, cal_chains, batch=128)
        print(f"conf thresholds fit on {len(calib_ann)} TRAIN-scene chains")
    else:
        calib_ann, calib_run_out = eval_ann, run_out

    # the baseline protocol ALWAYS runs (global F1 threshold on default-
    # propagation chains), so per_fn_conf runs stay paired with runs that
    # predate the per-function mode
    thr, f1 = calibrate_chain_conf_threshold(
        calib_run_out, calib_ann, split_vocab["function"],
        split_vocab["other"], max_steps=max_steps)
    print(f"calibrated conf threshold {thr:.2f} (calib-split F1 {f1:.3f})")
    thr_label = f"{thr:.2f}" + (" train-fit" if conf_fit == "train" else "")
    det = tally_predicted_chains(
        run_out, eval_ann, split_vocab["function"], split_vocab["other"],
        conf_threshold=thr, max_steps=max_steps)

    det_pf = acc_pf = result_pf = thr_map = None
    if per_fn_conf:
        # per-FUNCTION operating points: re-run BOTH the annotated chains
        # and the answer pipeline with the per-function propagation gate
        # NOTE: ExecutorChainRunner is imported at module scope — a local
        # re-import here would make the name function-local and crash the
        # UNCONDITIONAL use above with UnboundLocalError (this killed the
        # round-5 roi_sim flagship after its full 24k-step training)
        from explainable_spatial_vqa_tpu.evalsuite.executor_eval import (
            build_conf_threshold_vector,
            calibrate_chain_conf_thresholds_per_function,
        )

        thr_map, f1_map = calibrate_chain_conf_thresholds_per_function(
            calib_run_out, calib_ann, split_vocab["function"],
            split_vocab["other"], max_steps=max_steps)
        print("per-function conf thresholds:",
              {k: round(v, 2) for k, v in sorted(thr_map.items())})
        vec = build_conf_threshold_vector(split_vocab["function"], thr_map)
        runner_pf = ExecutorChainRunner(
            executor, exe_vars, exe_cfg, max_steps=max_steps,
            conf_thresholds=vec)
        run_out_pf = runner_pf.run_sorted(img, chains, batch=128)
        det_pf = tally_predicted_chains(
            run_out_pf, eval_ann, split_vocab["function"],
            split_vocab["other"], conf_threshold=thr_map,
            max_steps=max_steps)
        pipeline_pf = InferencePipeline(
            generator, gen_vars, runner_pf, program_inv,
            split_vocab["function"])
        result_pf = pipeline_pf.run(
            enc_eval.questions, features, enc_eval.image_idxs,
            gt_answers=gt_value_ids, gt_programs=enc_eval.programs)
        pred_pf = np.where(result_pf.answer_valid, result_pf.answers, -1)
        acc_pf = answer_accuracy_by_type(pred_pf, gt_value_ids,
                                         final_functions)
        print("by-type accuracy (per-function conf):",
              {k: round(v, 3) for k, v in acc_pf.items()})

    elapsed = time.time() - t0
    platform = os.environ.get("DEMO_PLATFORM", "tpu")

    type_keys = ["overall"] + sorted(k for k in acc if k != "overall")
    pr = det.precision_recall()
    tok = det.token_accuracy()
    section = "\n".join([
        BEGIN,
        "## Accuracy tables (thesis Tables 4.2-4.5 formats, synthetic data)",
        "",
        f"`scripts/demo_accuracy_table.py` — {num_scenes} scenes × {qps} "
        f"questions (hop_prob={hop_prob}, chain_prob={chain_prob}: "
        "scene-aware relate/same_* joins), "
        f"{exe_steps} executor steps (grounding noise {noise}/{drop}"
        + (f", lr_schedule={lr_schedule}" if lr_schedule != "constant" else "")
        + (f", d_model={d_model}" if d_model else "")
        + (f", {layers}L encoder" if layers != 2 else "")
        + (f", palette={palette}" if palette != 4 else "")
        + (", box_roi" if box_roi else "")
        + ((f", roi_sim(K={sim_heads})" if sim_heads != 1 else ", roi_sim")
           if roi_sim else "")
        + (", count_embed" if count_embed else "")
        + (", conf thresholds fit on train-scene chains (out-of-sample)"
           if conf_fit == "train" else "")
        + f"), {len(eval_q)} eval questions on held-out scenes, platform "
        f"{platform}, {elapsed:.0f}s.",
        "",
        "### Answer accuracy by question type (Table 4.2 format; "
        "reference: 70.3 overall on real CLEVR)",
        "",
        "| " + " | ".join(type_keys) + " |",
        "|" + "---|" * len(type_keys),
        "| " + " | ".join(f"{acc.get(k, float('nan')):.3f}"
                          for k in type_keys) + " |",
        "",
        "Program EM {:.3f} (correct-program fraction of the faithfulness "
        "tally)".format(sum(
            v for k, v in result.tally.as_fractions().items()
            if k.startswith("correct_program"))),
        "",
        "### Per-function box P/R @ IoU 0.5 on predicted chains "
        f"(Table 4.3 format; conf threshold {thr_label} F1-calibrated)",
        "",
        "| function | precision | recall | gt boxes |",
        "|---|---|---|---|",
        *(f"| {fn} | {v['precision']:.3f} | {v['recall']:.3f} "
          f"| {det.box_gt[fn]} |" for fn, v in sorted(pr.items())),
        "",
        "### Token accuracy by function on predicted chains "
        "(Table 4.4 format)",
        "",
        "| function | accuracy |",
        "|---|---|",
        *(f"| {fn} | {v:.3f} |" for fn, v in sorted(tok.items())),
        "",
        "### Faithfulness quadrants (Table 4.5 protocol)",
        "",
        "```",
        result.tally.report(),
        "```",
    ] + ([] if det_pf is None else [
        "",
        "### With per-function confidence operating points "
        "(same model, per-function F1 thresholds gate tally AND in-chain "
        "propagation)",
        "",
        "| " + " | ".join(type_keys) + " |",
        "|" + "---|" * len(type_keys),
        "| " + " | ".join(f"{acc_pf.get(k, float('nan')):.3f}"
                          for k in type_keys) + " |",
        "",
        "| function | precision | recall | gt boxes | thr |",
        "|---|---|---|---|---|",
        *(f"| {fn} | {v['precision']:.3f} | {v['recall']:.3f} "
          f"| {det_pf.box_gt[fn]} "
          f"| {thr_map.get(fn, thr_map['__global__']):.2f} |"
          for fn, v in sorted(det_pf.precision_recall().items())),
        "",
        "| function | token accuracy |",
        "|---|---|",
        *(f"| {fn} | {v:.3f} |"
          for fn, v in sorted(det_pf.token_accuracy().items())),
        "",
        "```",
        result_pf.tally.report(),
        "```",
    ]) + [END])

    from demo_common import splice_section

    demo_path = splice_section(section, BEGIN, END)
    print(f"wrote section to {demo_path}")
    print(section)


if __name__ == "__main__":
    main()
