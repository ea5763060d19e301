"""CLI: one entry point per pipeline stage.

Commands (each replaces a reference script; see SURVEY.md §2):
  build-vocab          <- preprocess_questions/build_vocab.py
  preprocess-questions <- preprocess_questions/preprocess_questions.py
  extract-features     <- preprocess_images/extract_features.py
  export-scenes        <- preprocess_scenes/get_bounding_boxes.py
  annotate             <- preprocess_scenes/preprocess_continousv3.py /
                          preprocess_full_annotation.py
  train                <- the train_*.py family (preset-driven)
  infer-chain          <- inference_transformer_full_annotation_new.py
  inspect              <- inspecting_scripts/* (first-N artifact dumps)
"""

from __future__ import annotations

import argparse
import json
import logging

from explainable_spatial_vqa_tpu.utils.logging import setup_logging

logger = logging.getLogger("esv.cli")


def _serve_mesh(args: argparse.Namespace):
    """Optional 1-D data mesh for --data_parallel chained serving."""
    if not getattr(args, "data_parallel", False):
        return None
    import jax

    if jax.device_count() < 2:
        logger.warning("--data_parallel requested but only 1 device is "
                       "visible; serving unsharded")
        return None
    from explainable_spatial_vqa_tpu.parallel.mesh import make_mesh

    logger.info("serving sharded over %d devices", jax.device_count())
    return make_mesh((-1,), ("data",))


def cmd_build_vocab(args: argparse.Namespace) -> None:
    from explainable_spatial_vqa_tpu.core.artifacts import load_questions_json
    from explainable_spatial_vqa_tpu.core.vocab import build_clevr_vocab, save_vocab

    collections = [load_questions_json(p) for p in args.inputs]
    vocab = build_clevr_vocab(collections)
    save_vocab(vocab, args.output)
    logger.info("wrote %s (%d program / %d question / %d answer tokens)",
                args.output, len(vocab["program_token_to_idx"]),
                len(vocab["question_token_to_idx"]), len(vocab["answer_token_to_idx"]))


def cmd_preprocess_questions(args: argparse.Namespace) -> None:
    from explainable_spatial_vqa_tpu.core.artifacts import (
        encode_questions,
        load_questions_json,
        write_questions_h5,
    )
    from explainable_spatial_vqa_tpu.core.vocab import load_vocab

    questions = load_questions_json(args.input_questions_json)
    vocab = load_vocab(args.input_vocab_json)
    encoded = encode_questions(questions, vocab, mode=args.mode,
                               allow_unk=bool(args.encode_unk))
    write_questions_h5(encoded, args.output_h5_file)
    logger.info("wrote %s questions=%s programs=%s", args.output_h5_file,
                encoded.questions.shape,
                None if encoded.programs is None else encoded.programs.shape)


def cmd_extract_features(args: argparse.Namespace) -> None:
    from explainable_spatial_vqa_tpu.vision.extract import (
        collect_image_paths,
        extract_features,
    )
    from explainable_spatial_vqa_tpu.vision.resnet import (
        ResNetFeatures,
        params_from_torch_state_dict,
    )

    paths = collect_image_paths(args.input_image_dir, args.max_images)
    model = ResNetFeatures(num_stages=args.model_stage)
    variables = None
    if args.torch_weights:
        import torch

        state_dict = torch.load(args.torch_weights, map_location="cpu",
                                weights_only=True)
        variables = params_from_torch_state_dict(state_dict, args.model_stage)
        logger.info("loaded torchvision weights from %s", args.torch_weights)
    else:
        logger.warning("no --torch-weights given: using random ResNet weights "
                       "(features will not match the reference numerically)")
    extract_features(paths, args.output_h5_file, model=model, variables=variables,
                     batch_size=args.batch_size,
                     size=(args.image_height, args.image_width),
                     resize=args.resize)
    logger.info("wrote %s (%d images)", args.output_h5_file, len(paths))


def cmd_export_scenes(args: argparse.Namespace) -> None:
    from explainable_spatial_vqa_tpu.clevr.bboxes import export_scenes
    from explainable_spatial_vqa_tpu.core.artifacts import load_scenes_json, write_scenes_h5

    scenes = load_scenes_json(args.input_scenes_json)
    if args.layout == "attributes":
        import h5py

        from explainable_spatial_vqa_tpu.core.reshape import export_scene_attributes

        arrays, vocab = export_scene_attributes(scenes)
        with h5py.File(args.output_h5_file, "w") as f:
            for key, value in arrays.items():
                f.create_dataset(key, data=value)
        if args.vocab_output:
            with open(args.vocab_output, "w") as f:
                json.dump(vocab, f, indent=2)
        logger.info("wrote %s (attributes layout)", args.output_h5_file)
        return
    out = export_scenes(scenes, decimals=args.decimals)
    write_scenes_h5(args.output_h5_file, out["bounding_boxes"], out["class_labels"],
                    out["image_index"], out["image_filename"])
    logger.info("wrote %s (%d scenes, max %d objects)", args.output_h5_file,
                out["bounding_boxes"].shape[0], out["bounding_boxes"].shape[1])


def cmd_annotate(args: argparse.Namespace) -> None:
    import copy

    from explainable_spatial_vqa_tpu.clevr import annotate as ann
    from explainable_spatial_vqa_tpu.clevr.scenes import load_scenes
    from explainable_spatial_vqa_tpu.core import vocab as voc
    from explainable_spatial_vqa_tpu.core.artifacts import (
        load_questions_json,
        write_annotated_h5,
    )

    scenes = load_scenes(args.scenes)
    questions = load_questions_json(args.questions)
    if args.limit:
        questions = questions[: args.limit]
    logger.info("annotating %d questions over %d scenes (%s mode, %d workers)",
                len(questions), len(scenes), args.mode, args.workers)
    if args.mode == "string":
        from explainable_spatial_vqa_tpu.core import annotated_strings as astr

        annotated = [
            ann.annotate_question_string(q, scenes[q["image_index"]])
            for q in questions
            if q["image_index"] in scenes
        ]
        arrays, token_to_id = astr.build_mapped_sequences(annotated)
        astr.write_mapped_sequences(arrays, args.output_h5)
        with open(args.vocab_output, "w") as f:
            json.dump({"token_to_id": token_to_id,
                       "id_to_token": {str(v): k for k, v in token_to_id.items()}}, f, indent=2)
        if args.raw_json:
            with open(args.raw_json, "w") as f:
                json.dump({"questions": annotated}, f)
        logger.info("wrote %s (+ vocab %s)", args.output_h5, args.vocab_output)
        return
    if args.mode == "v3":
        annotated = ann.annotate_questions(questions, scenes, num_workers=args.workers)
        vocabs = voc.build_split_vocab(annotated)
        converted = [voc.apply_split_vocab(copy.deepcopy(q), vocabs) for q in annotated]
        layout = "per_question"
    else:
        annotated = [
            ann.annotate_question_full(q, scenes[q["image_index"]])
            for q in questions
            if q["image_index"] in scenes
        ]
        vocabs = voc.build_joint_vocab(annotated)
        converted = [voc.apply_joint_vocab(copy.deepcopy(q), vocabs) for q in annotated]
        layout = "blob"
    if args.raw_json:
        with open(args.raw_json, "w") as f:
            json.dump({"questions": annotated}, f)
    with open(args.vocab_output, "w") as f:
        json.dump(vocabs, f, indent=4)
    write_annotated_h5(converted, args.output_h5, layout=layout)
    logger.info("wrote %s (+ vocab %s)", args.output_h5, args.vocab_output)


def cmd_train(args: argparse.Namespace) -> None:
    import dataclasses

    from explainable_spatial_vqa_tpu.core.config import get_preset
    from explainable_spatial_vqa_tpu.train.pipelines import build_pipeline
    from explainable_spatial_vqa_tpu.train.trainer import Trainer

    config = get_preset(args.preset)
    data_overrides = {}
    for field in ("features_h5", "questions_h5", "annotated_h5", "vocab_json",
                  "split_vocab_json", "image_dir"):
        value = getattr(args, field, None)
        if value:
            data_overrides[field] = value
    if args.subset_fraction is not None:
        data_overrides["subset_fraction"] = args.subset_fraction
    if data_overrides:
        config = config.replace(data=dataclasses.replace(config.data, **data_overrides))
    train_overrides = {}
    if args.epochs is not None:
        train_overrides["num_epochs"] = args.epochs
    if args.batch_size is not None:
        train_overrides["batch_size"] = args.batch_size
    if train_overrides:
        config = config.replace(train=dataclasses.replace(config.train, **train_overrides))

    pipeline = build_pipeline(config)
    trainer = Trainer(
        pipeline.loss_fn, pipeline.params, config.optim, config.train,
        steps_per_epoch=pipeline.steps_per_epoch,
        checkpoint_dir=args.checkpoint_dir or config.train.checkpoint_dir,
    )
    history = trainer.fit(pipeline.train_batches, pipeline.val_batches,
                          monitor=pipeline.monitor)
    logger.info("training done; best %s = %.4f", pipeline.monitor, trainer.best_metric)
    if args.eval_test:
        acc = trainer.evaluate_best(pipeline.test_batches())
        metric = acc.ratio(*pipeline.monitor)
        logger.info("test: loss %.4f, %s = %.4f", acc.mean("loss_sum"),
                    "/".join(pipeline.monitor), metric)
        history["test"] = [acc.totals]
    if args.history_json:
        with open(args.history_json, "w") as f:
            json.dump(history, f, default=float)
    if args.plot:
        from explainable_spatial_vqa_tpu.utils.plots import plot_history

        plot_history(history, args.plot)
        logger.info("wrote %s", args.plot)


def cmd_eval_iqap(args: argparse.Namespace) -> None:
    """IQAP batch inference + JSON report: decoded question/program/answer per
    sample, accuracy summary, wall-clock timing
    (replaces run_model_transformer_iqap.py:306-544)."""
    import dataclasses
    import time

    import h5py
    import jax
    import jax.numpy as jnp
    import numpy as np

    from explainable_spatial_vqa_tpu.core.artifacts import read_questions_h5
    from explainable_spatial_vqa_tpu.core.config import get_preset
    from explainable_spatial_vqa_tpu.core.vocab import invert_vocab, load_vocab
    from explainable_spatial_vqa_tpu.evalsuite.accuracy import program_accuracy
    from explainable_spatial_vqa_tpu.models.iqap import TransformerIQAP, generate_programs
    from explainable_spatial_vqa_tpu.train.checkpoints import CheckpointStore

    enc = read_questions_h5(args.questions_h5)
    limit = args.limit or len(enc.questions)
    questions = enc.questions[:limit]
    answers = enc.answers[:limit] if enc.answers is not None else None
    programs = enc.programs[:limit] if enc.programs is not None else None
    image_idxs = enc.image_idxs[:limit]

    vocab = load_vocab(args.vocab_json)
    q_inv = invert_vocab(vocab["question_token_to_idx"])
    p_inv = invert_vocab(vocab["program_token_to_idx"])
    a_inv = invert_vocab(vocab["answer_token_to_idx"])

    config = get_preset(args.preset)
    with h5py.File(args.features_h5, "r") as f:
        feat_shape = f["features"].shape
        features = f["features"][()]
    n, c, h, w = features.shape
    image_tokens_all = features.reshape(n, c, h * w).transpose(0, 2, 1).astype(np.float32)

    model_cfg = dataclasses.replace(
        config.model,
        vocab_size=int(questions.max()) + 1,
        num_answer_classes=(int(answers.max()) + 1) if answers is not None else 32,
        program_vocab_size=(int(programs.max()) + 1) if programs is not None else 45,
        program_len=programs.shape[1] if programs is not None else 27,
        max_question_len=questions.shape[1],
        image_feature_dim=int(c),
        num_image_tokens=int(h * w),
    )
    model = TransformerIQAP(model_cfg)
    dummy = jnp.zeros((2, model_cfg.num_image_tokens, model_cfg.image_feature_dim))
    variables = model.init(jax.random.PRNGKey(0), dummy, jnp.asarray(questions[:2]),
                           method=model.init_all)
    if args.checkpoint_dir:
        store = CheckpointStore(args.checkpoint_dir)
        best = store.restore_best({"params": jax.device_get(variables["params"])})
        if best is not None:
            variables = {"params": best["params"]}
            logger.info("restored checkpoint from %s", args.checkpoint_dir)

    forward = jax.jit(lambda img, q: model.apply(variables, img, q))
    t0 = time.perf_counter()
    out = forward(jnp.asarray(image_tokens_all[image_idxs]), jnp.asarray(questions))
    pred_answers = np.argmax(np.asarray(out["answer_logits"]), axis=-1)
    pred_programs = None
    if programs is not None:
        tokens, _ = generate_programs(model, variables, out["memory"],
                                      max_len=programs.shape[1])
        pred_programs = np.asarray(tokens)
    elapsed = time.perf_counter() - t0

    results = []
    for i in range(len(questions)):
        record = {
            "image_index": int(image_idxs[i]),
            "question": " ".join(q_inv.get(int(t), "?") for t in questions[i] if t),
            "predicted_answer": a_inv.get(int(pred_answers[i]), "?"),
        }
        if answers is not None:
            record["gt_answer"] = a_inv.get(int(answers[i]), "?")
        if pred_programs is not None:
            record["predicted_program"] = " ".join(
                p_inv.get(int(t), "?") for t in pred_programs[i] if t
            )
        results.append(record)

    summary = {"samples": len(results), "seconds": round(elapsed, 3)}
    if answers is not None:
        summary["answer_accuracy"] = float(np.mean(pred_answers == answers))
    if pred_programs is not None and programs is not None:
        summary.update(program_accuracy(pred_programs, programs))
    print(json.dumps(summary, indent=2))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump({"summary": summary, "results": results}, f, indent=2)
        logger.info("wrote %s", args.output_json)


def cmd_eval_generator(args: argparse.Namespace) -> None:
    """Program-generator evaluation: greedy-decoded program accuracy (exact
    match + token) over an encoded-questions artifact, with optional decoded
    examples (replaces run_model_lstm_qp.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from explainable_spatial_vqa_tpu.core.artifacts import read_questions_h5
    from explainable_spatial_vqa_tpu.core.config import get_preset
    from explainable_spatial_vqa_tpu.core.vocab import invert_vocab, load_vocab
    from explainable_spatial_vqa_tpu.evalsuite.accuracy import program_accuracy
    from explainable_spatial_vqa_tpu.models.generator import ProgramGenerator
    from explainable_spatial_vqa_tpu.train.checkpoints import CheckpointStore

    enc = read_questions_h5(args.questions_h5)
    assert enc.programs is not None, "questions h5 has no programs"
    limit = args.limit or len(enc.questions)
    questions, programs = enc.questions[:limit], enc.programs[:limit]

    config = get_preset(args.preset)
    # same max(preset, data) sizing as the training pipeline, so train-time
    # checkpoints restore with matching shapes
    model_cfg = dataclasses.replace(
        config.model,
        vocab_size=max(config.model.vocab_size, int(questions.max()) + 1),
        program_vocab_size=max(config.model.program_vocab_size,
                               int(programs.max()) + 1),
        program_len=programs.shape[1],
    )
    model = ProgramGenerator(model_cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(questions[:2]), jnp.asarray(programs[:2]),
    )
    if args.checkpoint_dir:
        store = CheckpointStore(args.checkpoint_dir)
        best = store.restore_best({"params": jax.device_get(variables["params"])})
        if best is not None:
            variables = {"params": best["params"]}
            logger.info("restored checkpoint from %s", args.checkpoint_dir)

    generate = jax.jit(lambda q: model.apply(variables, q, method=model.generate))

    def batched(fn, *columns):
        """Apply fn over full batches plus a PADDED tail batch, so every
        sample is scored (a dropped tail of an ordered question file is a
        biased exclusion); padding repeats the last row and is sliced off."""
        outputs = []
        bs = args.batch_size
        n = len(columns[0])
        for start in range(0, n, bs):
            chunk = [col[start : start + bs] for col in columns]
            if len(chunk[0]) < bs:
                chunk = [
                    np.concatenate([c, np.repeat(c[-1:], bs - len(c), axis=0)])
                    for c in chunk
                ]
            outputs.append(np.asarray(fn(*(jnp.asarray(c) for c in chunk))))
        return np.concatenate(outputs)[:n]

    pred = batched(generate, questions)
    acc = program_accuracy(pred, programs)

    if args.compare_tf:
        # teacher-forced decode (gold prefix fed at every step) alongside
        # greedy, as the reference reports (run_model_lstm_qp.py:277-321)
        tf_forward = jax.jit(
            lambda q, p: model.apply(
                variables, q, p, deterministic=True, teacher_forcing=1.0
            )["tokens"]
        )
        tf_pred = batched(tf_forward, questions, programs)
        acc["teacher_forced"] = program_accuracy(tf_pred, programs)

    if args.beam_size and args.beam_size > 1:
        beam = jax.jit(
            lambda q: model.apply(
                variables, q, beam_size=args.beam_size, method=model.beam_generate
            )[0][:, 0]  # best beam
        )
        beam_pred = batched(beam, questions)
        beam_acc = program_accuracy(beam_pred, programs)
        beam_acc["beam_size"] = args.beam_size
        acc["beam"] = beam_acc

    print(json.dumps(acc, indent=2))

    if args.show and args.vocab_json:
        vocab = load_vocab(args.vocab_json)
        inv = invert_vocab(vocab["program_token_to_idx"])
        for i in range(min(args.show, len(pred))):
            decode = lambda row: " ".join(  # noqa: E731
                inv.get(int(t), "?") for t in row if t not in (0,)
            )
            print(f"[{i}] pred: {decode(pred[i])}")
            print(f"[{i}] gold: {decode(programs[i])}")


def cmd_tally(args: argparse.Namespace) -> None:
    """Full-pipeline faithfulness evaluation: generator + executor checkpoints
    over an encoded-questions artifact; prints the CPCA/CPIA/IPCA/IPIA
    quadrants (thesis Table 4.5) and answer accuracy by question type
    (replaces inference_transformer_iqap_tally.py / run_model_*_tally.py)."""
    import h5py
    import jax
    import jax.numpy as jnp
    import numpy as np

    from explainable_spatial_vqa_tpu.core.artifacts import read_questions_h5
    from explainable_spatial_vqa_tpu.core.config import get_preset
    from explainable_spatial_vqa_tpu.core.vocab import canonicalize, invert_vocab, load_vocab
    from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner
    from explainable_spatial_vqa_tpu.infer.pipeline import InferencePipeline
    from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
    from explainable_spatial_vqa_tpu.models.generator import ProgramGenerator
    from explainable_spatial_vqa_tpu.train.checkpoints import CheckpointStore

    enc = read_questions_h5(args.questions_h5)
    limit = args.limit or len(enc.questions)
    questions = enc.questions[:limit]
    answers = enc.answers[:limit] if enc.answers is not None else None
    programs = enc.programs[:limit] if enc.programs is not None else None
    image_idxs = enc.image_idxs[:limit]

    clevr_vocab = load_vocab(args.vocab_json)
    split_vocab = load_vocab(args.split_vocab_json)
    program_inv = invert_vocab(clevr_vocab["program_token_to_idx"])
    answer_inv = invert_vocab(clevr_vocab["answer_token_to_idx"])
    value_vocab = split_vocab["other"]

    import dataclasses

    # max(preset, data) sizing — the same formula the training pipelines use,
    # so checkpoints written by `train` restore with matching shapes here
    gen_preset = get_preset("generator").model
    exe_preset = get_preset(args.executor_preset).model
    if not hasattr(exe_preset, "box_roi"):
        raise SystemExit(
            f"--executor_preset {args.executor_preset!r} is not an "
            "executor-family preset")
    gen_cfg = dataclasses.replace(
        gen_preset,
        vocab_size=max(gen_preset.vocab_size, int(questions.max()) + 1),
        program_vocab_size=max(
            gen_preset.program_vocab_size,
            (int(programs.max()) + 1) if programs is not None else 0,
        ),
        program_len=programs.shape[1] if programs is not None else 27,
    )
    exe_cfg = dataclasses.replace(
        exe_preset,
        vocab_size=max(exe_preset.vocab_size, len(split_vocab["function"]) + 1),
        token_classes=max(exe_preset.token_classes, len(value_vocab) + 1),
    )
    generator = ProgramGenerator(gen_cfg)
    executor = ProgramExecutor(exe_cfg)

    gen_vars = generator.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(questions[:2]), jnp.zeros((2, gen_cfg.program_len), jnp.int32),
    )
    exe_vars = executor.init(
        jax.random.PRNGKey(2),
        jnp.zeros((2, exe_cfg.num_image_tokens, exe_cfg.image_feature_dim)),
        jnp.zeros((2, exe_cfg.max_input_boxes, 4)),
        jnp.ones((2, exe_cfg.max_input_boxes), bool),
        jnp.zeros((2, 3), jnp.int32), jnp.ones((2, 3), bool),
    )
    for name, dirpath, variables in (
        ("generator", args.generator_checkpoint, gen_vars),
        ("executor", args.executor_checkpoint, exe_vars),
    ):
        if dirpath:
            store = CheckpointStore(dirpath)
            best = store.restore_best({"params": jax.device_get(variables["params"])})
            if best is not None:
                variables["params"] = best["params"]
                logger.info("restored %s checkpoint from %s", name, dirpath)
            else:
                logger.warning("no %s checkpoint at %s (random weights)", name, dirpath)

    with h5py.File(args.features_h5, "r") as f:
        feats = f["features"][()]
    n, c, h, w = feats.shape
    image_tokens = feats.reshape(n, c, h * w).transpose(0, 2, 1).astype(np.float32)

    serve_mesh = _serve_mesh(args)
    runner = ExecutorChainRunner(executor, exe_vars, exe_cfg, max_steps=28,
                                 mesh=serve_mesh)
    pipeline = InferencePipeline(
        generator, gen_vars, runner, program_inv, split_vocab["function"]
    )
    # GT answers in the executor's value-token space
    gt_value_ids = None
    if answers is not None:
        gt_value_ids = np.asarray([
            value_vocab.get(canonicalize(answer_inv.get(int(a), "")), -2)
            for a in answers
        ])
    result = pipeline.run(questions, image_tokens, image_idxs,
                          gt_answers=gt_value_ids, gt_programs=programs,
                          chain_mode=args.chain_mode)
    print(f"truncated_programs: {result.truncated} "
          f"(generated programs deeper than max_steps=28; their execution "
          f"was cut and their answers read a mid-chain value)")
    if result.tally is not None:
        print(result.tally.report())
        from explainable_spatial_vqa_tpu.evalsuite.accuracy import answer_accuracy_by_type

        final_functions = [
            program_inv.get(int(row[row != 0][-2]) if (row != 0).sum() > 1 else 0, "")
            for row in programs
        ]
        pred = np.where(result.answer_valid, result.answers, -1)
        acc = answer_accuracy_by_type(pred, gt_value_ids, final_functions)
        print(json.dumps(acc, indent=2))

    if args.annotated_h5:
        # Per-step box P/R @ IoU + token accuracy on the executor's PREDICTED
        # chains (thesis Tables 4.3/4.4 protocol), optionally with F1-max
        # confidence-threshold calibration applied before the final tally.
        from explainable_spatial_vqa_tpu.core.artifacts import read_annotated_h5
        from explainable_spatial_vqa_tpu.evalsuite.executor_eval import (
            calibrate_chain_conf_threshold,
            tally_predicted_chains,
        )
        from explainable_spatial_vqa_tpu.train.datasets import chain_arrays

        annotated = read_annotated_h5(args.annotated_h5)[:limit]
        chains = chain_arrays(annotated, split_vocab["function"], max_steps=28)

        # both fast paths scatter the full per-step caches back, so the box
        # P/R tally rides the serving schedule (r2 used the plain depth-28
        # runner here); the pool takes the per-IMAGE cache, sorted takes
        # per-question gathered tokens
        def run_chains(rnr):
            if args.chain_mode == "pool":
                return rnr.run_pool(image_tokens, chains)
            return rnr.run_sorted(image_tokens[chains.image_index], chains)

        conf_threshold = exe_cfg.conf_threshold
        if args.conf_thresholds:
            # apply PRE-FITTED thresholds (e.g. calibrated on a held-in
            # train/calibration split via --save_conf_thresholds) — the
            # out-of-sample counterpart of the in-place --calibrate_conf*
            # modes; the map gates both in-chain propagation and the tally
            from explainable_spatial_vqa_tpu.evalsuite.executor_eval import (
                build_conf_threshold_vector,
            )

            with open(args.conf_thresholds) as f:
                thr_map = {k: float(v) for k, v in json.load(f).items()}
            logger.info("loaded conf thresholds from %s: %s",
                        args.conf_thresholds,
                        {k: round(v, 2) for k, v in sorted(thr_map.items())})
            vec = build_conf_threshold_vector(
                split_vocab["function"], thr_map,
                default=exe_cfg.conf_threshold)
            calibrated_runner = ExecutorChainRunner(
                executor, exe_vars, exe_cfg, max_steps=28, mesh=serve_mesh,
                conf_thresholds=vec,
            )
            run_out = run_chains(calibrated_runner)
            conf_threshold = thr_map
        else:
            run_out = run_chains(runner)
        if args.conf_thresholds:
            pass  # pre-fitted map already applied above; skip calibration
        elif args.calibrate_conf_per_function:
            # per-FUNCTION F1 operating points (same_* confidences sit far
            # below the filters'; one global bar starves their recall AND
            # their downstream steps) — calibrate, then re-run the chain
            # with the per-function propagation gate
            from explainable_spatial_vqa_tpu.evalsuite.executor_eval import (
                build_conf_threshold_vector,
                calibrate_chain_conf_thresholds_per_function,
            )

            thr_map, f1_map = calibrate_chain_conf_thresholds_per_function(
                run_out, annotated, split_vocab["function"], value_vocab,
                iou_threshold=args.iou_threshold,
            )
            logger.info("per-function conf thresholds: %s",
                        {k: round(v, 2) for k, v in sorted(thr_map.items())})
            vec = build_conf_threshold_vector(
                split_vocab["function"], thr_map,
                default=exe_cfg.conf_threshold)
            calibrated_runner = ExecutorChainRunner(
                executor, exe_vars, exe_cfg, max_steps=28, mesh=serve_mesh,
                conf_thresholds=vec,
            )
            run_out = run_chains(calibrated_runner)
            conf_threshold = thr_map
        elif args.calibrate_conf:
            conf_threshold, f1 = calibrate_chain_conf_threshold(
                run_out, annotated, split_vocab["function"], value_vocab,
                iou_threshold=args.iou_threshold,
            )
            logger.info("calibrated conf threshold: %.2f (box F1 %.3f)",
                        conf_threshold, f1)
            if abs(conf_threshold - exe_cfg.conf_threshold) > 1e-9:
                # threshold gates box propagation through the chain: re-run
                calibrated_runner = ExecutorChainRunner(
                    executor, exe_vars,
                    dataclasses.replace(exe_cfg, conf_threshold=conf_threshold),
                    max_steps=28, mesh=serve_mesh,
                )
                run_out = run_chains(calibrated_runner)
        if args.save_conf_thresholds:
            # persist the fitted operating points so a later tally on a
            # DIFFERENT split (or a serving deployment) can reuse them via
            # --conf_thresholds — calibrate-on-train, evaluate-on-eval
            out_map = (conf_threshold if isinstance(conf_threshold, dict)
                       else {"__global__": float(conf_threshold)})
            with open(args.save_conf_thresholds, "w") as f:
                json.dump(out_map, f, indent=2, sort_keys=True)
            logger.info("saved conf thresholds to %s",
                        args.save_conf_thresholds)
        step_tally = tally_predicted_chains(
            run_out, annotated, split_vocab["function"], value_vocab,
            conf_threshold=conf_threshold, iou_threshold=args.iou_threshold,
        )
        print(step_tally.report())
        payload = {
            "per_function_box_pr": step_tally.precision_recall(),
            "per_function_token_acc": step_tally.token_accuracy(),
            "conf_threshold": conf_threshold,
            "iou_threshold": args.iou_threshold,
            # first-class truncation accounting (generated / GT chains)
            "truncated_generated_programs": result.truncated,
            "truncated_gt_programs": chains.truncated,
        }
        print(json.dumps(payload, indent=2))


def cmd_infer_chain(args: argparse.Namespace) -> None:
    """Chained inference over annotated questions with a trained step-seq2seq
    checkpoint; prints per-question predicted outputs and, when GT answers are
    available, an answer-accuracy report."""
    import dataclasses

    import h5py
    import jax
    import numpy as np

    from explainable_spatial_vqa_tpu.core.artifacts import read_annotated_h5
    from explainable_spatial_vqa_tpu.core.config import get_preset
    from explainable_spatial_vqa_tpu.infer.chain import Seq2SeqChainRunner
    from explainable_spatial_vqa_tpu.models.step_executor import StepExecutorSeq2Seq
    from explainable_spatial_vqa_tpu.train.checkpoints import CheckpointStore
    from explainable_spatial_vqa_tpu.train.datasets import SPECIALS_OFFSET, chain_arrays

    config = get_preset("step_seq2seq")
    if args.vocab_json:
        with open(args.vocab_json) as f:
            joint_vocab = json.load(f)
        rev_vocab = {v: k for k, v in joint_vocab.items()}
    else:
        joint_vocab, rev_vocab = {}, {}

    annotated = read_annotated_h5(args.annotated_h5)
    if args.limit:
        annotated = annotated[: args.limit]

    # chain metadata: converted records carry numeric function-id strings
    import numpy as np

    identity_vocab = {}
    for q in annotated:
        for step in q["annotated_program"]:
            fn = step["function"]
            identity_vocab.setdefault(fn, int(fn) + SPECIALS_OFFSET if fn.isdigit() else 0)
    chains = chain_arrays(annotated, identity_vocab, max_steps=args.max_steps)

    with h5py.File(args.features_h5, "r") as f:
        feat_shape = f["features"].shape  # (N, C, H, W)
    model_cfg = dataclasses.replace(
        config.model, vocab_size=args.vocab_size,
        image_feature_dim=int(feat_shape[1]),
        num_image_tokens=int(feat_shape[2] * feat_shape[3]),
    )
    model = StepExecutorSeq2Seq(model_cfg)
    import jax.numpy as jnp

    dummy = (
        jnp.zeros((1, model_cfg.num_image_tokens, model_cfg.image_feature_dim)),
        jnp.zeros((1, 5), jnp.int32), jnp.zeros((1, 3), jnp.int32),
    )
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    if args.checkpoint_dir:
        store = CheckpointStore(args.checkpoint_dir)
        best = store.restore_best({"params": jax.device_get(variables["params"])})
        if best is not None:
            variables = {"params": best["params"]}
            logger.info("restored best checkpoint from %s", args.checkpoint_dir)

    with h5py.File(args.features_h5, "r") as f:
        feats = np.stack([f["features"][int(i)] for i in chains.image_index])
    n, c, h, w = feats.shape
    image_tokens = feats.reshape(n, c, h * w).transpose(0, 2, 1)

    runner = Seq2SeqChainRunner(
        model, variables, model_cfg, max_steps=args.max_steps,
        mesh=_serve_mesh(args),
    )
    print(f"truncated_programs: {chains.truncated} "
          f"(GT chains deeper than --max_steps={args.max_steps})")
    out = runner.run(image_tokens, chains)
    results = []
    for i, q in enumerate(annotated):
        final = [int(t) for t in out["final_outputs"][i] if t != 0]
        decoded = " ".join(rev_vocab.get(t - SPECIALS_OFFSET, "<unk>") for t in final)
        results.append({
            "image_index": int(chains.image_index[i]),
            "predicted_ids": final,
            "predicted_text": decoded,
            "answer": q.get("answer", ""),
        })
        if i < 10:
            logger.info("q%d: predicted %r (gt answer ids %r)", i, decoded, q.get("answer"))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(results, f, indent=2)
        logger.info("wrote %s", args.output_json)


def cmd_stats(args: argparse.Namespace) -> None:
    """Dataset invariants over annotated questions: max boxes per step, max
    output tokens, function vocab size, box/token output case counts
    (replaces find_max_boxes/find_max_tokens/find_function_vocab_size/
    check_cases_of_bb_and_token.py)."""
    from explainable_spatial_vqa_tpu.core.artifacts import read_annotated_h5
    from explainable_spatial_vqa_tpu.train.datasets import parse_boxes

    annotated = read_annotated_h5(args.annotated_h5)
    max_in_boxes = max_out_boxes = max_tokens = max_steps = 0
    functions = set()
    box_steps = token_steps = empty_steps = 0
    for q in annotated:
        steps = q.get("annotated_program", [])
        max_steps = max(max_steps, len(steps))
        for step in steps:
            functions.add(step.get("function", ""))
            n_in = len(parse_boxes(step.get("input_values", "")))
            n_out = len(parse_boxes(step.get("output_values", "")))
            max_in_boxes = max(max_in_boxes, n_in)
            max_out_boxes = max(max_out_boxes, n_out)
            out_text = step.get("output_values", "").strip()
            max_tokens = max(max_tokens, len(out_text.split()))
            if n_out:
                box_steps += 1
            elif out_text:
                token_steps += 1
            else:
                empty_steps += 1
    report = {
        "questions": len(annotated),
        "max_steps": max_steps,
        "max_input_boxes": max_in_boxes,
        "max_output_boxes": max_out_boxes,
        "max_output_tokens": max_tokens,
        "function_vocab_size": len(functions),
        "box_output_steps": box_steps,
        "token_output_steps": token_steps,
        "empty_output_steps": empty_steps,
    }
    print(json.dumps(report, indent=2))


def cmd_visualize(args: argparse.Namespace) -> None:
    """Overlay approximated GT boxes for one scene onto its image (replaces
    inspect_bounding_boxes_image.ipynb / inference_bb_onlyv3's draw loop)."""
    from PIL import Image

    from explainable_spatial_vqa_tpu.clevr.bboxes import scene_bounding_boxes
    from explainable_spatial_vqa_tpu.core.artifacts import load_scenes_json
    from explainable_spatial_vqa_tpu.utils.visualize import draw_boxes

    scenes = load_scenes_json(args.input_scenes_json)
    scene = next(s for s in scenes if s["image_index"] == args.image_index)
    boxes = scene_bounding_boxes(scene, decimals=None)
    if args.image:
        image = Image.open(args.image).convert("RGB")
    else:
        image = Image.new("RGB", (480, 320), "black")
    labels = [
        f"{o['size']} {o['color']} {o['material']} {o['shape']}"
        for o in scene["objects"]
    ]
    draw_boxes(image, boxes.tolist(), labels=labels if args.labels else None)
    image.save(args.output)
    logger.info("wrote %s (%d boxes)", args.output, len(boxes))


def cmd_inspect(args: argparse.Namespace) -> None:
    import h5py
    import numpy as np

    with h5py.File(args.file, "r") as f:
        print(f"datasets in {args.file}:")
        def show(name, obj):
            if isinstance(obj, h5py.Dataset):
                print(f"  {name}: shape={obj.shape} dtype={obj.dtype}")
                if args.n and obj.shape and obj.shape[0]:
                    head = obj[: min(args.n, obj.shape[0])]
                    print(f"    first {args.n}: {np.asarray(head)!r}"[:500])
        f.visititems(show)


def cmd_cogent_protocol(args: argparse.Namespace) -> None:
    """Run the four-cell CoGenT A->B protocol end-to-end on synthetic data
    (thesis §4.2.2 / Table 4.6; BASELINE.md CoGenT table)."""
    import json

    from explainable_spatial_vqa_tpu.evalsuite.cogent import run_cogent_protocol

    result = run_cogent_protocol(
        num_scenes_a=args.scenes_a,
        num_scenes_val=args.scenes_val,
        num_scenes_b_pool=args.scenes_b_pool,
        questions_per_scene=args.questions_per_scene,
        gen_steps=args.gen_steps,
        exe_steps=args.exe_steps,
        ft_steps=args.ft_steps,
        finetune_images=args.finetune_images,
        finetune_questions=args.finetune_questions,
        noise=args.noise,
        drop=args.drop,
        seed=args.seed,
        entangled=not args.disentangled_features,
        d_model=args.d_model,
        encoder_layers=args.encoder_layers,
        box_roi=args.box_roi,
        roi_sim=args.roi_sim,
        count_embed=args.count_embed,
        lr_schedule=args.lr_schedule,
        hop_prob=args.hop_prob,
        chain_prob=args.chain_prob,
        max_chain_steps=args.max_chain_steps,
    )
    report = result["report"]
    print(report.report())
    print()
    print(f"{'cell':<24}{'overall':>9}{'count':>9}{'exist':>9}"
          f"{'cmp_num':>9}{'cmp_attr':>9}{'query':>9}")
    for cell, acc in result["by_type"].items():
        print(f"{cell:<24}"
              f"{acc['overall']:>9.3f}{acc.get('count', float('nan')):>9.3f}"
              f"{acc.get('exist', float('nan')):>9.3f}"
              f"{acc.get('compare_number', float('nan')):>9.3f}"
              f"{acc.get('compare_attribute', float('nan')):>9.3f}"
              f"{acc.get('query_attribute', float('nan')):>9.3f}")
    if args.output_json:
        payload = {
            "four_cell": report.as_dict(),
            "by_type": result["by_type"],
            "sizes": result["sizes"],
        }
        with open(args.output_json, "w") as f:
            json.dump(payload, f, indent=2)
        logger.info("wrote %s", args.output_json)


def _preset_names():
    from explainable_spatial_vqa_tpu.core.config import PRESETS

    return PRESETS.keys()


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="explainable_spatial_vqa_tpu")
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu", "gpu", "axon"],
        help="force a jax platform (overrides environment-pinned backends)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="join a multi-process cluster via jax.distributed.initialize "
             "before running the command (parallel/multihost.py); every "
             "process runs the same command line",
    )
    parser.add_argument("--coordinator_address", default=None,
                        help="host:port of process 0 (auto-detected if unset)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("build-vocab")
    p.add_argument("--inputs", nargs="+", required=True,
                   help="question JSONs, reference order: val test train")
    p.add_argument("--output", default="vocab.json")
    p.set_defaults(fn=cmd_build_vocab)

    p = sub.add_parser("preprocess-questions")
    p.add_argument("--input_questions_json", required=True)
    p.add_argument("--input_vocab_json", required=True)
    p.add_argument("--output_h5_file", required=True)
    p.add_argument("--mode", default="postfix", choices=["chain", "prefix", "postfix"])
    p.add_argument("--encode_unk", default=0, type=int)
    p.set_defaults(fn=cmd_preprocess_questions)

    p = sub.add_parser("extract-features")
    p.add_argument("--input_image_dir", required=True)
    p.add_argument("--output_h5_file", required=True)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--image_height", type=int, default=224)
    p.add_argument("--image_width", type=int, default=224)
    p.add_argument("--model_stage", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--torch-weights", default=None,
                   help="path to torchvision resnet101 .pth for numeric parity")
    p.add_argument("--resize", choices=["device", "pil"], default="device",
                   help="device = jax cubic fused into the jitted forward; "
                        "pil = host PIL BICUBIC + uint8 requantization "
                        "(bit-matches the reference preprocessing)")
    p.set_defaults(fn=cmd_extract_features)

    p = sub.add_parser("export-scenes")
    p.add_argument("--input_scenes_json", required=True)
    p.add_argument("--output_h5_file", required=True)
    p.add_argument("--decimals", type=int, default=None)
    p.add_argument("--layout", default="boxes", choices=["boxes", "attributes"])
    p.add_argument("--vocab_output", default=None)
    p.set_defaults(fn=cmd_export_scenes)

    p = sub.add_parser("annotate")
    p.add_argument("--scenes", required=True)
    p.add_argument("--questions", required=True)
    p.add_argument("--output_h5", required=True)
    p.add_argument("--vocab_output", required=True)
    p.add_argument("--raw_json", default=None)
    p.add_argument("--mode", default="v3", choices=["v3", "full", "string"])
    p.add_argument("--workers", type=int, default=0)
    p.add_argument("--limit", type=int, default=0)
    p.set_defaults(fn=cmd_annotate)

    p = sub.add_parser("train")
    p.add_argument("--preset", required=True,
                   help="one of: " + ", ".join(sorted(_preset_names())))
    p.add_argument("--features_h5")
    p.add_argument("--questions_h5")
    p.add_argument("--annotated_h5")
    p.add_argument("--vocab_json")
    p.add_argument("--split_vocab_json")
    p.add_argument("--image_dir", help="raw PNGs (yolo_bb preset)")
    p.add_argument("--subset_fraction", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--history_json", default=None)
    p.add_argument("--eval_test", action="store_true")
    p.add_argument("--plot", default=None)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("presets", help="list training presets")
    p.set_defaults(fn=lambda a: print("\n".join(sorted(_preset_names()))))

    p = sub.add_parser("eval-iqap")
    p.add_argument("--questions_h5", required=True)
    p.add_argument("--features_h5", required=True)
    p.add_argument("--vocab_json", required=True)
    p.add_argument("--preset", default="transformer_iqap")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--output_json", default=None)
    p.set_defaults(fn=cmd_eval_iqap)

    p = sub.add_parser("eval-generator")
    p.add_argument("--questions_h5", required=True)
    p.add_argument("--preset", default="generator")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--vocab_json", default=None)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--show", type=int, default=0)
    p.add_argument("--beam_size", type=int, default=0,
                   help=">1: also report best-beam program accuracy")
    p.add_argument("--compare_tf", action="store_true",
                   help="also report teacher-forced accuracy "
                        "(run_model_lstm_qp.py:277-321 comparison)")
    p.set_defaults(fn=cmd_eval_generator)

    p = sub.add_parser("tally")
    p.add_argument("--questions_h5", required=True)
    p.add_argument("--features_h5", required=True)
    p.add_argument("--vocab_json", required=True)
    p.add_argument("--split_vocab_json", required=True)
    p.add_argument("--generator_checkpoint", default=None)
    p.add_argument("--executor_checkpoint", default=None)
    p.add_argument("--executor_preset", default="executor",
                   help="executor-family preset whose model config to build "
                        "(e.g. executor_roi / executor_roi_sim so checkpoints "
                        "trained with those presets restore with matching "
                        "param trees)")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--annotated_h5", default=None,
                   help="also compute per-function box P/R + token accuracy "
                        "on the executor's predicted chains (Tables 4.3/4.4)")
    p.add_argument("--iou_threshold", type=float, default=0.5)
    p.add_argument("--calibrate_conf", action="store_true",
                   help="F1-max confidence-threshold calibration before the "
                        "per-step tally")
    p.add_argument("--calibrate_conf_per_function", action="store_true",
                   help="per-FUNCTION F1 operating points instead of one "
                        "global threshold (same_* confidences sit far below "
                        "the filters'); gates both the tally and in-chain "
                        "box propagation")
    p.add_argument("--conf_thresholds", default=None,
                   help="JSON file of pre-fitted conf thresholds "
                        "({function: thr, '__global__': fallback}) to apply "
                        "instead of calibrating in place — use with "
                        "--save_conf_thresholds on a held-in split for "
                        "out-of-sample operating points")
    p.add_argument("--save_conf_thresholds", default=None,
                   help="write the thresholds used for the per-step tally "
                        "to this JSON file for reuse via --conf_thresholds")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard chained inference over all devices "
                        "(replicated params, batch-sharded loop)")
    p.add_argument("--chain_mode", default="sorted",
                   choices=("sorted", "pool", "bucketed", "plain"),
                   help="chained-execution schedule: depth-sorted batches "
                        "(default), continuous-batching slot pool (one "
                        "independent pool per chip under --data_parallel), "
                        "per-depth buckets, or one full-depth batch")
    p.set_defaults(fn=cmd_tally)

    p = sub.add_parser("infer-chain")
    p.add_argument("--annotated_h5", required=True)
    p.add_argument("--features_h5", required=True)
    p.add_argument("--vocab_json", default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--vocab_size", type=int, required=True)
    p.add_argument("--max_steps", type=int, default=28)
    p.add_argument("--limit", type=int, default=10)
    p.add_argument("--output_json", default=None)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard chained inference over all devices "
                        "(replicated params, batch-sharded loop)")
    p.set_defaults(fn=cmd_infer_chain)

    p = sub.add_parser("stats")
    p.add_argument("--annotated_h5", required=True)
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("visualize")
    p.add_argument("--input_scenes_json", required=True)
    p.add_argument("--image_index", type=int, default=0)
    p.add_argument("--image", default=None, help="source PNG (black canvas if absent)")
    p.add_argument("--labels", action="store_true")
    p.add_argument("--output", required=True)
    p.set_defaults(fn=cmd_visualize)

    p = sub.add_parser("inspect")
    p.add_argument("file")
    p.add_argument("-n", type=int, default=2)
    p.set_defaults(fn=cmd_inspect)

    from explainable_spatial_vqa_tpu.cli.repro import add_repro_parser

    add_repro_parser(sub)

    p = sub.add_parser(
        "cogent-protocol",
        help="four-cell CoGenT A->B protocol on synthetic data "
             "(train A -> eval A/B -> fine-tune on B subset -> re-eval)")
    p.add_argument("--scenes_a", type=int, default=80)
    p.add_argument("--scenes_val", type=int, default=20)
    p.add_argument("--scenes_b_pool", type=int, default=40)
    p.add_argument("--questions_per_scene", type=int, default=6)
    p.add_argument("--gen_steps", type=int, default=400)
    p.add_argument("--exe_steps", type=int, default=500)
    p.add_argument("--ft_steps", type=int, default=150)
    p.add_argument("--finetune_images", type=int, default=3000,
                   help="thesis: 3000 (scaled down automatically by pool size)")
    p.add_argument("--finetune_questions", type=int, default=30000,
                   help="thesis: 30000")
    p.add_argument("--noise", type=float, default=0.0)
    p.add_argument("--drop", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--d_model", type=int, default=0,
                   help="executor width (0 = protocol default 96); the "
                        "flagship accuracy recipe uses 192")
    p.add_argument("--encoder_layers", type=int, default=2)
    p.add_argument("--box_roi", action="store_true",
                   help="ROI content injection under input boxes "
                        "(docs/DESIGN.md §11)")
    p.add_argument("--roi_sim", action="store_true",
                   help="content-similarity channel on top of box_roi "
                        "(docs/DESIGN.md §12)")
    p.add_argument("--count_embed", action="store_true",
                   help="input-box-count embedding on CLS "
                        "(docs/DESIGN.md §13)")
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--hop_prob", type=float, default=0.0,
                   help="scene-aware relational hop rate in the corpora")
    p.add_argument("--chain_prob", type=float, default=0.0,
                   help="second-hop chaining rate given a hop")
    p.add_argument("--max_chain_steps", type=int, default=12)
    p.add_argument("--output_json", default=None)
    p.add_argument("--disentangled_features", action="store_true",
                   help="use plain one-hot color channels (no per-shape "
                        "permutation) — color readout is then shape-free and "
                        "NO A->B gap can appear; default is the entangled "
                        "mode that exhibits the Table 4.6 phenomenon")
    p.set_defaults(fn=cmd_cogent_protocol)

    return parser


def main(argv=None) -> None:
    setup_logging()
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        from explainable_spatial_vqa_tpu.parallel.multihost import initialize

        initialize(args.coordinator_address, args.num_processes, args.process_id)
    try:
        args.fn(args)
    except BrokenPipeError:
        # output piped into head/less that exited early — not an error
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), 1)


if __name__ == "__main__":
    main()
