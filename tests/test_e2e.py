"""Minimum end-to-end slice (SURVEY.md §7): fixtures -> vocab -> questions h5
-> annotation -> executor training -> chained inference -> faithfulness tally,
all through the CLI/pipeline layer on a tiny synthetic dataset."""

import json
import pathlib

import numpy as np
import pytest

from explainable_spatial_vqa_tpu.cli.main import main as cli_main

DATA = pathlib.Path(__file__).parent / "data"
REF = pathlib.Path("/root/reference/code")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Assemble a miniature CLEVR layout from fixtures + synthetic programs."""
    root = tmp_path_factory.mktemp("e2e")
    golden = json.load(open(DATA / "golden_synthetic.json"))
    scene = json.load(open(REF / "inspecting_scripts" / "CLEVR_val_scenes_first.json"))[
        "scenes"
    ][0]
    real_q = json.load(
        open(REF / "inspecting_scripts" / "CLEVR_val_questions_first.json")
    )["questions"][0]
    questions = golden["questions"] + [real_q]

    scenes_path = root / "scenes.json"
    questions_path = root / "questions.json"
    json.dump({"scenes": [scene]}, open(scenes_path, "w"))
    json.dump({"questions": questions}, open(questions_path, "w"))

    # run the CLI prep stages once so every test is independent
    cli_main([
        "build-vocab", "--inputs", str(questions_path),
        "--output", str(root / "vocab.json"),
    ])
    cli_main([
        "preprocess-questions",
        "--input_questions_json", str(questions_path),
        "--input_vocab_json", str(root / "vocab.json"),
        "--output_h5_file", str(root / "questions.h5"),
    ])
    cli_main([
        "annotate", "--mode", "full",
        "--scenes", str(scenes_path),
        "--questions", str(questions_path),
        "--output_h5", str(root / "annotated.h5"),
        "--vocab_output", str(root / "joint_vocab.json"),
    ])

    # synthetic features artifact (1 image, reference layout 1024x14x14 is
    # shrunk to 64x4x4 via a matching model config in the training test)
    import h5py

    with h5py.File(root / "features.h5", "w") as f:
        f.create_dataset(
            "features", data=np.random.RandomState(0).rand(1, 64, 4, 4).astype(np.float32)
        )
    return root


def test_cli_vocab_and_questions(workdir):
    cli_main([
        "build-vocab", "--inputs", str(workdir / "questions.json"),
        "--output", str(workdir / "vocab.json"),
    ])
    vocab = json.load(open(workdir / "vocab.json"))
    assert vocab["program_token_to_idx"]["<NULL>"] == 0

    cli_main([
        "preprocess-questions",
        "--input_questions_json", str(workdir / "questions.json"),
        "--input_vocab_json", str(workdir / "vocab.json"),
        "--output_h5_file", str(workdir / "questions.h5"),
    ])
    from explainable_spatial_vqa_tpu.core.artifacts import read_questions_h5

    enc = read_questions_h5(str(workdir / "questions.h5"))
    assert enc.questions.shape[0] == 9
    assert enc.programs is not None


def test_cli_annotate_full(workdir):
    cli_main([
        "annotate", "--mode", "full",
        "--scenes", str(workdir / "scenes.json"),
        "--questions", str(workdir / "questions.json"),
        "--output_h5", str(workdir / "annotated.h5"),
        "--vocab_output", str(workdir / "joint_vocab.json"),
    ])
    from explainable_spatial_vqa_tpu.core.artifacts import read_annotated_h5

    annotated = read_annotated_h5(str(workdir / "annotated.h5"))
    assert len(annotated) == 9
    assert all("annotated_program" in q for q in annotated)


def test_cli_annotate_v3(workdir):
    cli_main([
        "annotate", "--mode", "v3",
        "--scenes", str(workdir / "scenes.json"),
        "--questions", str(workdir / "questions.json"),
        "--output_h5", str(workdir / "annotated_v3.h5"),
        "--vocab_output", str(workdir / "split_vocab.json"),
        "--raw_json", str(workdir / "annotated_raw.json"),
    ])
    vocabs = json.load(open(workdir / "split_vocab.json"))
    assert set(vocabs) == {"function", "other"}


def test_cli_train_step_seq2seq(workdir):
    """Train the step executor for 2 epochs on the mini slice end-to-end."""
    import dataclasses

    from explainable_spatial_vqa_tpu.core.config import (
        StepSeq2SeqConfig,
        get_preset,
    )
    from explainable_spatial_vqa_tpu.train.pipelines import build_pipeline
    from explainable_spatial_vqa_tpu.train.trainer import Trainer

    config = get_preset("step_seq2seq")
    config = config.replace(
        model=StepSeq2SeqConfig(
            vocab_size=64, d_model=16, num_heads=2, encoder_layers=1,
            decoder_layers=1, ffn_dim=32, max_src_len=32, max_tgt_len=10,
            num_image_tokens=16, image_feature_dim=64,
        ),
        data=dataclasses.replace(
            config.data,
            annotated_h5=str(workdir / "annotated.h5"),
            features_h5=str(workdir / "features.h5"),
            validation_split=0.3, test_split=0.2,
        ),
        train=dataclasses.replace(
            config.train, batch_size=8, num_epochs=2, log_every=0,
            checkpoint_interval=100,
        ),
    )
    pipeline = build_pipeline(config)
    trainer = Trainer(
        pipeline.loss_fn, pipeline.params, config.optim, config.train,
        checkpoint_dir=str(workdir / "ckpt"),
    )
    history = trainer.fit(pipeline.train_batches, pipeline.val_batches,
                          monitor=pipeline.monitor, num_epochs=2)
    assert len(history["train"]) == 2
    assert np.isfinite(history["train"][-1]["loss_sum"])
    trainer.store.close()


def test_cli_inspect(workdir, capsys):
    cli_main(["inspect", str(workdir / "features.h5"), "-n", "1"])
    out = capsys.readouterr().out
    assert "features" in out


def test_cli_infer_chain(workdir, tmp_path):
    """Chained inference through the CLI on the mini slice (random weights)."""
    vocab = json.load(open(workdir / "joint_vocab.json"))
    out_json = str(tmp_path / "chain_results.json")
    cli_main([
        "infer-chain",
        "--annotated_h5", str(workdir / "annotated.h5"),
        "--features_h5", str(workdir / "features.h5"),
        "--vocab_json", str(workdir / "joint_vocab.json"),
        "--vocab_size", str(len(vocab) + 16),
        "--max_steps", "12",
        "--limit", "4",
        "--output_json", out_json,
    ])
    results = json.load(open(out_json))
    assert len(results) == 4
    assert all("predicted_ids" in r for r in results)


def test_cot_pipeline(workdir):
    """CoT (bbox-as-tokens) family trains one step on the string-mode slice."""
    import dataclasses

    from explainable_spatial_vqa_tpu.core.config import IQAPConfig, get_preset
    from explainable_spatial_vqa_tpu.train.pipelines import build_pipeline
    from explainable_spatial_vqa_tpu.train.trainer import Trainer

    # string-mode artifacts
    cli_main([
        "annotate", "--mode", "string",
        "--scenes", str(workdir / "scenes.json"),
        "--questions", str(workdir / "questions.json"),
        "--output_h5", str(workdir / "mapped.h5"),
        "--vocab_output", str(workdir / "string_vocab.json"),
    ])
    config = get_preset("transformer_iqap_cot")
    config = config.replace(
        model=IQAPConfig(
            embed_dim=16, hidden_dim=16, num_heads=2, encoder_layers=1,
            decoder_layers=1, num_image_tokens=16, image_feature_dim=64,
            program_len=100, max_question_len=20, dropout=0.0,
        ),
        data=dataclasses.replace(
            config.data,
            mapped_sequences_h5=str(workdir / "mapped.h5"),
            string_vocab_json=str(workdir / "string_vocab.json"),
            features_h5=str(workdir / "features.h5"),
            validation_split=0.3, test_split=0.2,
        ),
        train=dataclasses.replace(config.train, batch_size=2, num_epochs=1,
                                  log_every=0, checkpoint_interval=100,
                                  mesh_shape=(1,)),
    )
    pipeline = build_pipeline(config)
    trainer = Trainer(pipeline.loss_fn, pipeline.params, config.optim, config.train,
                      checkpoint_dir=False)
    history = trainer.fit(pipeline.train_batches, pipeline.val_batches,
                          monitor=pipeline.monitor, num_epochs=1)
    assert np.isfinite(history["train"][0]["loss_sum"])


def test_cli_stats(workdir, capsys):
    cli_main(["stats", "--annotated_h5", str(workdir / "annotated.h5")])
    out = json.loads(capsys.readouterr().out)
    assert out["questions"] == 9
    # converted records hold vocab ids (bbox text already id-mapped), so box
    # counts apply to raw annotation files; token/step stats still hold here
    assert out["max_steps"] >= 3
    assert out["function_vocab_size"] > 0
    assert out["token_output_steps"] > 0


def test_cli_tally(workdir, capsys):
    """Full-pipeline tally on the mini slice (random weights; exercises the
    generator -> parse -> chain -> quadrant wiring end-to-end)."""
    cli_main([
        "annotate", "--mode", "v3",
        "--scenes", str(workdir / "scenes.json"),
        "--questions", str(workdir / "questions.json"),
        "--output_h5", str(workdir / "annot_v3_tally.h5"),
        "--vocab_output", str(workdir / "vocab3.json"),
    ])
    # features at the reference 1024x14x14 layout are too heavy for a unit
    # test; regenerate matching the executor preset dims scaled down via env?
    # The tally command derives model dims from presets (1024x196), so build
    # a matching tiny features file instead.
    import h5py

    with h5py.File(workdir / "features_full.h5", "w") as f:
        f.create_dataset(
            "features",
            data=np.random.RandomState(0).rand(1, 1024, 14, 14).astype(np.float32),
        )
    cli_main([
        "tally",
        "--questions_h5", str(workdir / "questions.h5"),
        "--features_h5", str(workdir / "features_full.h5"),
        "--vocab_json", str(workdir / "vocab.json"),
        "--split_vocab_json", str(workdir / "vocab3.json"),
        "--limit", "4",
    ])
    out = capsys.readouterr().out
    assert "Faithfulness over 4 samples" in out
    assert "overall" in out
    # --executor_preset builds the roi_sim executor family so checkpoints
    # trained with those presets restore with matching param trees
    cli_main([
        "tally",
        "--questions_h5", str(workdir / "questions.h5"),
        "--features_h5", str(workdir / "features_full.h5"),
        "--vocab_json", str(workdir / "vocab.json"),
        "--split_vocab_json", str(workdir / "vocab3.json"),
        "--executor_preset", "executor_roi_sim",
        "--limit", "2",
    ])
    out = capsys.readouterr().out
    assert "Faithfulness over 2 samples" in out


def test_cli_eval_generator(workdir, capsys):
    cli_main([
        "eval-generator",
        "--questions_h5", str(workdir / "questions.h5"),
        "--preset", "lstm_qp",
        "--vocab_json", str(workdir / "vocab.json"),
        "--limit", "4", "--batch_size", "4", "--show", "2",
    ])
    out = capsys.readouterr().out
    assert "exact_match" in out
    assert "pred:" in out


def test_cli_eval_iqap(workdir, capsys, tmp_path):
    out_json = str(tmp_path / "iqap_results.json")
    cli_main([
        "eval-iqap",
        "--questions_h5", str(workdir / "questions.h5"),
        "--features_h5", str(workdir / "features.h5"),
        "--vocab_json", str(workdir / "vocab.json"),
        "--limit", "4",
        "--output_json", out_json,
    ])
    report = json.load(open(out_json))
    assert report["summary"]["samples"] == 4
    assert "answer_accuracy" in report["summary"]
    assert "predicted_program" in report["results"][0]


def test_iqap_bb_pipeline(workdir):
    """iqap_bb family trains one step with GT boxes from the scenes artifact."""
    import dataclasses

    from explainable_spatial_vqa_tpu.core.config import IQAPConfig, get_preset
    from explainable_spatial_vqa_tpu.train.pipelines import build_pipeline
    from explainable_spatial_vqa_tpu.train.trainer import Trainer

    cli_main([
        "export-scenes",
        "--input_scenes_json", str(workdir / "scenes.json"),
        "--output_h5_file", str(workdir / "scenes.h5"),
    ])
    config = get_preset("transformer_iqap_bb")
    config = config.replace(
        model=IQAPConfig(
            embed_dim=16, hidden_dim=16, num_heads=2, encoder_layers=1,
            decoder_layers=1, num_image_tokens=16, image_feature_dim=64,
            program_len=27, max_question_len=46, dropout=0.0,
            with_bbox_head=True, num_bbox_slots=5,
        ),
        data=dataclasses.replace(
            config.data,
            questions_h5=str(workdir / "questions.h5"),
            features_h5=str(workdir / "features.h5"),
            scenes_h5=str(workdir / "scenes.h5"),
            validation_split=0.3, test_split=0.2,
        ),
        train=dataclasses.replace(config.train, batch_size=2, num_epochs=1,
                                  log_every=0, checkpoint_interval=100,
                                  mesh_shape=(1,)),
    )
    pipeline = build_pipeline(config)
    trainer = Trainer(pipeline.loss_fn, pipeline.params, config.optim, config.train,
                      checkpoint_dir=False)
    history = trainer.fit(pipeline.train_batches, pipeline.val_batches,
                          monitor=pipeline.monitor, num_epochs=1)
    assert np.isfinite(history["train"][0]["loss_sum"])
    assert "iou_sum" in history["train"][0]


def test_cli_visualize(workdir, tmp_path):
    out = str(tmp_path / "scene.png")
    cli_main([
        "visualize", "--input_scenes_json", str(workdir / "scenes.json"),
        "--image_index", "0", "--labels", "--output", out,
    ])
    import os

    assert os.path.getsize(out) > 0


@pytest.mark.slow
def test_real_fixture_full_chain_trainability(workdir, tmp_path, capsys):
    """Round-2 verdict item 10: the complete artifact chain on the real CLEVR
    fixture data — extract real-shape features -> train the THESIS generator
    and executor presets briefly -> faithfulness tally with per-step box P/R
    and confidence calibration — all through the CLI, end-to-end."""
    from PIL import Image

    # one real-sized image for the fixture scene (no CLEVR pixels in the
    # sandbox; random pixels stand in — shapes and plumbing are what's pinned)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (320, 480, 3), np.uint8)).save(
        img_dir / "CLEVR_val_000000.png"
    )
    cli_main([
        "--platform", "cpu", "extract-features",
        "--input_image_dir", str(img_dir),
        "--output_h5_file", str(tmp_path / "features_full.h5"),
        "--batch_size", "1",
    ])
    import h5py

    with h5py.File(tmp_path / "features_full.h5") as f:
        assert f["features"].shape == (1, 1024, 14, 14)  # reference layout

    # v3 annotation artifacts for the executor
    cli_main([
        "annotate", "--mode", "v3",
        "--scenes", str(workdir / "scenes.json"),
        "--questions", str(workdir / "questions.json"),
        "--output_h5", str(tmp_path / "annotated_v3.h5"),
        "--vocab_output", str(tmp_path / "split_vocab.json"),
    ])

    # brief thesis-preset training for both learned components (batch 8 =
    # the virtual mesh's data-axis size; the 9 fixture questions are tiled
    # so the generator gets full batches)
    rep = json.load(open(workdir / "questions.json"))
    rep_path = tmp_path / "questions_rep.json"
    json.dump({"questions": rep["questions"] * 8}, open(rep_path, "w"))
    cli_main([
        "preprocess-questions",
        "--input_questions_json", str(rep_path),
        "--input_vocab_json", str(workdir / "vocab.json"),
        "--output_h5_file", str(tmp_path / "questions_rep.h5"),
    ])
    cli_main([
        "--platform", "cpu", "train", "--preset", "generator",
        "--questions_h5", str(tmp_path / "questions_rep.h5"),
        "--epochs", "2", "--batch_size", "8",
        "--checkpoint_dir", str(tmp_path / "gen_ckpt"),
    ])
    cli_main([
        "--platform", "cpu", "train", "--preset", "executor",
        "--annotated_h5", str(tmp_path / "annotated_v3.h5"),
        "--split_vocab_json", str(tmp_path / "split_vocab.json"),
        "--features_h5", str(tmp_path / "features_full.h5"),
        "--epochs", "1", "--batch_size", "8",
        "--checkpoint_dir", str(tmp_path / "exe_ckpt"),
    ])

    # full tally: quadrants + per-step box P/R with calibrated threshold,
    # restoring both checkpoints (shape-compatible by construction)
    cli_main([
        "--platform", "cpu", "tally",
        "--questions_h5", str(workdir / "questions.h5"),
        "--features_h5", str(tmp_path / "features_full.h5"),
        "--vocab_json", str(workdir / "vocab.json"),
        "--split_vocab_json", str(tmp_path / "split_vocab.json"),
        "--generator_checkpoint", str(tmp_path / "gen_ckpt"),
        "--executor_checkpoint", str(tmp_path / "exe_ckpt"),
        "--annotated_h5", str(tmp_path / "annotated_v3.h5"),
        "--calibrate_conf",
        "--save_conf_thresholds", str(tmp_path / "thr.json"),
    ])
    out = capsys.readouterr().out
    assert "correct_program_correct_answer" in out
    assert "per_function_box_pr" in out
    assert "conf_threshold" in out
    # saved operating points round-trip: a second tally applies the
    # pre-fitted map instead of calibrating in place (the CLI counterpart
    # of DEMO_CONF_FIT=train's calibrate-on-train / evaluate-on-eval)
    thr_saved = json.load(open(tmp_path / "thr.json"))
    assert "__global__" in thr_saved
    cli_main([
        "--platform", "cpu", "tally",
        "--questions_h5", str(workdir / "questions.h5"),
        "--features_h5", str(tmp_path / "features_full.h5"),
        "--vocab_json", str(workdir / "vocab.json"),
        "--split_vocab_json", str(tmp_path / "split_vocab.json"),
        "--generator_checkpoint", str(tmp_path / "gen_ckpt"),
        "--executor_checkpoint", str(tmp_path / "exe_ckpt"),
        "--annotated_h5", str(tmp_path / "annotated_v3.h5"),
        "--conf_thresholds", str(tmp_path / "thr.json"),
    ])
    out = capsys.readouterr().out
    assert "per_function_box_pr" in out
