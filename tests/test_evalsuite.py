"""Eval suite: faithfulness quadrants, detection P/R, accuracy breakdowns."""

import numpy as np

from explainable_spatial_vqa_tpu.evalsuite.accuracy import (
    answer_accuracy_by_type,
    program_accuracy,
    question_type,
)
from explainable_spatial_vqa_tpu.evalsuite.cogent import CoGenTReport, finetune_subset
from explainable_spatial_vqa_tpu.evalsuite.detection import (
    DetectionTally,
    greedy_box_match,
)
from explainable_spatial_vqa_tpu.evalsuite.faithfulness import tally_faithfulness


def test_faithfulness_quadrants():
    pred_a = np.asarray([1, 1, 2, 2])
    gt_a = np.asarray([1, 2, 2, 1])
    pred_p = np.asarray([[1, 2], [1, 2], [3, 4], [9, 9]])
    gt_p = np.asarray([[1, 2], [1, 2], [9, 9], [9, 9]])
    t = tally_faithfulness(pred_a, gt_a, pred_p, gt_p)
    assert t.both_correct == 1  # sample 0
    assert t.program_only == 2  # samples 1, 3 (program ok, answer wrong)
    assert t.answer_only == 1  # sample 2 (answer ok, program wrong)
    assert t.neither == 0
    assert t.program_only + t.both_correct + t.answer_only + t.neither == 4
    f = t.as_fractions()
    assert abs(sum(f.values()) - 1.0) < 1e-9


def test_faithfulness_mismatched_program_widths():
    """Pred/GT padded to different corpus maxima (e.g. CoGenT cross-split
    scoring) must compare over a common zero-padded width, not crash."""
    pred_a = np.asarray([1, 1])
    gt_a = np.asarray([1, 2])
    pred_p = np.asarray([[5, 6], [5, 6]])  # width 2
    gt_p = np.asarray([[5, 6, 0], [5, 6, 7]])  # width 3
    t = tally_faithfulness(pred_a, gt_a, pred_p, gt_p)
    # row 0: programs equal after zero-padding; row 1: gt has a real 3rd
    # token the narrower prediction could not emit -> program wrong
    assert t.both_correct == 1
    assert t.neither == 1

    # a WIDER prediction's extra real tokens count against it even when a
    # (narrower) program_mask is supplied — mask pads with True, not False
    t2 = tally_faithfulness(
        np.asarray([1]), np.asarray([1]),
        np.asarray([[5, 6, 9]]), np.asarray([[5, 6]]),
        program_mask=np.asarray([[True, True]]),
    )
    assert t2.answer_only == 1  # program wrong: trailing 9 vs pad


def test_question_type():
    assert question_type("count") == "count"
    assert question_type("exist") == "exist"
    assert question_type("greater_than") == "compare_number"
    assert question_type("equal_color") == "compare_attribute"
    assert question_type("query_shape[foo]") == "query_attribute"


def test_answer_accuracy_by_type():
    pred = ["yes", "no", "3", "red"]
    gt = ["yes", "yes", "3", "blue"]
    fns = ["exist", "exist", "count", "query_color"]
    acc = answer_accuracy_by_type(pred, gt, fns)
    assert acc["overall"] == 0.5
    assert acc["exist"] == 0.5
    assert acc["count"] == 1.0
    assert acc["query_attribute"] == 0.0


def test_program_accuracy():
    pred = np.asarray([[1, 2, 0], [1, 3, 0]])
    gt = np.asarray([[1, 2, 0], [1, 2, 0]])
    acc = program_accuracy(pred, gt)
    assert acc["exact_match"] == 0.5
    assert abs(acc["token_acc"] - 5 / 6) < 1e-9
    assert abs(acc["token_acc_nonpad"] - 3 / 4) < 1e-9


def test_greedy_box_match():
    gt = np.asarray([[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]])
    pred_perfect = gt.copy()
    assert greedy_box_match(pred_perfect, gt) == 2
    pred_half = np.asarray([[0.0, 0.0, 0.5, 0.5], [0.0, 0.0, 0.1, 0.1]])
    assert greedy_box_match(pred_half, gt) == 1
    # a single pred cannot claim two GTs
    assert greedy_box_match(gt[:1], gt) == 1
    assert greedy_box_match(np.zeros((0, 4)), gt) == 0


def test_detection_tally():
    tally = DetectionTally()
    gt = np.asarray([[0.0, 0.0, 0.5, 0.5]])
    tally.add_box_step("filter_size[large]", gt, gt)
    tally.add_box_step("filter_size[small]", np.zeros((1, 4)), gt)
    pr = tally.precision_recall()
    assert pr["filter_size"]["precision"] == 0.5
    assert pr["filter_size"]["recall"] == 0.5
    tally.add_token_step("count", 3, 3)
    tally.add_token_step("count", 2, 3)
    assert tally.token_accuracy()["count"] == 0.5
    assert "filter_size" in tally.report()


def test_cogent_helpers():
    image_indices = np.repeat(np.arange(100), 12)  # 100 images x 12 questions
    subset = finetune_subset(image_indices, num_images=10, num_questions=50)
    assert len(subset) == 50
    assert np.isin(image_indices[subset], np.arange(10)).all()
    report = CoGenTReport(a_zero_shot=0.713, b_zero_shot=0.603)
    assert "71.3" in report.report() and "60.3" in report.report()


def test_data_efficiency_sweep():
    from explainable_spatial_vqa_tpu.evalsuite import data_efficiency_sweep

    result = data_efficiency_sweep(lambda f: f * 2, fractions=(0.1, 0.5))
    assert result == {0.1: 0.2, 0.5: 1.0}


def test_plot_history(tmp_path):
    from explainable_spatial_vqa_tpu.utils.plots import history_curves, plot_history

    history = {
        "train": [{"loss_sum": 4.0, "batches": 2.0, "token_correct": 5, "token_total": 10},
                  {"loss_sum": 2.0, "batches": 2.0, "token_correct": 8, "token_total": 10}],
        "val": [{"loss_sum": 3.0, "batches": 1.0}],
    }
    curves = history_curves(history)
    assert curves["train"] == [2.0, 1.0]
    out = plot_history(history, str(tmp_path / "curves.png"))
    assert out is not None
    import os
    assert os.path.getsize(out) > 0


def test_executor_eval_driver():
    import jax
    import jax.numpy as jnp

    from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
    from explainable_spatial_vqa_tpu.evalsuite.executor_eval import evaluate_executor_steps
    from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor

    cfg = ExecutorConfig(
        vocab_size=16, d_model=32, num_heads=2, encoder_layers=1, box_decoder_layers=1,
        num_queries=3, num_image_tokens=4, image_feature_dim=8, max_input_boxes=3,
        token_classes=8,
    )
    model = ProgramExecutor(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(4, 4, 8).astype(np.float32),
        "input_boxes": rng.rand(4, 3, 4).astype(np.float32),
        "input_box_mask": np.ones((4, 3), bool),
        "text": np.asarray([[1, 0, 0]] * 2 + [[2, 0, 0]] * 2, np.int32),
        "text_mask": np.ones((4, 3), bool),
        "target_boxes": rng.rand(4, 3, 4).astype(np.float32),
        "target_box_mask": np.asarray([[1, 1, 0]] * 4, bool),
        "token_target": np.asarray([0, 0, 3, 5], np.int32),
        "is_box_branch": np.asarray([True, True, False, False]),
    }
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
        jnp.asarray(batch["input_boxes"]), jnp.asarray(batch["input_box_mask"]),
        jnp.asarray(batch["text"]), jnp.asarray(batch["text_mask"]),
    )
    tally = evaluate_executor_steps(
        model, variables, [batch], {1: "filter_size[large]", 2: "count"},
    )
    pr = tally.precision_recall()
    assert "filter_size" in pr
    assert "count" in tally.token_accuracy()


def test_calibrate_conf_threshold():
    from explainable_spatial_vqa_tpu.evalsuite.detection import calibrate_conf_threshold

    conf = np.asarray([0.9, 0.8, 0.7, 0.3, 0.2, 0.1])
    tp = np.asarray([True, True, True, False, False, False])
    threshold, f1 = calibrate_conf_threshold(conf, tp)
    assert 0.3 < threshold <= 0.7
    assert f1 == 1.0


def test_assemble_report():
    from explainable_spatial_vqa_tpu.evalsuite.cogent import CoGenTReport
    from explainable_spatial_vqa_tpu.evalsuite.report import assemble_report

    tally = DetectionTally()
    gt = np.asarray([[0.0, 0.0, 0.5, 0.5]])
    tally.add_box_step("filter_size[large]", gt, gt)
    tally.add_token_step("exist", 1, 1)
    faith = tally_faithfulness(
        np.asarray([1, 2]), np.asarray([1, 1]),
        np.asarray([[1], [2]]), np.asarray([[1], [1]]),
    )
    report = assemble_report(
        "unit",
        answer_accuracy={"overall": 0.703, "count": 0.694, "exist": 0.751,
                         "compare_number": 0.653, "compare_attribute": 0.649,
                         "query_attribute": 0.711},
        detection=tally,
        faithfulness=faith,
        cogent=CoGenTReport(0.713, 0.603, 0.667, 0.642),
        extra={"qa_pairs_per_sec_per_chip": 1982.7},
    )
    assert "70.3" in report and "filter_size" in report
    assert "Correct | Correct" in report
    assert "71.3" in report and "60.3" in report
    assert "1982.7" in str(report)
