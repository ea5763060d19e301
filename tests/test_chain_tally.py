"""Per-step detection tally on predicted chains (verdict item 7): glue from
ExecutorChainRunner outputs to DetectionTally, plus confidence-threshold
calibration over chained predictions."""

import numpy as np

from explainable_spatial_vqa_tpu.evalsuite.executor_eval import (
    calibrate_chain_conf_threshold,
    tally_predicted_chains,
)

FUNC_VOCAB = {"scene[]": 0, "filter_color[red]": 1, "count[]": 2}
VALUE_VOCAB = {"<EMPTY>": 0, "2": 1, "true": 2}


def _annotated():
    return [{
        "image_index": 0,
        "annotated_program": [
            {"function": "scene[]", "inputs": [],
             "output_values": "[0.1 0.1 0.3 0.3] [0.5 0.5 0.7 0.7]"},
            {"function": "filter_color[red]", "inputs": [0],
             "output_values": "[0.1 0.1 0.3 0.3]"},
            {"function": "count[]", "inputs": [1], "output_values": "2"},
        ],
    }]


def _run_out(perfect=True):
    q = 4  # queries per step
    box_cache = np.zeros((1, 3, q, 4), np.float32)
    conf_cache = np.zeros((1, 3, q), np.float32)
    token_cache = np.zeros((1, 3), np.int32)
    token_branch = np.zeros((1, 3), bool)
    if perfect:
        box_cache[0, 0, 0] = [0.1, 0.1, 0.3, 0.3]
        box_cache[0, 0, 1] = [0.5, 0.5, 0.7, 0.7]
        conf_cache[0, 0, :2] = 0.9
        box_cache[0, 1, 0] = [0.1, 0.1, 0.3, 0.3]
        conf_cache[0, 1, 0] = 0.9
        token_cache[0, 2] = VALUE_VOCAB["2"]
        token_branch[0, 2] = True
    else:
        # confident boxes in the wrong place + routing failure on the token
        box_cache[0, 0, 0] = [0.8, 0.8, 0.9, 0.9]
        conf_cache[0, 0, 0] = 0.9
    return {
        "box_cache": box_cache,
        "conf_cache": conf_cache,
        "token_cache": token_cache,
        "token_branch": token_branch,
    }


def test_tally_perfect_chain():
    tally = tally_predicted_chains(
        _run_out(True), _annotated(), FUNC_VOCAB, VALUE_VOCAB, conf_threshold=0.5
    )
    pr = tally.precision_recall()
    assert pr["scene"] == {"precision": 1.0, "recall": 1.0}
    assert pr["filter_color"] == {"precision": 1.0, "recall": 1.0}
    assert tally.token_accuracy()["count"] == 1.0


def test_tally_failed_chain():
    tally = tally_predicted_chains(
        _run_out(False), _annotated(), FUNC_VOCAB, VALUE_VOCAB, conf_threshold=0.5
    )
    pr = tally.precision_recall()
    assert pr["scene"]["precision"] == 0.0
    assert pr["scene"]["recall"] == 0.0
    # box-branch routing failure on a token step counts as wrong (pred = -1)
    assert tally.token_accuracy()["count"] == 0.0


def test_tally_converted_records():
    # vocab-converted records: function = id string, token output = literal
    # numeral (apply_split_vocab passes numerics through verbatim)
    converted = [{
        "image_index": 0,
        "annotated_program": [
            {"function": "0", "inputs": [],
             "output_values": "[0.1 0.1 0.3 0.3] [0.5 0.5 0.7 0.7]"},
            {"function": "1", "inputs": [0],
             "output_values": "[0.1 0.1 0.3 0.3]"},
            {"function": "2", "inputs": [1], "output_values": "2"},
        ],
    }]
    tally = tally_predicted_chains(
        _run_out(True), converted, FUNC_VOCAB, VALUE_VOCAB, conf_threshold=0.5
    )
    assert tally.precision_recall()["scene"]["precision"] == 1.0
    assert tally.token_accuracy()["count"] == 1.0


def test_calibration_picks_separating_threshold():
    # true-positive boxes at conf 0.9, junk boxes at conf 0.2: best F1
    # threshold must land strictly between them
    run_out = _run_out(True)
    run_out["box_cache"][0, 0, 2] = [0.85, 0.85, 0.95, 0.95]  # junk
    run_out["conf_cache"][0, 0, 2] = 0.2
    t, f1 = calibrate_chain_conf_threshold(
        run_out, _annotated(), FUNC_VOCAB, VALUE_VOCAB
    )
    assert 0.2 < t <= 0.9
    assert f1 == 1.0
