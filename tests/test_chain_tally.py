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


def test_tally_per_function_threshold_mapping():
    """A {base function -> thr} mapping gates each step by ITS function's
    threshold; a constant mapping equals the scalar exactly; lowering only
    one function's bar recovers only that function's boxes."""
    run_out = _run_out(True)
    # push filter_color's confidence below the global bar
    run_out["conf_cache"][0, 1, 0] = 0.3
    scalar = tally_predicted_chains(
        run_out, _annotated(), FUNC_VOCAB, VALUE_VOCAB, conf_threshold=0.5)
    const_map = tally_predicted_chains(
        run_out, _annotated(), FUNC_VOCAB, VALUE_VOCAB,
        conf_threshold={"__global__": 0.5})
    assert scalar.precision_recall() == const_map.precision_recall()
    assert scalar.precision_recall()["filter_color"]["recall"] == 0.0
    per_fn = tally_predicted_chains(
        run_out, _annotated(), FUNC_VOCAB, VALUE_VOCAB,
        conf_threshold={"__global__": 0.5, "filter_color": 0.25})
    pr = per_fn.precision_recall()
    assert pr["filter_color"] == {"precision": 1.0, "recall": 1.0}
    assert pr["scene"] == {"precision": 1.0, "recall": 1.0}


def test_calibrate_per_function_recovers_split_thresholds():
    """Two functions with disjoint confidence regimes: the global threshold
    must compromise, the per-function calibrator finds each one's operating
    point (and small-n functions fall back to global)."""
    from explainable_spatial_vqa_tpu.evalsuite.executor_eval import (
        build_conf_threshold_vector,
        calibrate_chain_conf_thresholds_per_function,
    )

    rng = np.random.RandomState(0)
    records = []
    n_q, q = 60, 4
    box_cache = np.zeros((n_q, 2, q, 4), np.float32)
    conf_cache = np.zeros((n_q, 2, q), np.float32)
    for i in range(n_q):
        # step 0: scene, high-confidence regime — TPs at ~0.9, FPs at ~0.7
        gt0 = [[0.1, 0.1, 0.3, 0.3]]
        box_cache[i, 0, 0] = gt0[0]
        conf_cache[i, 0, 0] = 0.9 + 0.05 * rng.rand()
        box_cache[i, 0, 1] = [0.6, 0.6, 0.9, 0.9]  # miss
        conf_cache[i, 0, 1] = 0.7 + 0.05 * rng.rand()
        # step 1: same_color, LOW-confidence regime — TPs at ~0.3, FPs ~0.1
        gt1 = [[0.4, 0.4, 0.6, 0.6]]
        box_cache[i, 1, 0] = gt1[0]
        conf_cache[i, 1, 0] = 0.30 + 0.05 * rng.rand()
        box_cache[i, 1, 1] = [0.0, 0.6, 0.2, 0.9]  # miss
        conf_cache[i, 1, 1] = 0.10 + 0.05 * rng.rand()
        records.append({
            "image_index": i,
            "annotated_program": [
                {"function": "scene[]", "inputs": [],
                 "output_values": "[0.1 0.1 0.3 0.3]"},
                {"function": "same_color[]", "inputs": [0],
                 "output_values": "[0.4 0.4 0.6 0.6]"},
            ],
        })
    vocab = {"scene[]": 0, "same_color[]": 1}
    run_out = {
        "box_cache": box_cache, "conf_cache": conf_cache,
        "token_cache": np.zeros((n_q, 2), np.int32),
        "token_branch": np.zeros((n_q, 2), bool),
    }
    thr_map, f1_map = calibrate_chain_conf_thresholds_per_function(
        run_out, records, vocab, VALUE_VOCAB, min_preds=20)
    # each function's operating point separates its own TPs (conf >= thr)
    # from its FPs (conf < thr): scene TPs live in [0.90, 0.95), FPs in
    # [0.70, 0.75); same_color TPs in [0.30, 0.35), FPs in [0.10, 0.15)
    assert 0.749 < thr_map["scene"] <= 0.9
    assert 0.149 < thr_map["same_color"] <= 0.3
    assert f1_map["scene"] == 1.0 and f1_map["same_color"] == 1.0
    assert "__global__" in thr_map

    # tally with the map: both functions perfect; with the global scalar:
    # same_color recall 0
    tally = tally_predicted_chains(
        run_out, records, vocab, VALUE_VOCAB, conf_threshold=thr_map)
    pr = tally.precision_recall()
    assert pr["same_color"] == {"precision": 1.0, "recall": 1.0}
    assert pr["scene"] == {"precision": 1.0, "recall": 1.0}

    # vector for the chain runners: fused keys map through base names
    vec = build_conf_threshold_vector(vocab, thr_map, default=0.5)
    assert vec.shape == (2,)
    assert abs(vec[0] - thr_map["scene"]) < 1e-6
    assert abs(vec[1] - thr_map["same_color"]) < 1e-6

    # min_preds fallback: a function below the floor keeps the global
    thr_map2, _ = calibrate_chain_conf_thresholds_per_function(
        run_out, records, vocab, VALUE_VOCAB, min_preds=10_000)
    assert "scene" not in thr_map2 and "same_color" not in thr_map2
