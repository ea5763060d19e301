"""Single-string annotation + mapped-sequences scheme: golden parity."""

import json
import pathlib

import numpy as np

from explainable_spatial_vqa_tpu.clevr import annotate as ann
from explainable_spatial_vqa_tpu.clevr.scenes import Scene
from explainable_spatial_vqa_tpu.core import annotated_strings as astr
from explainable_spatial_vqa_tpu.models import cot

DATA = pathlib.Path(__file__).parent / "data"


def test_single_string_parity(fixture_scene):
    g = json.load(open(DATA / "golden_single_string.json"))
    scene = Scene.from_raw(fixture_scene)
    for q, expected in zip(g["questions"], g["strings"]):
        got = ann.annotate_question_string(q, scene)["annotated_program_string"]
        assert got == expected


def test_mapped_sequences_parity():
    g = json.load(open(DATA / "golden_mapped_sequences.json"))
    arrays, vocab = astr.build_mapped_sequences(g["records"])
    assert vocab == g["token_to_id"]
    np.testing.assert_array_equal(arrays["question_tokens"], np.asarray(g["q_ids"]))
    np.testing.assert_array_equal(arrays["answer_tokens"], np.asarray(g["a_ids"]))
    np.testing.assert_array_equal(arrays["program_tokens"], np.asarray(g["p_ids"]))
    np.testing.assert_array_equal(arrays["image_index"], np.asarray(g["image_index"]))


def test_mapped_sequences_roundtrip(tmp_path):
    g = json.load(open(DATA / "golden_mapped_sequences.json"))
    arrays, _ = astr.build_mapped_sequences(g["records"])
    path = str(tmp_path / "mapped.h5")
    astr.write_mapped_sequences(arrays, path)
    back = astr.read_mapped_sequences(path)
    for key in arrays:
        np.testing.assert_array_equal(back[key], arrays[key])


def test_program_string_tokenizer():
    tokens = astr.parse_program_string("scene[]:(0.494,0.175,0.627,0.375) | count[] 2")
    assert tokens[0] == "scene[]"
    assert ":" in tokens and "(" in tokens and ")" in tokens and "," in tokens
    assert "0.494" in tokens and "|" in tokens


def test_cot_helpers():
    import jax.numpy as jnp

    idx_to_token = {0: "<PAD>", 1: "(", 2: "0.123", 3: "0.456", 4: ",", 5: ")",
                    6: "scene"}
    table = cot.bbox_token_table(idx_to_token, 7)
    np.testing.assert_array_equal(table, [False, False, True, True, False, False, False])

    logits = jnp.zeros((1, 4, 7))
    targets = jnp.asarray([[6, 2, 3, 0]])
    loss = cot.cross_entropy_skip_bbox(logits, targets, table, ignore_index=0)
    # only the 'scene' position contributes: CE = log(7)
    assert np.isclose(float(loss), np.log(7), atol=1e-5)

    seq = [1, 2, 4, 3, 4, 2, 4, 3, 5]  # ( 0.123 , 0.456 , 0.123 , 0.456 )
    boxes = cot.parse_bboxes_from_tokens(seq, idx_to_token)
    assert boxes == [(0.123, 0.456, 0.123, 0.456)]

    metrics = cot.mean_sequential_iou(
        np.asarray([seq]), np.asarray([seq]), idx_to_token
    )
    assert metrics["evaluated"] == 1.0
