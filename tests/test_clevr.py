"""Symbolic executor / bbox / annotation parity tests against golden outputs
captured from the reference implementation."""

import numpy as np
import pytest

from explainable_spatial_vqa_tpu.clevr import annotate as ann
from explainable_spatial_vqa_tpu.clevr import bboxes as bb
from explainable_spatial_vqa_tpu.clevr.executor import INVALID, execute_program
from explainable_spatial_vqa_tpu.clevr.scenes import Scene


def test_bbox_parity_4dec(golden, fixture_scene):
    boxes = bb.scene_bounding_boxes(fixture_scene, decimals=4)
    expected = np.array(golden["scene_bboxes_4dec"])
    np.testing.assert_allclose(boxes, expected, atol=1e-12)


def test_bbox_parity_1dec(golden, fixture_scene):
    boxes = bb.scene_bounding_boxes(fixture_scene, decimals=1)
    expected = np.array(golden["scene_bboxes_1dec"])
    np.testing.assert_allclose(boxes, expected, atol=1e-12)


def test_bbox_single_object(golden, fixture_scene):
    obj = fixture_scene["objects"][0]
    box = bb.approximate_bounding_box(obj, fixture_scene, decimals=4)
    assert list(box) == list(golden["scene_bboxes_4dec"][0])


def test_executor_val_program(fixture_scene, fixture_val_question):
    scene = Scene.from_raw(fixture_scene)
    outputs = execute_program(scene, fixture_val_question["program"])
    # program: scene -> filter_size[large] -> filter_material[metal] -> unique
    #          -> same_shape -> exist; answer is "no"
    assert outputs[-1] is False


def test_executor_invalid_shortcircuit(fixture_scene):
    scene = Scene.from_raw(fixture_scene)
    program = [
        {"function": "scene", "inputs": [], "value_inputs": []},
        {"function": "unique", "inputs": [0], "value_inputs": []},  # 5 objects -> INVALID
        {"function": "query_color", "inputs": [1], "value_inputs": []},
    ]
    outputs = execute_program(scene, program)
    assert outputs[-1] == INVALID
    assert len(outputs) == 2  # short-circuit: query never ran


def test_annotation_parity_val(golden, fixture_scene, fixture_val_question):
    scene = Scene.from_raw(fixture_scene)
    annotated = ann.annotate_question(fixture_val_question, scene)
    assert [annotated] == golden["annotated_val"]


def test_annotation_parity_synthetic(golden_synthetic, fixture_scene):
    """Covers relate/union/intersect/count/query/equal/less/greater plus the
    INVALID positional-poisoning semantics."""
    scene = Scene.from_raw(fixture_scene)
    annotated = [ann.annotate_question(q, scene) for q in golden_synthetic["questions"]]
    assert annotated == golden_synthetic["annotated"]


def test_annotate_questions_sweep(golden_synthetic, fixture_scene):
    scenes = {0: Scene.from_raw(fixture_scene)}
    out = ann.annotate_questions(golden_synthetic["questions"], scenes, num_workers=0)
    assert out == golden_synthetic["annotated"]


def test_annotate_questions_parallel(golden_synthetic, fixture_scene):
    scenes = {0: Scene.from_raw(fixture_scene)}
    out = ann.annotate_questions(golden_synthetic["questions"], scenes, num_workers=2)
    assert out == golden_synthetic["annotated"]


def test_label_map():
    names, label_to_id = bb.generate_label_map()
    assert len(names) == 96
    assert names == sorted(names)
    assert min(label_to_id.values()) == 1
    assert max(label_to_id.values()) == 96


def test_export_scenes(fixture_scene):
    out = bb.export_scenes([fixture_scene])
    assert out["bounding_boxes"].shape == (1, 5, 4)
    assert out["class_labels"].shape == (1, 5)
    assert (out["class_labels"] > 0).all()
    assert out["image_index"][0] == fixture_scene["image_index"]


def test_full_annotation_parity(fixture_scene):
    """full_annotation variant: 1-dec boxes, joint vocab, input-step grounding."""
    import copy
    import json
    import pathlib

    from explainable_spatial_vqa_tpu.core import vocab as voc

    g = json.load(open(pathlib.Path(__file__).parent / "data" / "golden_full_annotation.json"))
    scene = Scene.from_raw(fixture_scene)
    mine = [ann.annotate_question_full(q, scene) for q in g["questions"]]
    assert mine == g["annotated"]
    vocab = voc.build_joint_vocab(mine)
    assert vocab == g["joint_vocab"]
    converted = [voc.apply_joint_vocab(copy.deepcopy(a), vocab) for a in mine]
    assert converted == g["converted"]
