"""Fuzz parity against the LIVE reference implementation (oracle).

Where golden files pin parity on fixed fixtures, these tests run the mounted
reference modules directly over many randomized synthetic scenes/programs and
demand byte-identical annotation records from our pipelines.  Skipped when
the reference mount is absent.
"""

import copy
import importlib.util
import json
import os
import sys
import tempfile

import numpy as np
import pytest

from explainable_spatial_vqa_tpu.clevr import annotate as ann
from explainable_spatial_vqa_tpu.clevr import synthetic as syn
from explainable_spatial_vqa_tpu.clevr.scenes import Scene
from explainable_spatial_vqa_tpu.core import vocab as voc

REF = "/root/reference/code"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount unavailable"
)


@pytest.fixture(scope="module")
def oracle():
    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    return {
        "v3": load("o_v3", f"{REF}/preprocess_scenes/preprocess_continousv3.py"),
        "full": load("o_pfa", f"{REF}/preprocess_scenes/preprocess_full_annotation.py"),
        "string": load("o_pss", f"{REF}/preprocess_scenes/preprocess_into_single_string.py"),
    }


def _ref_annotate(mod, fn_name, scene_raw, questions):
    with tempfile.TemporaryDirectory() as td:
        sp, qp = os.path.join(td, "s.json"), os.path.join(td, "q.json")
        json.dump({"scenes": [scene_raw]}, open(sp, "w"))
        json.dump({"questions": questions}, open(qp, "w"))
        return getattr(mod, fn_name)(sp, qp)


def _corpus(seed, scenes=6, per_scene=5):
    scenes_raw, questions = syn.synthesize_dataset(scenes, per_scene, seed=seed)
    by_scene = {}
    for q in questions:
        by_scene.setdefault(q["image_index"], []).append(q)
    return scenes_raw, by_scene


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_v3_annotation_fuzz_parity(oracle, seed):
    scenes_raw, by_scene = _corpus(seed)
    for raw in scenes_raw:
        questions = by_scene.get(raw["image_index"], [])
        if not questions:
            continue
        expected = _ref_annotate(
            oracle["v3"], "annotate_questions_with_relevant_objects", raw, questions
        )
        scene = Scene.from_raw(raw)
        mine = [ann.annotate_question(q, scene) for q in questions]
        assert mine == expected
        # vocab + conversion parity on this corpus
        ref_vocab = oracle["v3"].build_vocab_from_dataset(expected)
        assert voc.build_split_vocab(mine) == ref_vocab
        ref_conv = [oracle["v3"].apply_vocab(copy.deepcopy(a), ref_vocab)
                    for a in expected]
        my_conv = [voc.apply_split_vocab(copy.deepcopy(a), ref_vocab) for a in mine]
        assert my_conv == ref_conv


@pytest.mark.parametrize("seed", [21, 22])
def test_full_annotation_fuzz_parity(oracle, seed):
    scenes_raw, by_scene = _corpus(seed)
    for raw in scenes_raw:
        questions = by_scene.get(raw["image_index"], [])
        if not questions:
            continue
        expected = _ref_annotate(
            oracle["full"], "annotate_questions_with_relevant_objects", raw, questions
        )
        scene = Scene.from_raw(raw)
        mine = [ann.annotate_question_full(q, scene) for q in questions]
        assert mine == expected
        assert voc.build_joint_vocab(mine) == oracle["full"].build_vocab_from_dataset(expected)


@pytest.mark.parametrize("seed", [31, 32])
def test_single_string_fuzz_parity(oracle, seed):
    scenes_raw, by_scene = _corpus(seed)
    for raw in scenes_raw:
        questions = by_scene.get(raw["image_index"], [])
        if not questions:
            continue
        expected = _ref_annotate(
            oracle["string"], "annotate_questions_autoregressive_string", raw, questions
        )
        scene = Scene.from_raw(raw)
        for q, exp in zip(questions, expected):
            got = ann.annotate_question_string(q, scene)["annotated_program_string"]
            assert got == exp["annotated_program_string"]


@pytest.mark.parametrize("seed", [41, 42])
def test_v3_rich_program_fuzz_parity(oracle, seed):
    """Richer programs (relate/union/intersect/same_*/compare + INVALID
    cascades) from the type-aware generator, against the live oracle."""
    from tests.test_native import _random_program

    rng = np.random.RandomState(seed)
    scenes_raw, _ = _corpus(seed, scenes=3, per_scene=1)
    for raw in scenes_raw:
        questions = []
        for i in range(12):
            questions.append({
                "image_index": raw["image_index"], "question": f"fuzz {i}",
                "question_index": i, "image_filename": raw["image_filename"],
                "split": "val", "question_family_index": 0, "answer": "yes",
                "program": _random_program(rng),
            })
        expected = _ref_annotate(
            oracle["v3"], "annotate_questions_with_relevant_objects", raw, questions
        )
        scene = Scene.from_raw(raw)
        mine = [ann.annotate_question(q, scene) for q in questions]
        assert mine == expected


@pytest.fixture(scope="module")
def oracle_v12():
    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    return {
        "v1": load("o_v1", f"{REF}/preprocess_scenes/preprocess_continous.py"),
        "v2": load("o_v2", f"{REF}/preprocess_scenes/preprocess_continousv2.py"),
    }


@pytest.mark.parametrize("seed", [51, 52])
def test_v1_annotation_fuzz_parity(oracle_v12, seed):
    """continous v1: input-step grounding with fixed-4 boxes + joint
    bbox-excluded vocab."""
    scenes_raw, by_scene = _corpus(seed)
    for raw in scenes_raw:
        questions = by_scene.get(raw["image_index"], [])
        if not questions:
            continue
        expected = _ref_annotate(
            oracle_v12["v1"], "annotate_questions_with_relevant_objects", raw, questions
        )
        scene = Scene.from_raw(raw)
        mine = [ann.annotate_question_full(q, scene, style="fixed4") for q in questions]
        assert mine == expected
        ref_vocab = oracle_v12["v1"].build_vocab_from_dataset(expected)
        assert voc.build_joint_noboxes_vocab(mine) == ref_vocab
        ref_conv = [oracle_v12["v1"].apply_vocab(copy.deepcopy(a), ref_vocab)
                    for a in expected]
        my_conv = [voc.apply_joint_noboxes_vocab(copy.deepcopy(a), ref_vocab)
                   for a in mine]
        assert my_conv == ref_conv


@pytest.mark.parametrize("seed", [61])
def test_v2_annotation_fuzz_parity(oracle_v12, seed):
    """continous v2: v3-style records + joint bbox-excluded vocab."""
    scenes_raw, by_scene = _corpus(seed)
    for raw in scenes_raw:
        questions = by_scene.get(raw["image_index"], [])
        if not questions:
            continue
        expected = _ref_annotate(
            oracle_v12["v2"], "annotate_questions_with_relevant_objects", raw, questions
        )
        scene = Scene.from_raw(raw)
        mine = [ann.annotate_question(q, scene) for q in questions]
        assert mine == expected
        ref_vocab = oracle_v12["v2"].build_vocab_from_dataset(expected)
        assert voc.build_joint_noboxes_vocab(mine) == ref_vocab
        my_conv = [voc.apply_joint_noboxes_vocab(copy.deepcopy(a), ref_vocab)
                   for a in mine]
        ref_conv = [oracle_v12["v2"].apply_vocab(copy.deepcopy(a), ref_vocab)
                    for a in expected]
        assert my_conv == ref_conv


@pytest.mark.parametrize("seed", [71])
def test_structured_annotation_fuzz_parity(seed):
    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    oa = load("o_one", f"{REF}/preprocess_scenes/preprocess_one_annotation.py")
    scenes_raw, by_scene = _corpus(seed)
    for raw in scenes_raw:
        questions = by_scene.get(raw["image_index"], [])
        scene = Scene.from_raw(raw)
        # the reference script annotates only its first question ("one
        # sample"); compare per question
        for q in questions:
            expected = _ref_annotate(
                oa, "annotate_questions_with_relevant_objects", raw, [q]
            )
            mine = ann.annotate_question_structured(q, scene)
            assert [mine] == expected
