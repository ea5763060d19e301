"""Scene attribute export + h5 reshapers + streaming splitter."""

import json

import numpy as np

from explainable_spatial_vqa_tpu.core import reshape


def test_export_scene_attributes(fixture_scene):
    arrays, vocab = reshape.export_scene_attributes([fixture_scene])
    n_obj = len(fixture_scene["objects"])
    assert arrays["attributes"].shape == (1, n_obj, 4)
    assert arrays["coords_3d"].shape == (1, n_obj, 3)
    assert min(vocab.values()) == 1
    assert sorted(vocab) == list(vocab)  # sorted assignment order
    # codes resolve back to the right values
    obj0 = fixture_scene["objects"][0]
    assert arrays["attributes"][0, 0, 0] == vocab[f"shape={obj0['shape']}"]
    assert arrays["attributes"][0, 0, 1] == vocab[f"color={obj0['color']}"]


def test_question_groups_roundtrip(tmp_path, golden_synthetic):
    questions = golden_synthetic["questions"][:3]
    grouped = str(tmp_path / "grouped.h5")
    flat = str(tmp_path / "flat.h5")
    reshape.save_questions_grouped(questions, grouped)
    assert reshape.read_question_groups(grouped) == questions
    reshape.flatten_question_groups(grouped, flat)
    assert reshape.read_question_groups(flat, flat=True) == questions


def test_stream_split_questions(tmp_path, golden_synthetic):
    questions = golden_synthetic["questions"]
    src = tmp_path / "big.json"
    json.dump({"info": {"version": "1.0"}, "questions": questions}, open(src, "w"))
    paths = reshape.stream_split_questions(str(src), str(tmp_path / "parts"), chunk_size=3)
    assert len(paths) == (len(questions) + 2) // 3
    merged = []
    for p in paths:
        merged.extend(json.load(open(p))["questions"])
    assert merged == questions


def test_stream_split_small_blocks(tmp_path, golden_synthetic):
    """Streaming splitter with a tiny read block: records straddle block
    boundaries and must still parse (true bounded-memory path)."""
    questions = golden_synthetic["questions"]
    src = tmp_path / "big2.json"
    json.dump({"info": {"x": 1}, "questions": questions}, open(src, "w"))
    paths = reshape.stream_split_questions(
        str(src), str(tmp_path / "parts2"), chunk_size=2, read_block=97
    )
    merged = []
    for p in paths:
        merged.extend(json.load(open(p))["questions"])
    assert merged == questions
