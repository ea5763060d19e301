"""Artifact IO round-trip and encoding tests."""

import numpy as np

from explainable_spatial_vqa_tpu.core import artifacts as art
from explainable_spatial_vqa_tpu.core import vocab as voc


def test_encode_questions(golden_synthetic, fixture_val_question, fixture_train_question):
    questions = [fixture_val_question, fixture_train_question]
    vocab = voc.build_clevr_vocab([questions])
    enc = art.encode_questions(questions, vocab, mode="postfix")
    assert enc.questions.shape[0] == 2
    assert enc.programs is not None and enc.programs.shape[0] == 2
    assert enc.answers is not None and len(enc.answers) == 2
    # <START>=1 at position 0; padding with <NULL>=0 after <END>=2
    assert (enc.questions[:, 0] == 1).all()
    for row in enc.questions:
        end_pos = np.where(row == 2)[0]
        assert len(end_pos) >= 1
        assert (row[end_pos[0] + 1 :] == 0).all()


def test_questions_h5_roundtrip(tmp_path, fixture_val_question, fixture_train_question):
    questions = [fixture_val_question, fixture_train_question]
    vocab = voc.build_clevr_vocab([questions])
    enc = art.encode_questions(questions, vocab)
    path = str(tmp_path / "q.h5")
    art.write_questions_h5(enc, path)
    back = art.read_questions_h5(path)
    np.testing.assert_array_equal(back.questions, enc.questions)
    np.testing.assert_array_equal(back.programs, enc.programs)
    np.testing.assert_array_equal(back.answers, enc.answers)
    np.testing.assert_array_equal(back.image_idxs, enc.image_idxs)


def test_feature_writer_roundtrip(tmp_path):
    path = str(tmp_path / "f.h5")
    data = np.random.RandomState(0).rand(5, 8, 2, 2).astype(np.float32)
    with art.FeatureWriter(path, total=5) as w:
        w.append(data[:3])
        w.append(data[3:])
    back = art.read_features(path)
    np.testing.assert_array_equal(back, data)
    sel = art.read_features(path, indices=[4, 0])
    np.testing.assert_array_equal(sel, data[[4, 0]])


def test_annotated_h5_roundtrip(tmp_path, golden_synthetic):
    annotated = golden_synthetic["annotated"]
    for layout in ("blob", "per_question"):
        path = str(tmp_path / f"a_{layout}.h5")
        art.write_annotated_h5(annotated, path, layout=layout)
        assert art.read_annotated_h5(path) == annotated


def test_scenes_h5_roundtrip(tmp_path, fixture_scene):
    from explainable_spatial_vqa_tpu.clevr import bboxes as bb

    out = bb.export_scenes([fixture_scene])
    path = str(tmp_path / "s.h5")
    art.write_scenes_h5(
        path, out["bounding_boxes"], out["class_labels"], out["image_index"], out["image_filename"]
    )
    back = art.read_scenes_h5(path)
    np.testing.assert_array_equal(back["bounding_boxes"], out["bounding_boxes"])
    assert back["image_filename"] == out["image_filename"]
