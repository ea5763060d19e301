"""Tiny-train smoke tests for the prototype-family presets (round-2 verdict
item 6): every reference prototype trainer (training_token_only.py,
training_bb_only*.py incl. YOLO-from-pixels, the Hungarian/Sinkhorn multitask
script, inference_bbinout.py's selection model, training2.py's multi-head
model, training.py's hierarchical generator) must be trainable from the CLI
via `train --preset`.
"""

import json
import pathlib

import numpy as np
import pytest

from explainable_spatial_vqa_tpu.cli.main import main as cli_main
from explainable_spatial_vqa_tpu.core.config import PRESETS


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Synthetic corpus -> annotated h5 + split vocab + features h5 + PNGs."""
    from PIL import Image

    from explainable_spatial_vqa_tpu.clevr import annotate as ann
    from explainable_spatial_vqa_tpu.clevr import synthetic as syn
    from explainable_spatial_vqa_tpu.clevr.scenes import Scene
    from explainable_spatial_vqa_tpu.core import vocab as voc
    from explainable_spatial_vqa_tpu.core.artifacts import write_annotated_h5

    root = tmp_path_factory.mktemp("proto")
    scenes_raw, questions = syn.synthesize_dataset(24, 4, seed=7)
    scenes = {s["image_index"]: Scene.from_raw(s) for s in scenes_raw}
    annotated = ann.annotate_questions(questions, scenes)
    split_vocab = voc.build_split_vocab(annotated)

    write_annotated_h5(annotated, str(root / "annotated.h5"))
    voc.save_vocab(split_vocab, str(root / "split_vocab.json"))

    import h5py

    rng = np.random.RandomState(0)
    with h5py.File(root / "features.h5", "w") as f:
        f.create_dataset(
            "features",
            data=rng.rand(len(scenes_raw), 1024, 14, 14).astype(np.float32),
        )
    img_dir = root / "images"
    img_dir.mkdir()
    for i in range(len(scenes_raw)):
        arr = rng.randint(0, 255, (64, 64, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"CLEVR_val_{i:06d}.png")
    return root


PROTO_PRESETS = [
    "token_only", "bb_only", "bb_only_iou", "multitask_bb",
    "bbinout", "multihead", "hierarchical",
]


def test_preset_count():
    assert len(PRESETS) >= 15
    for name in PROTO_PRESETS + ["yolo_bb"]:
        assert name in PRESETS, name


def test_combined_channel_preset():
    # the round-5 decision configuration: all three opt-in executor
    # channels together, K=4 similarity subspaces (DESIGN.md par-11-13)
    m = PRESETS["executor_roi_sim_count"].model
    assert m.box_roi and m.roi_sim and m.count_embed
    assert m.roi_sim_heads == 4


def _train(workdir, preset, tmp_path, extra=()):
    hist = tmp_path / f"hist_{preset}.json"
    cli_main([
        "--platform", "cpu",
        "train", "--preset", preset,
        "--annotated_h5", str(workdir / "annotated.h5"),
        "--split_vocab_json", str(workdir / "split_vocab.json"),
        "--features_h5", str(workdir / "features.h5"),
        "--epochs", "2",
        "--checkpoint_dir", str(tmp_path / f"ckpt_{preset}"),
        "--history_json", str(hist),
        *extra,
    ])
    history = json.load(open(hist))
    losses = [e["loss_sum"] / e["batches"] for e in history["train"]]
    assert len(losses) == 2
    assert all(np.isfinite(losses)), losses
    return losses


@pytest.mark.slow
@pytest.mark.parametrize("preset", PROTO_PRESETS)
def test_prototype_preset_trains(workdir, tmp_path, preset):
    losses = _train(workdir, preset, tmp_path)
    # trains: second-epoch loss not worse than 1.2x the first (noisy tiny run)
    assert losses[-1] <= losses[0] * 1.2, losses


@pytest.mark.slow
def test_yolo_preset_trains(workdir, tmp_path):
    losses = _train(
        workdir, "yolo_bb", tmp_path,
        extra=["--image_dir", str(workdir / "images")],
    )
    assert losses[-1] <= losses[0] * 1.2, losses


def test_presets_cli_lists(capsys):
    cli_main(["presets"])
    out = capsys.readouterr().out.split()
    assert len(out) >= 15
    assert "multihead" in out
