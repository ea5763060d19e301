"""The one-command CLEVR dress rehearsal (VERDICT r2 #5): `repro-clevr` runs
extract-features -> vocab -> questions -> annotate -> train generator+executor
-> tally on a miniature CLEVR-layout root built from the checked-in fixtures,
with REAL 1024x14x14 feature shapes and torch-converted ResNet weights, in a
single invocation."""

import json
import pathlib

import numpy as np
import pytest

from explainable_spatial_vqa_tpu.cli.main import main as cli_main

DATA = pathlib.Path(__file__).parent / "data"
REF = pathlib.Path("/root/reference/code")


def _mini_clevr_root(root: pathlib.Path) -> None:
    """CLEVR v1.0 directory layout from the checked-in first-N fixtures."""
    from PIL import Image

    golden = json.load(open(DATA / "golden_synthetic.json"))
    scene = json.load(
        open(REF / "inspecting_scripts" / "CLEVR_val_scenes_first.json")
    )["scenes"][0]
    real_q = json.load(
        open(REF / "inspecting_scripts" / "CLEVR_val_questions_first.json")
    )["questions"][0]
    questions = golden["questions"] + [real_q]

    (root / "questions").mkdir(parents=True)
    (root / "scenes").mkdir()
    rng = np.random.RandomState(0)
    for split, qs in (("train", questions * 8), ("val", questions)):
        json.dump({"questions": qs}, open(root / "questions" / f"CLEVR_{split}_questions.json", "w"))
        json.dump({"scenes": [scene]}, open(root / "scenes" / f"CLEVR_{split}_scenes.json", "w"))
        img_dir = root / "images" / split
        img_dir.mkdir(parents=True)
        Image.fromarray(rng.randint(0, 255, (320, 480, 3), np.uint8)).save(
            img_dir / f"CLEVR_{split}_000000.png"
        )


@pytest.mark.slow
def test_repro_clevr_single_invocation(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from tests.test_vision import _torch_resnet101_stage3

    root = tmp_path / "CLEVR_v1.0"
    _mini_clevr_root(root)
    weights = tmp_path / "resnet101.pth"
    torch.save(_torch_resnet101_stage3(torch).state_dict(), weights)

    work = tmp_path / "work"
    cli_main([
        "--platform", "cpu", "repro-clevr",
        "--clevr_root", str(root), "--workdir", str(work),
        "--torch_weights", str(weights),
        "--gen_epochs", "1", "--exe_epochs", "1",
        "--batch_size", "8", "--eval_limit", "8",
    ])
    out = capsys.readouterr().out

    # real reference feature layout went through the torch-converted network
    import h5py

    with h5py.File(work / "train_features.h5") as f:
        assert f["features"].shape == (1, 1024, 14, 14)

    report = (work / "REPORT.md").read_text()
    for marker in (
        "Program generator",                  # Table §4.1.3.2 shape
        "Tables 4.2 / 4.3 / 4.4 / 4.5",
        "correct_program_correct_answer",     # faithfulness quadrants (4.5)
        "per_function_box_pr",                # per-function P/R (4.3)
        "per_function_token_acc",             # token accuracy (4.4)
        "Table 4.6",
    ):
        assert marker in report, marker
    # machine-readable artifact map on stdout
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["report"].endswith("REPORT.md")
    assert pathlib.Path(payload["checkpoints"][0]).exists()
