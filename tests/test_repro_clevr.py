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
        # flagship executor recipe + the out-of-sample per-function
        # confidence flow (VERDICT r4 #9: keep the real-CLEVR path warm
        # with whatever the accuracy protocol promotes)
        "--executor_preset", "executor_roi", "--per_fn_conf",
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
    # the per-fn flow fitted a threshold map on train and labeled the val
    # tables as out-of-sample
    thr_map = json.load(open(work / "conf_thresholds.json"))
    assert "__global__" in thr_map
    assert "fitted on train chains" in report
    # machine-readable artifact map on stdout
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["report"].endswith("REPORT.md")
    assert pathlib.Path(payload["checkpoints"][0]).exists()


def _stubbed_repro(monkeypatch, tmp_path, splits, cogent_b=None,
                   executor_preset="executor", per_fn_conf=False):
    """Drive cmd_repro_clevr's ORCHESTRATION with the heavy subcommands
    stubbed out: _prepare_split returns canned artifact dicts per
    (root, split), _sub records its argv.  Exercises the control flow the
    slow fixture test cannot reach (missing-input substitution/failure,
    the CoGenT fine-tune branch)."""
    import argparse

    from explainable_spatial_vqa_tpu.cli import repro

    calls = []
    monkeypatch.setattr(repro, "_sub", lambda argv, platform=None:
                        calls.append(list(argv)) or "stub-tally-output")
    monkeypatch.setattr(
        repro, "_prepare_split",
        lambda root, split, work, *a, **k: dict(splits[(root, split)]))
    monkeypatch.setattr(
        repro, "_find",
        lambda root, *cands: str(tmp_path / "q.json"))
    monkeypatch.setattr(repro.shutil, "copytree",
                        lambda *a, **k: None)
    args = argparse.Namespace(
        clevr_root="A", workdir=str(tmp_path / "w"), platform="cpu",
        torch_weights=None, resize="pil", feature_batch=8,
        gen_epochs=1, exe_epochs=1, ft_epochs=1, batch_size=4,
        eval_limit=8, cogent_b_root=cogent_b,
        executor_preset=executor_preset, per_fn_conf=per_fn_conf)
    repro.cmd_repro_clevr(args)
    return calls, (tmp_path / "w" / "REPORT.md").read_text()


FULL = {"questions_h5": "q.h5", "features_h5": "f.h5",
        "annotated_h5": "a.h5", "split_vocab": "sv.json"}


def test_repro_cogent_branch_uses_batch_size(monkeypatch, tmp_path, capsys):
    """The fine-tune-on-B trainings must carry --batch_size (regression:
    the bs list was defined only outside the branch at one point)."""
    splits = {("A", "train"): FULL, ("A", "val"): FULL,
              ("B", "train"): FULL, ("B", "val"): FULL}
    calls, report = _stubbed_repro(monkeypatch, tmp_path, splits, cogent_b="B")
    ft_trains = [c for c in calls if c[0] == "train"
                 and "ftB" in " ".join(c)]
    assert len(ft_trains) == 2
    for c in ft_trains:
        assert "--batch_size" in c and "4" in c
    assert "## Table 4.6 (CoGenT A->B)" in report
    assert "fine-tune B, eval valB" in report


def test_repro_executor_preset_threads_through(monkeypatch, tmp_path, capsys):
    """--executor_preset must reach every executor train AND every tally
    (a checkpoint trained with executor_roi restores only into a matching
    param tree; a tally built from the plain preset would fail or silently
    mis-evaluate)."""
    splits = {("A", "train"): FULL, ("A", "val"): FULL,
              ("B", "train"): FULL, ("B", "val"): FULL}
    calls, _ = _stubbed_repro(monkeypatch, tmp_path, splits, cogent_b="B",
                              executor_preset="executor_roi")
    exe_trains = [c for c in calls if c[0] == "train" and "--annotated_h5" in c]
    assert len(exe_trains) == 2
    for c in exe_trains:
        assert c[c.index("--preset") + 1] == "executor_roi"
    tallies = [c for c in calls if c[0] == "tally"]
    assert len(tallies) == 4
    for c in tallies:
        assert c[c.index("--executor_preset") + 1] == "executor_roi"


def test_repro_per_fn_conf_is_out_of_sample(monkeypatch, tmp_path, capsys):
    """--per_fn_conf must fit the threshold map on the TRAIN split
    (--calibrate_conf_per_function + --save_conf_thresholds) and apply the
    saved map (--conf_thresholds) to the val AND zero-shot-B tallies of the
    same model, never calibrating on the eval split itself."""
    splits = {("A", "train"): FULL, ("A", "val"): FULL,
              ("B", "train"): FULL, ("B", "val"): FULL}
    calls, report = _stubbed_repro(monkeypatch, tmp_path, splits,
                                   cogent_b="B", per_fn_conf=True)
    tallies = [c for c in calls if c[0] == "tally"]
    assert len(tallies) == 5  # one extra calibration tally on train
    calib = tallies[0]
    assert "--calibrate_conf_per_function" in calib
    assert "--save_conf_thresholds" in calib
    assert calib[calib.index("--annotated_h5") + 1] == "a.h5"
    for c in tallies[1:3]:  # val + zero-shot-B: same model, saved map
        assert "--conf_thresholds" in c
        assert "--calibrate_conf" not in c
        assert "--calibrate_conf_per_function" not in c
    for c in tallies[3:]:  # fine-tuned model: the A-train map is stale
        assert "--calibrate_conf" in c
    assert "fitted on train chains" in report


def test_repro_val_substitution_is_labeled(monkeypatch, tmp_path, capsys):
    """A val split with no images/questions falls back to TRAIN artifacts,
    and the report must say so instead of presenting memorized numbers as
    held-out."""
    splits = {("A", "train"): FULL,
              ("A", "val"): {"questions_h5": "q.h5"}}  # no features
    calls, report = _stubbed_repro(monkeypatch, tmp_path, splits)
    assert "TRAIN split substituted" in report
    assert "not held-out" in report


def test_repro_condb_missing_inputs_fails_loud(monkeypatch, tmp_path, capsys):
    """Condition-B roots missing required inputs must abort with a clear
    message, not crash later or silently reuse condition-A data."""
    splits = {("A", "train"): FULL, ("A", "val"): FULL,
              ("B", "train"): {"questions_h5": "q.h5"},  # no features/annot
              ("B", "val"): FULL}
    with pytest.raises(SystemExit, match="condition-B train split"):
        _stubbed_repro(monkeypatch, tmp_path, splits, cogent_b="B")
