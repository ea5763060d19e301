"""utils: profiling phase timers and the CSV metrics writer."""

import csv
import time

from explainable_spatial_vqa_tpu.utils.logging import MetricsWriter
from explainable_spatial_vqa_tpu.utils.profiling import phase, phase_report, reset_phases


def test_phase_timers():
    reset_phases()
    with phase("work"):
        time.sleep(0.01)
    with phase("work"):
        time.sleep(0.01)
    report = phase_report()
    assert "work" in report and "2 calls" in report
    reset_phases()
    assert "work" not in phase_report()


def test_metrics_writer(tmp_path):
    path = str(tmp_path / "metrics.csv")
    writer = MetricsWriter(path, ["loss", "acc"])
    writer.write(0, "train", {"loss": 1.5, "acc": 0.5})
    writer.write(0, "val", {"loss": 1.2, "acc": 0.6, "ignored_extra": 9})
    writer.close()
    # append mode: second writer adds rows without rewriting the header
    writer2 = MetricsWriter(path, ["loss", "acc"])
    writer2.write(1, "train", {"loss": 1.0, "acc": 0.7})
    writer2.close()
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 3
    assert rows[0]["split"] == "train" and rows[1]["split"] == "val"
    assert float(rows[2]["loss"]) == 1.0
    assert "ignored_extra" not in rows[0]
