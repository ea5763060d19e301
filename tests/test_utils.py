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


def test_decode_yolo_grid():
    import numpy as np

    from explainable_spatial_vqa_tpu.utils.visualize import decode_yolo_grid

    pred = np.zeros((7, 7, 5))
    pred[3, 4] = [0.5, 0.5, 0.2, 0.2, 0.9]  # cell (i=3, j=4), centered
    pred[0, 0] = [0.5, 0.5, 0.1, 0.1, 0.3]  # below threshold
    boxes = decode_yolo_grid(pred, threshold=0.5)
    assert boxes.shape == (1, 5)
    x_center = (4 + 0.5) / 7
    y_center = (3 + 0.5) / 7
    np.testing.assert_allclose(
        boxes[0, :4],
        [x_center - 0.1, y_center - 0.1, x_center + 0.1, y_center + 0.1],
        atol=1e-9,
    )


def test_draw_boxes():
    import numpy as np
    from PIL import Image

    from explainable_spatial_vqa_tpu.utils.visualize import draw_boxes

    img = Image.new("RGB", (100, 100), "white")
    before = np.asarray(img).copy()
    draw_boxes(img, [[0.1, 0.1, 0.5, 0.5, 0.9], [0.6, 0.6, 0.4, 0.4, 0.9]],
               labels=["a", "b"])
    after = np.asarray(img)
    assert (before != after).any()  # first box drawn; degenerate second skipped
