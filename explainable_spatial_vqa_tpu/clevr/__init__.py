"""Symbolic CLEVR layer: scene graphs, symbolic program execution,
bounding-box approximation, and per-step annotation generation."""

from explainable_spatial_vqa_tpu.clevr import scenes, executor, bboxes, annotate  # noqa: F401
