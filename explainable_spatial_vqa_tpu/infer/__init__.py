"""Inference engines: vectorized chained program execution with on-device
caches, and the generator+executor end-to-end pipeline."""
