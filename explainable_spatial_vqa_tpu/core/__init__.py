"""Core data contracts: program structures, tokenization, vocabularies,
artifact schemas and readers/writers."""

from explainable_spatial_vqa_tpu.core import programs, tokenizer, vocab, artifacts  # noqa: F401
