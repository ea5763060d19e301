"""Thin command-line entry points replacing the reference's ~45 standalone
scripts.  ``python -m explainable_spatial_vqa_tpu.cli <command> ...``"""
