"""Evaluation suite: accuracy, detection P/R, faithfulness quadrants, CoGenT."""
