"""CLEVR-CoGenT A->B generalisation protocol (thesis §4.2.2, Table 4.6).

Condition A trains (cubes in gray/blue/brown/yellow; cylinders in
red/green/purple/cyan; spheres any color); Condition B swaps the cube and
cylinder palettes.  The protocol evaluates:

1. train on A, evaluate on valA and valB zero-shot,
2. fine-tune on 3k images / 30k questions of B, re-evaluate valA and valB.

This module provides the split helpers and the report assembly; training
itself runs through the standard Trainer with CoGenT artifact paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

__all__ = ["COGENT_A_PALETTE", "COGENT_B_PALETTE", "finetune_subset", "CoGenTReport"]

COGENT_A_PALETTE = {
    "cube": {"gray", "blue", "brown", "yellow"},
    "cylinder": {"red", "green", "purple", "cyan"},
    "sphere": {"gray", "blue", "brown", "yellow", "red", "green", "purple", "cyan"},
}
COGENT_B_PALETTE = {
    "cube": COGENT_A_PALETTE["cylinder"],
    "cylinder": COGENT_A_PALETTE["cube"],
    "sphere": COGENT_A_PALETTE["sphere"],
}


def finetune_subset(
    image_indices: np.ndarray,
    num_images: int = 3000,
    num_questions: int = 30000,
    seed: int = 42,
) -> np.ndarray:
    """Question indices for the 3k-image / 30k-question B fine-tune slice
    (thesis §4.2.2 p.36): pick the first ``num_images`` distinct images, then
    sample questions over them."""
    image_indices = np.asarray(image_indices)
    chosen_images = np.unique(image_indices)[:num_images]
    eligible = np.flatnonzero(np.isin(image_indices, chosen_images))
    rng = np.random.RandomState(seed)
    if len(eligible) > num_questions:
        eligible = rng.choice(eligible, num_questions, replace=False)
        eligible.sort()
    return eligible


@dataclass
class CoGenTReport:
    """Assembles the four-cell Table 4.6 row."""

    a_zero_shot: Optional[float] = None
    b_zero_shot: Optional[float] = None
    a_finetuned: Optional[float] = None
    b_finetuned: Optional[float] = None

    def as_dict(self) -> Dict[str, Optional[float]]:
        return {
            "valA_no_finetune": self.a_zero_shot,
            "valB_no_finetune": self.b_zero_shot,
            "valA_finetuned_on_B": self.a_finetuned,
            "valB_finetuned_on_B": self.b_finetuned,
        }

    def report(self) -> str:
        d = self.as_dict()
        fmt = lambda v: "—" if v is None else f"{100 * v:.1f}"  # noqa: E731
        return (
            f"CoGenT: A {fmt(d['valA_no_finetune'])} / B {fmt(d['valB_no_finetune'])}"
            f" (zero-shot); A {fmt(d['valA_finetuned_on_B'])} /"
            f" B {fmt(d['valB_finetuned_on_B'])} (fine-tuned on B)"
        )
