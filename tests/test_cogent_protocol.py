"""End-to-end CoGenT four-cell protocol (evalsuite.cogent.run_cogent_protocol).

Round-2 verdict item 4: the A->B generalization-gap measurement machinery must
actually run — train on condition A, eval valA/valB, fine-tune on the B
subset, re-eval — not just format hardcoded thesis numbers.
"""

import numpy as np
import pytest

from explainable_spatial_vqa_tpu.evalsuite.cogent import (
    COGENT_A_PALETTE,
    COGENT_B_PALETTE,
    run_cogent_protocol,
)


@pytest.mark.slow
def test_run_cogent_protocol_tiny():
    result = run_cogent_protocol(
        num_scenes_a=8, num_scenes_val=3, num_scenes_b_pool=4,
        questions_per_scene=4, gen_steps=12, exe_steps=12, ft_steps=6,
        finetune_images=2, finetune_questions=6, seed=0,
    )
    report = result["report"]
    cells = report.as_dict()
    # all four cells measured (not None), in [0, 1]
    for name, v in cells.items():
        assert v is not None, name
        assert 0.0 <= v <= 1.0, (name, v)
    # fine-tune slice respected the image/question caps
    assert result["sizes"]["finetune_questions"] <= 6
    # by-type dicts carry the standard CLEVR question-type keys
    for acc in result["by_type"].values():
        assert "overall" in acc
    # tallies cover the eval sets
    t = result["tallies"]["valA_no_finetune"]
    assert t.total == result["sizes"]["val_questions"]


def test_run_cogent_protocol_capacity_knobs():
    """The flagship-recipe knobs (d_model/layers/box_roi/cosine/hops,
    VERDICT r3 #5) must thread through the four-cell protocol."""
    result = run_cogent_protocol(
        num_scenes_a=8, num_scenes_val=3, num_scenes_b_pool=4,
        questions_per_scene=3, gen_steps=10, exe_steps=10, ft_steps=5,
        finetune_images=2, finetune_questions=6, seed=0,
        d_model=48, encoder_layers=1, box_roi=True, lr_schedule="cosine",
        hop_prob=0.8, chain_prob=0.5, max_chain_steps=14,
    )
    cells = result["report"].as_dict()
    for name, v in cells.items():
        assert v is not None and 0.0 <= v <= 1.0, (name, v)


def test_cogent_scene_palettes_disjoint_for_restricted_shapes():
    # the synthetic CoGenT conditions must actually produce the palette split
    from explainable_spatial_vqa_tpu.clevr.synthetic import random_scene_cogent

    rng = np.random.RandomState(0)
    for cond, palette in (("A", COGENT_A_PALETTE), ("B", COGENT_B_PALETTE)):
        for i in range(20):
            scene = random_scene_cogent(rng, i, cond)
            for obj in scene["objects"]:
                assert obj["color"] in palette[obj["shape"]], (cond, obj)


def test_entangled_color_channels_force_the_transfer_gap():
    """The entangled feature mode's (shape, color) -> channel map must make
    the A->B zero-shot color-decoding failure information-theoretically
    forced: for every palette-restricted shape, the channels condition-B
    colors land on are DISJOINT from the channels any condition-A color of
    that shape lands on."""
    from explainable_spatial_vqa_tpu.clevr.synthetic import (
        ATTRIBUTE_VALUES,
        color_channel,
    )

    for shape in ("cube", "cylinder"):
        a = {color_channel(c, shape, entangled=True)
             for c in COGENT_A_PALETTE[shape]}
        b = {color_channel(c, shape, entangled=True)
             for c in COGENT_B_PALETTE[shape]}
        assert not (a & b), (shape, a, b)
    # each per-shape map is a bijection over the 8 color channels
    for shape in ATTRIBUTE_VALUES["shape"]:
        chans = {color_channel(c, shape, entangled=True)
                 for c in ATTRIBUTE_VALUES["color"]}
        assert chans == set(range(8)), shape


def test_entangled_feature_map_only_moves_color_channels():
    from explainable_spatial_vqa_tpu.clevr.synthetic import (
        random_scene,
        scene_feature_map,
    )

    scene = random_scene(np.random.RandomState(3), 0)
    plain = scene_feature_map(scene)
    ent = scene_feature_map(scene, entangled=True)
    # shape/size/material/objectness channels identical; color (0-7) may move
    np.testing.assert_array_equal(plain[8:], ent[8:])
    # same cells carry SOME color in both modes (channels permuted per
    # object; overlapping boxes may merge differently per channel)
    np.testing.assert_array_equal(plain[:8].max(0), ent[:8].max(0))
