"""Learning demonstrations on synthetic CLEVR-compatible data.

These go beyond overfit smoke tests: models must learn *grounded* behavior
(filters/queries over spatial feature maps; question->program mapping) well
above chance on held-out-scene structure, exercising the full
annotate -> dataset -> loss -> train -> eval chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from explainable_spatial_vqa_tpu.clevr import annotate as ann
from explainable_spatial_vqa_tpu.clevr import synthetic as syn
from explainable_spatial_vqa_tpu.clevr.scenes import Scene
from explainable_spatial_vqa_tpu.core import vocab as voc
from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
from explainable_spatial_vqa_tpu.train import datasets as ds
from explainable_spatial_vqa_tpu.train.losses import executor_set_loss


def test_synthetic_dataset_wellformed():
    scenes, questions = syn.synthesize_dataset(5, 4, seed=0)
    assert len(scenes) == 5
    assert len(questions) == 20
    for q in questions:
        assert q["answer"] not in ("", "__INVALID__")
        assert q["program"][0]["function"] == "scene"
        assert q["question"].endswith("?")
    feat = syn.scene_feature_map(scenes[0])
    assert feat.shape == (64, 14, 14)
    assert 0.0 < feat.max() <= 1.0 and feat.min() == 0.0
    # objectness plane covers at least each object's box
    assert feat[15].sum() > 0
    # one bilinear center splat per object (weights sum to 1 pre-merge)
    assert feat[16].sum() > 0
    assert (feat[16] > 0).sum() >= len(scenes[0]["objects"])


def test_synthetic_setop_questions():
    """The corpus generates union/intersect DAGs (thesis Table 4.3's two
    set-typed 2-input functions) that execute, annotate, and parse."""
    scenes, questions = syn.synthesize_dataset(30, 6, seed=0)
    by_fn = {
        fn: [q for q in questions
             if any(n["function"] == fn for n in q["program"])]
        for fn in ("union", "intersect")
    }
    for fn, qs in by_fn.items():
        assert qs, f"no {fn} questions in 180 samples"
        q = qs[0]
        node = next(n for n in q["program"] if n["function"] == fn)
        assert len(node["inputs"]) == 2
        assert q["program"][-1]["function"] in ("count", "exist")
    # the annotation factory threads both box inputs through the set op
    scene_map = {s["image_index"]: Scene.from_raw(s) for s in scenes}
    q = by_fn["union"][0]
    annotated = ann.annotate_question(q, scene_map[q["image_index"]])
    assert len(annotated["annotated_program"]) == len(q["program"])
    set_step = next(s for s in annotated["annotated_program"]
                    if s["function"] == "union")
    assert len(set_step["inputs"]) == 2


def test_protocol_lr_schedules():
    """Both optimizer schedules run and an unknown name is rejected."""
    from explainable_spatial_vqa_tpu.train.synthetic_protocol import (
        _make_optimizer,
        train_generator_synthetic,
    )

    scenes_raw, questions = syn.synthesize_dataset(3, 2, seed=0)
    vocab = voc.build_clevr_vocab([questions])
    for sched in ("constant", "cosine"):
        _, _, _, loss = train_generator_synthetic(
            questions, vocab, steps=3, seed=0, lr_schedule=sched)
        assert np.isfinite(loss)
    with pytest.raises(ValueError):
        _make_optimizer(1e-3, "nope", 10)


@pytest.mark.slow
def test_executor_learns_grounded_steps():
    """The thesis executor must learn routing (~free), value tokens (well
    above chance), and box sets (IoU-matched) from spatial feature maps."""
    scenes_raw, questions = syn.synthesize_dataset(40, 6, seed=1)
    scenes = {s["image_index"]: Scene.from_raw(s) for s in scenes_raw}
    annotated = ann.annotate_questions(questions, scenes)
    vocabs = voc.build_split_vocab(annotated)

    cfg = ExecutorConfig(
        vocab_size=len(vocabs["function"]) + 1,
        d_model=64, num_heads=4, encoder_layers=2, box_decoder_layers=1,
        num_queries=8, num_image_tokens=196, image_feature_dim=64,
        max_input_boxes=8, token_classes=len(vocabs["other"]) + 1,
        dropout=0.0, matcher="hungarian",
    )
    arrays = ds.executor_step_arrays(
        annotated, vocabs["function"], vocabs["other"],
        max_input_boxes=cfg.max_input_boxes, max_output_boxes=cfg.num_queries,
    )
    features = np.stack([
        syn.scene_feature_map(s).reshape(64, -1).T for s in scenes_raw
    ]).astype(np.float32)  # (S, 196, 64)
    images = features[arrays["image_index"]]

    n = len(arrays["text"])
    assert n > 300
    model = ProgramExecutor(cfg)
    batch0 = lambda sl: (  # noqa: E731
        jnp.asarray(images[sl]), jnp.asarray(arrays["input_boxes"][sl]),
        jnp.asarray(arrays["input_box_mask"][sl]), jnp.asarray(arrays["text"][sl]),
        jnp.asarray(arrays["text_mask"][sl]),
    )
    variables = model.init(jax.random.PRNGKey(0), *batch0(slice(0, 2)))
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    bs = 64
    rng = np.random.RandomState(0)

    @jax.jit
    def step(params, opt_state, image, boxes, bmask, text, tmask,
             tgt_boxes, tgt_mask, tok_tgt, is_box):
        def loss_fn(p):
            out = model.apply({"params": p}, image, boxes, bmask, text, tmask)
            return executor_set_loss(out, tgt_boxes, tgt_mask, tok_tgt, is_box, cfg)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(300):
        idx = rng.choice(n, bs, replace=False)
        params, opt_state, loss = step(
            params, opt_state, *batch0(idx),
            jnp.asarray(arrays["target_boxes"][idx]),
            jnp.asarray(arrays["target_box_mask"][idx]),
            jnp.asarray(arrays["token_target"][idx]),
            jnp.asarray(arrays["is_box_branch"][idx]),
        )

    # evaluate on all steps
    out = model.apply({"params": params}, *batch0(slice(0, n)))
    routing_pred = np.argmax(np.asarray(out["routing_logits"]), -1)
    routing_gt = 1 - arrays["is_box_branch"].astype(int)
    routing_acc = (routing_pred == routing_gt).mean()

    tok_sel = ~arrays["is_box_branch"]
    token_pred = np.argmax(np.asarray(out["token_logits"]), -1)
    token_acc = (token_pred[tok_sel] == arrays["token_target"][tok_sel]).mean()

    from explainable_spatial_vqa_tpu.evalsuite.detection import greedy_box_match

    tp = pred_n = gt_n = 0
    conf = np.asarray(out["pred_conf"])
    pboxes = np.asarray(out["pred_boxes"])
    for i in np.flatnonzero(arrays["is_box_branch"])[:200]:
        keep = conf[i] >= 0.5
        gt = arrays["target_boxes"][i][arrays["target_box_mask"][i]]
        tp += greedy_box_match(pboxes[i][keep], gt)
        pred_n += int(keep.sum())
        gt_n += len(gt)
    recall = tp / max(gt_n, 1)

    assert routing_acc > 0.9, routing_acc
    assert token_acc > 0.4, token_acc  # chance is ~1/len(other vocab) ~ 5%
    assert recall > 0.2, (recall, tp, pred_n, gt_n)


@pytest.mark.slow
def test_generator_learns_templated_questions():
    """Question -> program on templated synthetic text: exact match must be
    high (the mapping is deterministic)."""
    from explainable_spatial_vqa_tpu.core.artifacts import encode_questions
    from explainable_spatial_vqa_tpu.core.config import GeneratorConfig
    from explainable_spatial_vqa_tpu.models.generator import ProgramGenerator
    from explainable_spatial_vqa_tpu.train.losses import cross_entropy

    _, questions = syn.synthesize_dataset(60, 5, seed=2)
    vocab = voc.build_clevr_vocab([questions])
    enc = encode_questions(questions, vocab)
    q, p = enc.questions, enc.programs

    cfg = GeneratorConfig(
        vocab_size=int(q.max()) + 1, program_vocab_size=int(p.max()) + 1,
        embed_dim=48, hidden_dim=96, encoder_layers=1, decoder_layers=1,
        dropout=0.0, program_len=p.shape[1], simple=False,
    )
    model = ProgramGenerator(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(q[:2]), jnp.asarray(p[:2]),
    )
    params = variables["params"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    n = len(q)

    @jax.jit
    def step(params, opt_state, qb, pb):
        def loss_fn(pr):
            out = model.apply({"params": pr}, qb, pb, deterministic=True,
                              teacher_forcing=1.0)
            return cross_entropy(out["logits"], pb)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(250):
        idx = rng.choice(n, 64, replace=False)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(q[idx]), jnp.asarray(p[idx]))

    gen = np.asarray(model.apply({"params": params}, jnp.asarray(q[:256]),
                                 method=model.generate))
    gold = p[:256]
    # compare up to <END>: positions after gold's END are don't-care
    em = 0
    for i in range(len(gold)):
        end = np.argmax(gold[i] == 2) + 1 if (gold[i] == 2).any() else len(gold[i])
        em += int((gen[i][:end] == gold[i][:end]).all())
    exact = em / len(gold)
    assert exact > 0.7, (exact, float(loss))


def test_cogent_conditioned_scenes():
    from explainable_spatial_vqa_tpu.evalsuite.cogent import (
        COGENT_A_PALETTE,
        COGENT_B_PALETTE,
    )

    for cond, palette in (("A", COGENT_A_PALETTE), ("B", COGENT_B_PALETTE)):
        scenes, questions = syn.synthesize_cogent_dataset(4, 3, cond, seed=5)
        assert len(scenes) == 4 and questions
        for s in scenes:
            for o in s["objects"]:
                assert o["color"] in palette[o["shape"]]
    # conditions differ: a B cube color is never a valid A cube color
    a_cubes = COGENT_A_PALETTE["cube"]
    b_cubes = COGENT_B_PALETTE["cube"]
    assert not (a_cubes & b_cubes)
