"""Prototype executor families: shapes and basic gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from explainable_spatial_vqa_tpu.models import prototypes as proto


def _step_inputs(batch=2):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, 16, 2, 2), jnp.float32)  # (B, C, H, W)
    func = jnp.asarray(rng.randint(0, 8, batch), jnp.int32)
    boxes = jnp.asarray(rng.rand(batch, 6, 4), jnp.float32)
    return img, func, boxes


def test_token_only():
    model = proto.TokenOnlyPredictor(token_vocab_size=12, function_vocab_size=8,
                                     max_input_boxes=6)
    img, func, boxes = _step_inputs()
    variables = model.init(jax.random.PRNGKey(0), img, func, boxes)
    out = model.apply(variables, img, func, boxes)
    assert out.shape == (2, 12)


def test_bbox_only():
    model = proto.BBoxOnlyPredictor(max_output_boxes=5, function_vocab_size=8,
                                    max_input_boxes=6)
    img, func, boxes = _step_inputs()
    variables = model.init(jax.random.PRNGKey(0), img, func, boxes)
    out = np.asarray(model.apply(variables, img, func, boxes))
    assert out.shape == (2, 5, 5)
    assert (out >= 0).all() and (out <= 1).all()


def test_multitask_with_sinkhorn_loss():
    from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
    from explainable_spatial_vqa_tpu.train.losses import executor_set_loss

    model = proto.MultiTaskBBoxTokenPredictor(
        max_output_boxes=5, token_vocab_size=12, function_vocab_size=8, max_input_boxes=6
    )
    img, func, boxes = _step_inputs()
    variables = model.init(jax.random.PRNGKey(0), img, func, boxes)
    out = model.apply(variables, img, func, boxes)
    assert out["routing_logits"].shape == (2, 2)
    assert out["pred_boxes"].shape == (2, 5, 4)

    cfg = ExecutorConfig(num_queries=5, matcher="sinkhorn")
    rng = np.random.RandomState(1)
    losses = executor_set_loss(
        out,
        jnp.asarray(rng.rand(2, 5, 4), jnp.float32),
        jnp.asarray([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], bool),
        jnp.asarray([3, 7], jnp.int32),
        jnp.asarray([True, False]),
        cfg,
    )
    assert np.isfinite(float(losses["loss"]))


def test_selection_predictor():
    model = proto.BBoxSelectionPredictor(function_vocab_size=8, max_input_boxes=6)
    img, func, boxes = _step_inputs()
    variables = model.init(jax.random.PRNGKey(0), img, func, boxes)
    logits = model.apply(variables, img, func, boxes)
    assert logits.shape == (2, 6)


def test_multihead_model():
    model = proto.MultiHeadStepModel(
        vocab_size=20, embed_dim=16, hidden_dim=24, image_feat_dim=16,
        image_spatial=(2, 2), max_bbox_steps=4,
    )
    rng = np.random.RandomState(0)
    func = jnp.asarray(rng.randint(0, 20, 2), jnp.int32)
    tokens = jnp.asarray(rng.randint(0, 20, (2, 5)), jnp.int32)
    img = jnp.asarray(rng.rand(2, 16, 2, 2), jnp.float32)
    teacher = jnp.asarray(rng.rand(2, 4, 4), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        func, tokens, img, teacher,
    )
    out = model.apply(variables, func, tokens, img, teacher)
    assert out["bbox"].shape == (2, 4, 4)
    assert out["bbox_stop_logits"].shape == (2, 4, 2)
    assert out["integer"].shape == (2, 11)
    assert out["color"].shape == (2, 8)
    assert out["vocab"].shape == (2, 20)
    # teacher forcing path
    out_tf = model.apply(
        variables, func, tokens, img, teacher, deterministic=False,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    assert out_tf["bbox"].shape == (2, 4, 4)


def test_yolo():
    model = proto.YoloDetector()
    img = jnp.zeros((2, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    pred = model.apply(variables, img)
    assert pred.shape == (2, 7, 7, 5)
    target = jnp.zeros((2, 7, 7, 5)).at[:, 3, 3].set(jnp.asarray([0.5, 0.5, 0.2, 0.2, 1.0]))
    loss = proto.yolo_grid_loss(pred, target)
    assert np.isfinite(float(loss))
    # zero prediction on empty target -> zero loss
    assert float(proto.yolo_grid_loss(jnp.zeros((1, 7, 7, 5)), jnp.zeros((1, 7, 7, 5)))) == 0.0


def test_hierarchical_generator():
    model = proto.HierarchicalGenerator(
        d_model=16, num_heads=2, num_layers=1, num_image_tokens=4,
        image_feature_dim=8, max_inner_steps=3,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 4, 8), jnp.float32)
    teacher = jnp.asarray(rng.rand(2, 3, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, teacher)
    out = model.apply(variables, img, teacher)
    assert out["type_logits"].shape == (2, 2)
    assert out["pred_boxes"].shape == (2, 3, 4)
    assert out["stop_logits"].shape == (2, 3)
    assert out["nonspatial_value"].shape == (2,)


def test_compositional_step_predictor():
    model = proto.CompositionalStepPredictor(
        d_model=16, question_vocab_size=50, prog_vocab_size=30, num_functions=14
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 16, 2, 2), jnp.float32)
    q = jnp.asarray(rng.randint(1, 50, (2, 6)), jnp.int32)
    boxes = jnp.asarray(rng.rand(2, 3, 4), jnp.float32)
    mask = jnp.asarray([[1, 1, 0], [0, 0, 0]], bool)  # second sample: no boxes
    prog = jnp.asarray(rng.randint(1, 30, (2, 4)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, q, boxes, mask, prog)
    out = model.apply(variables, img, q, boxes, mask, prog)
    assert out["pred_box"].shape == (2, 4)
    assert out["next_function_logits"].shape == (2, 14)
    assert np.isfinite(np.asarray(out["pred_box"])).all()
