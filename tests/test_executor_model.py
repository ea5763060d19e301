"""Program executor (thesis-final) model + set loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
from explainable_spatial_vqa_tpu.ops.matching import (
    hungarian_assignment,
    pairwise_l1,
    sinkhorn_assignment,
)
from explainable_spatial_vqa_tpu.train.losses import cross_entropy, executor_set_loss

CFG = ExecutorConfig(
    vocab_size=24, d_model=32, num_heads=4, encoder_layers=1, box_decoder_layers=1,
    num_queries=4, num_image_tokens=16, image_feature_dim=8, max_input_boxes=3,
    token_classes=10,
)


def _batch(batch=2, rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    img = jnp.asarray(rng.rand(batch, CFG.num_image_tokens, 8), jnp.float32)
    boxes = jnp.asarray(rng.rand(batch, CFG.max_input_boxes, 4), jnp.float32)
    box_mask = jnp.asarray([[1, 1, 0]] * batch, bool)
    text = jnp.asarray(rng.randint(0, CFG.vocab_size, (batch, 3)), jnp.int32)
    text_mask = jnp.asarray([[1, 1, 0]] * batch, bool)
    return img, boxes, box_mask, text, text_mask


@pytest.fixture(scope="module")
def model_and_vars():
    model = ProgramExecutor(CFG)
    variables = model.init(jax.random.PRNGKey(0), *_batch())
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    out = model.apply(variables, *_batch())
    assert out["routing_logits"].shape == (2, 2)
    assert out["token_logits"].shape == (2, CFG.token_classes)
    assert out["pred_boxes"].shape == (2, CFG.num_queries, 4)
    assert out["pred_conf"].shape == (2, CFG.num_queries)
    assert (np.asarray(out["pred_boxes"]) >= 0).all() and (np.asarray(out["pred_boxes"]) <= 1).all()


def test_hungarian_exact():
    # 2 queries, 2 valid targets; cost forces the anti-diagonal assignment
    cost = jnp.asarray([[[10.0, 1.0, 50.0], [1.0, 10.0, 50.0]]])
    mask = jnp.asarray([[True, True, False]])
    assign = np.asarray(hungarian_assignment(cost, mask))
    np.testing.assert_array_equal(assign, [[1, 0]])


def test_hungarian_unmatched_queries():
    cost = jnp.asarray([[[1.0, 9.0], [2.0, 9.0], [3.0, 9.0]]])  # 3 queries, 1 valid target
    mask = jnp.asarray([[True, False]])
    assign = np.asarray(hungarian_assignment(cost, mask))
    assert (assign >= -1).all()
    assert (assign == 0).sum() == 1  # exactly one query matched to target 0
    assert (assign == -1).sum() == 2


def test_hungarian_no_targets():
    cost = jnp.ones((1, 3, 2))
    mask = jnp.zeros((1, 2), bool)
    assign = np.asarray(hungarian_assignment(cost, mask))
    np.testing.assert_array_equal(assign, -np.ones((1, 3)))


def test_sinkhorn_assignment_matches_hungarian_when_separable():
    rng = np.random.RandomState(0)
    # well-separated targets -> both matchers agree
    pred = jnp.asarray(rng.rand(1, 3, 4), jnp.float32)
    target = pred + 0.01 * rng.rand(1, 3, 4).astype(np.float32)
    cost = pairwise_l1(pred, target)
    mask = jnp.ones((1, 3), bool)
    h = np.asarray(hungarian_assignment(cost, mask))
    s = np.asarray(sinkhorn_assignment(cost, mask))
    np.testing.assert_array_equal(h, s)


def test_cross_entropy_ignore_index():
    logits = jnp.asarray([[[2.0, 0.0], [0.0, 2.0]]])
    targets = jnp.asarray([[0, 0]])
    full = cross_entropy(logits, targets)
    ignoring = cross_entropy(logits, jnp.asarray([[0, 0]]).at[0, 1].set(0), ignore_index=None)
    assert np.isclose(full, ignoring)
    # position 1 has target 0 (= ignore) -> only position 0 counts
    masked = cross_entropy(logits, targets, ignore_index=0)
    assert masked == 0.0 or masked >= 0  # all targets ignored -> 0/1 safe


def test_executor_loss_and_grads(model_and_vars):
    model, variables = model_and_vars
    batch = _batch()
    rng = np.random.RandomState(1)
    target_boxes = jnp.asarray(rng.rand(2, 3, 4), jnp.float32)
    target_mask = jnp.asarray([[1, 1, 0], [1, 0, 0]], bool)
    token_targets = jnp.asarray([3, 5], jnp.int32)
    is_box = jnp.asarray([True, False])

    def loss_fn(params):
        out = model.apply({"params": params}, *batch)
        losses = executor_set_loss(out, target_boxes, target_mask, token_targets, is_box, CFG)
        return losses["loss"], losses

    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert float(parts["routing_loss"]) > 0
    # sample 1 is token-branch: its queries contribute no box loss
    assert np.asarray(parts["assignment"]).shape == (2, CFG.num_queries)


def test_executor_overfits_tiny_batch(model_and_vars):
    """A few Adam steps must reduce the loss on a fixed batch (end-to-end
    differentiability through routing + matching + heads)."""
    model, variables = model_and_vars
    batch = _batch()
    rng = np.random.RandomState(1)
    target_boxes = jnp.asarray(rng.rand(2, 3, 4), jnp.float32)
    target_mask = jnp.asarray([[1, 1, 0], [1, 1, 0]], bool)
    token_targets = jnp.asarray([3, 5], jnp.int32)
    is_box = jnp.asarray([True, False])

    tx = optax.adam(1e-3)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, *batch)
            return executor_set_loss(
                out, target_boxes, target_mask, token_targets, is_box, CFG
            )["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[::10]


def test_perturb_input_boxes():
    from explainable_spatial_vqa_tpu.train.losses import perturb_input_boxes

    rng = np.random.RandomState(0)
    boxes = jnp.asarray(rng.rand(4, 6, 4), jnp.float32)
    mask = jnp.ones((4, 6), bool)
    out_b, out_m = perturb_input_boxes(boxes, mask, jax.random.PRNGKey(0), 0.05, 0.3)
    assert out_b.shape == boxes.shape
    assert not np.allclose(np.asarray(out_b), np.asarray(boxes))
    assert (np.asarray(out_b) >= 0).all() and (np.asarray(out_b) <= 1).all()
    assert np.asarray(out_m).sum() < 24  # some slots dropped
    # disabled -> identity
    same_b, same_m = perturb_input_boxes(boxes, mask, jax.random.PRNGKey(0), 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(same_b), np.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(same_m), np.asarray(mask))


def test_remat_executor_gradients_match():
    """Rematerialized fusion must produce identical loss and gradients."""
    import dataclasses

    cfg_remat = dataclasses.replace(CFG, remat=True)
    model = ProgramExecutor(CFG)
    model_remat = ProgramExecutor(cfg_remat)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), *batch)
    rng = np.random.RandomState(1)
    target_boxes = jnp.asarray(rng.rand(2, 3, 4), jnp.float32)
    target_mask = jnp.asarray([[1, 1, 0], [1, 0, 0]], bool)
    token_targets = jnp.asarray([3, 5], jnp.int32)
    is_box = jnp.asarray([True, False])

    def loss(mdl):
        def fn(p):
            out = mdl.apply({"params": p}, *batch)
            return executor_set_loss(out, target_boxes, target_mask,
                                     token_targets, is_box, CFG)["loss"]
        return jax.value_and_grad(fn)(variables["params"])

    l1, g1 = loss(model)
    l2, g2 = loss(model_remat)
    assert np.isclose(float(l1), float(l2), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sinkhorn_tau_sharpens():
    """Lower tau must approach the exact Hungarian assignment on a hard case."""
    rng = np.random.RandomState(3)
    cost = jnp.asarray(rng.rand(4, 5, 5), jnp.float32)
    mask = jnp.ones((4, 5), bool)
    exact = np.asarray(hungarian_assignment(cost, mask))
    sharp = np.asarray(sinkhorn_assignment(cost, mask, n_iters=200, tau=0.01))
    agreement = (exact == sharp).mean()
    assert agreement >= 0.9, agreement


def test_posemb_at_grid_centers_matches_grid_table():
    """posemb_2d_sincos_at evaluated AT a grid cell must equal that cell's
    row of the grid table channel-for-channel (the alignment that lets box
    tokens attend to their image patch; thesis p.17-18)."""
    from explainable_spatial_vqa_tpu.models.layers import (
        posemb_2d_sincos,
        posemb_2d_sincos_at,
    )

    d = 64
    grid = posemb_2d_sincos(14, 14, d).reshape(14, 14, d)
    cells = [(0, 0), (3, 7), (13, 13)]
    xy = jnp.asarray([[c / 14.0, r / 14.0] for r, c in cells], jnp.float32)
    at = np.asarray(posemb_2d_sincos_at(xy, d))
    for i, (r, c) in enumerate(cells):
        np.testing.assert_allclose(at[i], grid[r, c], atol=1e-5)


def test_roi_coverage_weights():
    """Coverage weights: exact-cell box -> one-hot on that token; a box
    spanning two cells equally -> 0.5/0.5; a padded zero box -> all-zero."""
    from explainable_spatial_vqa_tpu.models.executor import roi_coverage_weights

    g = 4
    boxes = jnp.asarray([
        [0.25, 0.50, 0.50, 0.75],   # exactly cell (row 2, col 1)
        [0.25, 0.00, 0.75, 0.25],   # cells (0,1) and (0,2), half each
        [0.00, 0.00, 0.00, 0.00],   # degenerate (padded slot)
    ], jnp.float32)
    w = np.asarray(roi_coverage_weights(boxes, g))
    expected0 = np.zeros(g * g); expected0[2 * g + 1] = 1.0
    np.testing.assert_allclose(w[0], expected0, atol=1e-6)
    expected1 = np.zeros(g * g); expected1[1] = 0.5; expected1[2] = 0.5
    np.testing.assert_allclose(w[1], expected1, atol=1e-6)
    np.testing.assert_allclose(w[2], np.zeros(g * g), atol=0)


def test_box_roi_forward_and_paths_agree():
    """box_roi executor: shapes/grads finite, and the precomputed-image
    (chained-inference cache) path matches the raw path exactly."""
    import dataclasses

    cfg = dataclasses.replace(CFG, box_roi=True)
    model = ProgramExecutor(cfg)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), *batch)
    assert "roi_proj" in variables["params"]
    out = model.apply(variables, *batch)
    assert out["token_logits"].shape == (2, cfg.token_classes)

    img, boxes, box_mask, text, text_mask = batch
    pre = model.apply(variables, img, method=ProgramExecutor.precompute_image)
    out_pre = model.apply(
        variables, pre, boxes, box_mask, text, text_mask,
        image_precomputed=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["token_logits"]), np.asarray(out_pre["token_logits"]),
        atol=1e-5,
    )

    def loss(p):
        o = model.apply({"params": p}, *batch)
        return jnp.sum(o["token_logits"] ** 2) + jnp.sum(o["pred_boxes"])

    grads = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(grads["roi_proj"]["kernel"])).sum() > 0


def test_roi_sim_noop_at_init_and_trains():
    """roi_sim executor: (a) zero-init sim_embed makes the similarity channel
    an EXACT no-op at init — outputs equal a box_roi-only model sharing every
    other parameter; (b) grads reach the sim projections; (c) the precomputed
    path matches the raw path; (d) roi_sim without box_roi raises."""
    import dataclasses

    cfg_roi = dataclasses.replace(CFG, box_roi=True)
    cfg_sim = dataclasses.replace(CFG, box_roi=True, roi_sim=True)
    batch = _batch()
    model_sim = ProgramExecutor(cfg_sim)
    variables = model_sim.init(jax.random.PRNGKey(0), *batch)
    for name in ("sim_roi_proj", "sim_img_proj", "sim_embed"):
        assert name in variables["params"]
    assert np.abs(np.asarray(variables["params"]["sim_embed"]["kernel"])).sum() == 0

    # (a) graft the shared params onto a box_roi-only model: identical output
    model_roi = ProgramExecutor(cfg_roi)
    shared = {k: v for k, v in variables["params"].items()
              if k not in ("sim_roi_proj", "sim_img_proj", "sim_embed")}
    out_sim = model_sim.apply(variables, *batch)
    out_roi = model_roi.apply({"params": shared}, *batch)
    np.testing.assert_allclose(
        np.asarray(out_sim["token_logits"]), np.asarray(out_roi["token_logits"]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_sim["pred_boxes"]), np.asarray(out_roi["pred_boxes"]),
        atol=1e-6)

    # (b) grads flow into the sim channel (zero-init kernel still gets grads
    # because its INPUT is nonzero; the upstream projections get grads once
    # the kernel moves — check via a two-step finite check on sim_embed)
    def loss(p):
        o = model_sim.apply({"params": p}, *batch)
        return jnp.sum(o["token_logits"] ** 2) + jnp.sum(o["pred_boxes"])

    grads = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(grads["sim_embed"]["kernel"])).sum() > 0

    # (c) precomputed-image path parity
    img, boxes, box_mask, text, text_mask = batch
    pre = model_sim.apply(variables, img, method=ProgramExecutor.precompute_image)
    out_pre = model_sim.apply(
        variables, pre, boxes, box_mask, text, text_mask,
        image_precomputed=True)
    np.testing.assert_allclose(
        np.asarray(out_sim["token_logits"]), np.asarray(out_pre["token_logits"]),
        atol=1e-5)

    # (d) config guard
    import dataclasses as dc
    bad = dc.replace(CFG, box_roi=False, roi_sim=True)
    with pytest.raises(ValueError, match="roi_sim requires box_roi"):
        ProgramExecutor(bad).init(jax.random.PRNGKey(0), *batch)


def test_roi_sim_masks_padded_slots():
    """A padded input-box slot must contribute nothing to the similarity
    channel: flipping the CONTENT of a masked slot's box coords must not
    change any output."""
    import dataclasses

    cfg = dataclasses.replace(CFG, box_roi=True, roi_sim=True)
    model = ProgramExecutor(cfg)
    img, boxes, box_mask, text, text_mask = _batch()
    variables = model.init(jax.random.PRNGKey(1), img, boxes, box_mask, text, text_mask)
    # randomize sim_embed so the channel is active
    p = jax.tree_util.tree_map(lambda x: x, variables["params"])
    p["sim_embed"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2), p["sim_embed"]["kernel"].shape) * 0.1
    out_a = model.apply({"params": p}, img, boxes, box_mask, text, text_mask)
    boxes_b = boxes.at[:, 2, :].set(jnp.asarray([0.1, 0.1, 0.9, 0.9]))
    out_b = model.apply({"params": p}, img, boxes_b, box_mask, text, text_mask)
    np.testing.assert_allclose(
        np.asarray(out_a["token_logits"]), np.asarray(out_b["token_logits"]),
        atol=1e-5)


def test_count_embed_noop_at_init_and_counts():
    """count_embed executor: (a) zero-init embedding is an EXACT no-op at
    init — outputs equal a plain model sharing every other parameter;
    (b) grads reach the embedding; (c) once the embedding is nonzero the
    output responds to the NUMBER of unmasked slots but never to the
    CONTENTS of a masked slot; (d) precomputed-image path parity."""
    import dataclasses

    cfg_cnt = dataclasses.replace(CFG, count_embed=True)
    batch = _batch()
    model_cnt = ProgramExecutor(cfg_cnt)
    variables = model_cnt.init(jax.random.PRNGKey(0), *batch)
    assert "count_embed" in variables["params"]
    assert np.abs(np.asarray(variables["params"]["count_embed"]["embedding"])).sum() == 0

    # (a) graft shared params onto the plain model: identical output
    model_plain = ProgramExecutor(CFG)
    shared = {k: v for k, v in variables["params"].items() if k != "count_embed"}
    out_cnt = model_cnt.apply(variables, *batch)
    out_plain = model_plain.apply({"params": shared}, *batch)
    np.testing.assert_allclose(
        np.asarray(out_cnt["token_logits"]), np.asarray(out_plain["token_logits"]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_cnt["pred_boxes"]), np.asarray(out_plain["pred_boxes"]),
        atol=1e-6)

    # (b) grads flow into the embedding
    def loss(p):
        o = model_cnt.apply({"params": p}, *batch)
        return jnp.sum(o["token_logits"] ** 2)

    grads = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(grads["count_embed"]["embedding"])).sum() > 0

    # (c) sensitivity to mask COUNT, invariance to masked-slot CONTENT
    img, boxes, box_mask, text, text_mask = batch
    p = dict(variables["params"])
    p["count_embed"] = {"embedding": jax.random.normal(
        jax.random.PRNGKey(2),
        variables["params"]["count_embed"]["embedding"].shape) * 0.1}
    out_a = model_cnt.apply({"params": p}, img, boxes, box_mask, text, text_mask)
    mask_b = box_mask.at[:, 1].set(False)  # 2 -> 1 unmasked slots
    out_b = model_cnt.apply({"params": p}, img, boxes, mask_b, text, text_mask)
    assert np.abs(np.asarray(out_a["token_logits"])
                  - np.asarray(out_b["token_logits"])).max() > 1e-6
    boxes_c = boxes.at[:, 2, :].set(jnp.asarray([0.1, 0.1, 0.9, 0.9]))
    out_c = model_cnt.apply({"params": p}, img, boxes_c, box_mask, text, text_mask)
    np.testing.assert_allclose(
        np.asarray(out_a["token_logits"]), np.asarray(out_c["token_logits"]),
        atol=1e-5)

    # (d) precomputed-image path parity
    pre = model_cnt.apply({"params": p}, img, method=ProgramExecutor.precompute_image)
    out_pre = model_cnt.apply(
        {"params": p}, pre, boxes, box_mask, text, text_mask,
        image_precomputed=True)
    np.testing.assert_allclose(
        np.asarray(out_a["token_logits"]), np.asarray(out_pre["token_logits"]),
        atol=1e-5)


def test_roi_sim_multihead():
    """roi_sim_heads=K: (a) still an exact no-op at init (zero-init
    sim_embed); (b) K must divide d_model; (c) with a randomized sim_embed,
    K=4 responds to masked-slot mask changes like K=1 but produces a
    DIFFERENT function (the reshaped per-head maps are a strictly different
    parameterization); (d) masked-slot content invariance holds per head."""
    import dataclasses

    cfg4 = dataclasses.replace(CFG, box_roi=True, roi_sim=True, roi_sim_heads=4)
    batch = _batch()
    img, boxes, box_mask, text, text_mask = batch
    model4 = ProgramExecutor(cfg4)
    variables = model4.init(jax.random.PRNGKey(0), *batch)
    # sim_embed input dim is S*K
    assert variables["params"]["sim_embed"]["kernel"].shape == (
        CFG.max_input_boxes * 4, CFG.d_model)

    # (a) no-op at init vs box_roi-only sharing every other param
    model_roi = ProgramExecutor(dataclasses.replace(CFG, box_roi=True))
    shared = {k: v for k, v in variables["params"].items()
              if k not in ("sim_roi_proj", "sim_img_proj", "sim_embed")}
    out4 = model4.apply(variables, *batch)
    out_roi = model_roi.apply({"params": shared}, *batch)
    np.testing.assert_allclose(
        np.asarray(out4["token_logits"]), np.asarray(out_roi["token_logits"]),
        atol=1e-6)

    # (b) validation
    bad = dataclasses.replace(CFG, box_roi=True, roi_sim=True, roi_sim_heads=5)
    with pytest.raises(ValueError, match="must divide"):
        ProgramExecutor(bad).init(jax.random.PRNGKey(0), *batch)

    # (c)+(d) randomize sim_embed: outputs move with mask, not with the
    # content of a masked slot
    p = dict(variables["params"])
    p["sim_embed"] = {"kernel": jax.random.normal(
        jax.random.PRNGKey(2), p["sim_embed"]["kernel"].shape) * 0.1,
        "bias": p["sim_embed"]["bias"]}
    out_a = model4.apply({"params": p}, img, boxes, box_mask, text, text_mask)
    mask_b = box_mask.at[:, 1].set(False)
    out_b = model4.apply({"params": p}, img, boxes, mask_b, text, text_mask)
    assert np.abs(np.asarray(out_a["token_logits"])
                  - np.asarray(out_b["token_logits"])).max() > 1e-6
    boxes_c = boxes.at[:, 2, :].set(jnp.asarray([0.1, 0.1, 0.9, 0.9]))
    out_c = model4.apply({"params": p}, img, boxes_c, box_mask, text, text_mask)
    np.testing.assert_allclose(
        np.asarray(out_a["token_logits"]), np.asarray(out_c["token_logits"]),
        atol=1e-5)
