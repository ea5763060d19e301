"""Chain-level scheduled sampling: dataset builder consistency with the flat
teacher-forced builder, GT-cache input equivalence, loss/grad sanity, and a
tiny end-to-end training run through the pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
from explainable_spatial_vqa_tpu.train import datasets as ds


@pytest.fixture(scope="module")
def corpus():
    from explainable_spatial_vqa_tpu.clevr import annotate as ann
    from explainable_spatial_vqa_tpu.clevr import synthetic as syn
    from explainable_spatial_vqa_tpu.clevr.scenes import Scene
    from explainable_spatial_vqa_tpu.core import vocab as voc

    scenes_raw, questions = syn.synthesize_dataset(16, 3, seed=3)
    scenes = {s["image_index"]: Scene.from_raw(s) for s in scenes_raw}
    annotated = ann.annotate_questions(questions, scenes)
    split_vocab = voc.build_split_vocab(annotated)
    return annotated, split_vocab["function"], split_vocab["other"], len(scenes_raw)


def test_chain_arrays_consistent_with_flat(corpus):
    annotated, fvocab, ovocab, _ = corpus
    flat = ds.executor_step_arrays(annotated, fvocab, ovocab)
    chain = ds.executor_chain_step_arrays(annotated, fvocab, ovocab)

    # no synthetic question exceeds max_steps, so every flat record appears
    # as exactly one valid chain step, in the same order
    assert int(chain["step_valid"].sum()) == len(flat["image_index"])
    assert (chain["num_steps"] == [len(q["annotated_program"]) for q in annotated]).all()

    i = 0
    for qi in range(len(chain["image_index"])):
        for k in range(int(chain["num_steps"][qi])):
            if not chain["step_valid"][qi, k]:
                continue
            assert chain["image_index"][qi] == flat["image_index"][i]
            assert chain["is_box_branch"][qi, k] == flat["is_box_branch"][i]
            np.testing.assert_array_equal(
                chain["target_boxes"][qi, k], flat["target_boxes"][i]
            )
            np.testing.assert_array_equal(
                chain["target_box_mask"][qi, k], flat["target_box_mask"][i]
            )
            if not flat["is_box_branch"][i]:
                assert chain["token_target"][qi, k] == flat["token_target"][i]
            i += 1
    assert i == len(flat["image_index"])


def test_gt_state_reproduces_flat_inputs(corpus):
    """Gathering dependencies from the GT caches must reproduce the flat
    builder's teacher-forced inputs (boxes exactly; text up to the positional
    vs compacted slot convention, identical when dep token sets match)."""
    from explainable_spatial_vqa_tpu.infer.chain import gather_step_inputs
    from explainable_spatial_vqa_tpu.train.scheduled import gt_chain_state

    annotated, fvocab, ovocab, _ = corpus
    flat = ds.executor_step_arrays(annotated, fvocab, ovocab)
    chain = ds.executor_chain_step_arrays(annotated, fvocab, ovocab)
    cfg = ExecutorConfig(max_input_boxes=10, num_queries=10)

    batch = {k: jnp.asarray(v) for k, v in chain.items()}
    state = gt_chain_state(batch, cfg)

    s = chain["functions"].shape[1]
    per_step = []
    for k in range(s):
        per_step.append(gather_step_inputs(
            state, batch["functions"][:, k], batch["deps"][:, k, 0],
            batch["deps"][:, k, 1], cfg.max_input_boxes,
        ))

    i = 0
    checked_boxes = 0
    for qi in range(len(chain["image_index"])):
        for k in range(int(chain["num_steps"][qi])):
            if not chain["step_valid"][qi, k]:
                continue
            input_boxes, input_mask, text, text_mask = (
                np.asarray(t[qi]) for t in per_step[k]
            )
            np.testing.assert_allclose(
                input_boxes[input_mask],
                flat["input_boxes"][i][flat["input_box_mask"][i]],
                atol=1e-6,
            )
            # same token multiset in the two value slots
            assert sorted(text[1:][text_mask[1:]]) == sorted(
                flat["text"][i][1:][flat["text_mask"][i][1:]]
            )
            assert text[0] == flat["text"][i][0]
            checked_boxes += int(input_mask.sum())
            i += 1
    assert checked_boxes > 0  # the corpus exercises box-typed dependencies


def _tiny_cfg(**kw):
    base = dict(
        vocab_size=64, d_model=32, num_heads=2, encoder_layers=1,
        box_decoder_layers=1, num_queries=4, num_image_tokens=4,
        image_feature_dim=8, max_input_boxes=4, token_classes=32,
        dropout=0.0,
    )
    base.update(kw)
    return ExecutorConfig(**base)


def test_scheduled_loss_and_grads(corpus):
    from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
    from explainable_spatial_vqa_tpu.train.scheduled import make_scheduled_loss_fn

    annotated, fvocab, ovocab, n_img = corpus
    cfg = _tiny_cfg(scheduled_p_max=0.5)
    chain = ds.executor_chain_step_arrays(
        annotated, fvocab, ovocab, max_steps=12, max_output_boxes=cfg.num_queries
    )
    n = min(8, len(chain["image_index"]))
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v[:n]) for k, v in chain.items()}
    batch["image"] = jnp.asarray(
        rng.rand(n, cfg.num_image_tokens, cfg.image_feature_dim), jnp.float32
    )
    batch["p_sample"] = jnp.float32(0.7)

    model = ProgramExecutor(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["image"][:2],
        jnp.zeros((2, cfg.max_input_boxes, 4)),
        jnp.ones((2, cfg.max_input_boxes), bool),
        jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    loss_fn = make_scheduled_loss_fn(model, cfg)

    (loss, metrics), grads = jax.jit(
        lambda p, b, r: jax.value_and_grad(loss_fn, has_aux=True)(p, b, r, True)
    )(variables["params"], batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0
    )
    assert gnorm > 0.0
    assert float(metrics["routing_total"]) == float(batch["step_valid"].sum())

    # eval path: teacher-forced, no p_sample needed
    loss_eval, _ = jax.jit(
        lambda p, b, r: loss_fn(p, b, r, False)
    )(variables["params"], batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss_eval))

    # grounding noise composes with the scheduled mixture
    noisy_cfg = _tiny_cfg(scheduled_p_max=0.5, input_box_noise=0.05,
                          input_box_drop=0.2)
    noisy_fn = make_scheduled_loss_fn(model, noisy_cfg)
    (loss_n, _), grads_n = jax.jit(
        lambda p, b, r: jax.value_and_grad(noisy_fn, has_aux=True)(p, b, r, True)
    )(variables["params"], batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss_n))
    assert float(loss_n) != float(loss)  # the perturbation changed inputs
    # eval stays deterministic (no noise applied)
    loss_eval_n, _ = jax.jit(
        lambda p, b, r: noisy_fn(p, b, r, False)
    )(variables["params"], batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(loss_eval_n), float(loss_eval), rtol=1e-6)


@pytest.mark.slow
def test_scheduled_pipeline_trains(corpus, tmp_path):
    """End-to-end: preset pipeline + Trainer for 2 epochs on tiny shapes."""
    import dataclasses

    from explainable_spatial_vqa_tpu.core.artifacts import write_annotated_h5
    from explainable_spatial_vqa_tpu.core.config import get_preset
    from explainable_spatial_vqa_tpu.core.vocab import save_vocab
    from explainable_spatial_vqa_tpu.train.pipelines import build_pipeline
    from explainable_spatial_vqa_tpu.train.trainer import Trainer

    annotated, fvocab, ovocab, n_img = corpus
    import h5py

    write_annotated_h5(annotated, str(tmp_path / "annotated.h5"))
    save_vocab({"function": fvocab, "other": ovocab}, str(tmp_path / "vocab.json"))
    rng = np.random.RandomState(0)
    with h5py.File(tmp_path / "features.h5", "w") as f:
        f.create_dataset(
            "features", data=rng.rand(n_img, 8, 2, 2).astype(np.float32)
        )

    cfg = get_preset("executor_scheduled")
    cfg = cfg.replace(
        model=_tiny_cfg(num_image_tokens=4, image_feature_dim=8,
                        scheduled_p_max=0.5, scheduled_ramp_epochs=2),
        data=dataclasses.replace(
            cfg.data,
            annotated_h5=str(tmp_path / "annotated.h5"),
            split_vocab_json=str(tmp_path / "vocab.json"),
            features_h5=str(tmp_path / "features.h5"),
        ),
        train=dataclasses.replace(cfg.train, batch_size=8, num_epochs=2),
    )
    pipe = build_pipeline(cfg)
    trainer = Trainer(pipe.loss_fn, pipe.params, cfg.optim, cfg.train,
                      steps_per_epoch=pipe.steps_per_epoch,
                      checkpoint_dir=False)  # never resume from a stray dir
    history = trainer.fit(pipe.train_batches, pipe.val_batches, monitor=pipe.monitor)
    losses = [e["loss_sum"] / e["batches"] for e in history["train"]]
    assert len(losses) == 2 and all(np.isfinite(losses)), losses
