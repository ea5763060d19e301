"""Per-family training pipelines: artifacts -> (model, loss_fn, batches).

Each function assembles one reference training script's data flow on top of
the unified Trainer (SURVEY.md §7 step 6): loading the h5 artifacts, building
split indices (sklearn-parity), defining the loss, and returning batch
factories.  Image features are gathered per batch from the (possibly mmap'd)
features array by ``image_index``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from explainable_spatial_vqa_tpu.core.artifacts import read_annotated_h5, read_questions_h5
from explainable_spatial_vqa_tpu.core.config import ExperimentConfig
from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
from explainable_spatial_vqa_tpu.models.generator import ProgramGenerator
from explainable_spatial_vqa_tpu.models.iqap import TransformerIQAP, generate_programs
from explainable_spatial_vqa_tpu.models.lstm_iqap import LstmIQAP
from explainable_spatial_vqa_tpu.models.step_executor import StepExecutorSeq2Seq
from explainable_spatial_vqa_tpu.train import datasets as ds
from explainable_spatial_vqa_tpu.train.data import Subset, batches, train_val_test_split
from explainable_spatial_vqa_tpu.train.losses import (
    cross_entropy,
    executor_set_loss,
    masked_box_regression_loss,
)
from explainable_spatial_vqa_tpu.train.metrics import (
    answer_metrics,
    masked_token_metrics,
    program_metrics,
)

logger = logging.getLogger(__name__)

__all__ = ["Pipeline", "build_pipeline"]


@dataclass
class Pipeline:
    model: Any
    params: Any
    loss_fn: Callable
    train_batches: Callable[[int], Iterable[Dict[str, np.ndarray]]]
    val_batches: Callable[[], Iterable[Dict[str, np.ndarray]]]
    test_batches: Callable[[], Iterable[Dict[str, np.ndarray]]]
    monitor: Tuple[str, str]
    steps_per_epoch: int


class _FeatureGather:
    """Batch transform attaching image features by image_index."""

    def __init__(self, features_h5: Optional[str], as_tokens: bool = True):
        self.features = None
        self.as_tokens = as_tokens
        if features_h5:
            self._file = h5py.File(features_h5, "r")
            self.features = self._file["features"]  # (N, 1024, 14, 14)

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.features is None:
            return batch
        idx = batch["image_index"]
        feats = np.stack([self.features[int(i)] for i in idx]).astype(np.float32)
        if self.as_tokens:
            n, c, h, w = feats.shape
            feats = feats.reshape(n, c, h * w).transpose(0, 2, 1)  # (N, P, C)
        batch = dict(batch)
        batch["image"] = feats
        return batch


def _splits(n: int, config: ExperimentConfig):
    d = config.data
    return train_val_test_split(n, d.test_split, d.validation_split, d.seed)


def _batch_factories(arrays, config, transform=None):
    n = len(next(iter(arrays.values())))
    train_idx, val_idx, test_idx = _splits(n, config)
    bs = config.train.batch_size
    train_sub, val_sub, test_sub = (Subset(arrays, i) for i in (train_idx, val_idx, test_idx))

    def train_b(epoch):
        return batches(train_sub, bs, shuffle=True, seed=config.data.seed, epoch=epoch,
                       transform=transform)

    def val_b():
        return batches(val_sub, bs, shuffle=False, transform=transform)

    def test_b():
        return batches(test_sub, bs, shuffle=False, transform=transform)

    return train_b, val_b, test_b, len(train_sub) // bs


# ---------------------------------------------------------------------------
# Families
# ---------------------------------------------------------------------------


def _generator_pipeline(config: ExperimentConfig) -> Pipeline:
    enc = read_questions_h5(config.data.questions_h5)
    assert enc.programs is not None
    arrays = {
        "questions": enc.questions,
        "programs": enc.programs,
        "image_index": enc.image_idxs,
    }
    model = ProgramGenerator(config.model)
    init_rngs = {"params": jax.random.PRNGKey(config.train.seed),
                 "sample": jax.random.PRNGKey(config.train.seed + 1)}
    variables = model.init(init_rngs, jnp.asarray(enc.questions[:2]),
                           jnp.asarray(enc.programs[:2]))

    def loss_fn(params, batch, rng, train):
        rngs = {"sample": rng, "dropout": jax.random.fold_in(rng, 1)} if train else {}
        out = model.apply(
            {"params": params}, batch["questions"], batch["programs"],
            deterministic=not train, rngs=rngs,
        )
        loss = cross_entropy(out["logits"], batch["programs"])
        m = program_metrics(jnp.argmax(out["logits"], -1), batch["programs"])
        return loss, m

    train_b, val_b, test_b, spe = _batch_factories(arrays, config)
    return Pipeline(model, variables["params"], loss_fn, train_b, val_b, test_b,
                    ("program_em", "program_em_total"), spe)


def _iqap_pipeline(config: ExperimentConfig) -> Pipeline:
    enc = read_questions_h5(config.data.questions_h5)
    arrays = {
        "questions": enc.questions,
        "answers": enc.answers,
        "programs": enc.programs,
        "image_index": enc.image_idxs,
    }
    arrays = {k: v for k, v in arrays.items() if v is not None}
    if config.model.with_bbox_head and getattr(config.data, "scenes_h5", None):
        # per-image GT boxes for the bbox-head variant (scenes artifact,
        # get_bounding_boxes.py layout), aligned by image_index
        from explainable_spatial_vqa_tpu.core.artifacts import read_scenes_h5

        scenes = read_scenes_h5(config.data.scenes_h5)
        # CLEVR image indices are dense 0..N-1; sort rows into index order
        order = np.argsort(scenes["image_index"])
        boxes_by_image = scenes["bounding_boxes"][order]
        labels_by_image = scenes["class_labels"][order]
        slots = config.model.num_bbox_slots
        gt = boxes_by_image[enc.image_idxs][:, :slots]
        gt_mask = (labels_by_image[enc.image_idxs][:, :slots] > 0)
        pad = slots - gt.shape[1]
        if pad > 0:
            gt = np.pad(gt, ((0, 0), (0, pad), (0, 0)))
            gt_mask = np.pad(gt_mask, ((0, 0), (0, pad)))
        arrays["target_boxes"] = gt.astype(np.float32)
        arrays["target_box_mask"] = gt_mask
    gather = _FeatureGather(config.data.features_h5, as_tokens=True)
    model = TransformerIQAP(config.model)
    cfg = config.model
    dummy_img = jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim))
    variables = model.init(
        jax.random.PRNGKey(config.train.seed), dummy_img,
        jnp.asarray(enc.questions[:2]), method=model.init_all,
    )

    def loss_fn(params, batch, rng, train):
        v = {"params": params}
        rngs = {"dropout": rng} if train else {}
        out = model.apply(v, batch["image"], batch["questions"],
                          deterministic=not train, rngs=rngs)
        loss = cross_entropy(out["answer_logits"], batch["answers"])
        metrics = answer_metrics(out["answer_logits"], batch["answers"])
        if "programs" in batch:
            # reference semantics: autoregressive generation even in training
            tokens, logits = generate_programs(model, v, out["memory"],
                                               max_len=batch["programs"].shape[1])
            loss = (cfg.answer_loss_weight * loss
                    + cfg.program_loss_weight * cross_entropy(logits, batch["programs"]))
            metrics.update(program_metrics(tokens, batch["programs"]))
        if "pred_boxes" in out and "target_boxes" in batch:
            loss = loss + masked_box_regression_loss(
                out["pred_boxes"], batch["target_boxes"], batch["target_box_mask"]
            )
            from explainable_spatial_vqa_tpu.train.metrics import mean_iou

            metrics.update(mean_iou(out["pred_boxes"], batch["target_boxes"],
                                    batch["target_box_mask"]))
        return loss, metrics

    train_b, val_b, test_b, spe = _batch_factories(arrays, config, gather)
    return Pipeline(model, variables["params"], loss_fn, train_b, val_b, test_b,
                    ("answer_correct", "answer_total"), spe)


def _lstm_iqap_pipeline(config: ExperimentConfig) -> Pipeline:
    enc = read_questions_h5(config.data.questions_h5)
    arrays = {
        "questions": enc.questions,
        "answers": enc.answers,
        "image_index": enc.image_idxs,
    }
    cfg = config.model
    if cfg.with_program_decoder and enc.programs is not None:
        arrays["programs"] = enc.programs
    gather = _FeatureGather(config.data.features_h5, as_tokens=False)
    model = LstmIQAP(cfg)
    dummy_img = jnp.zeros((2, cfg.image_feature_dim, *cfg.image_spatial))
    targets = jnp.asarray(enc.programs[:2]) if cfg.with_program_decoder else None
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        dummy_img, jnp.asarray(enc.questions[:2]), targets,
    )

    def loss_fn(params, batch, rng, train):
        rngs = {"sample": rng, "dropout": jax.random.fold_in(rng, 1)} if train else {}
        out = model.apply(
            {"params": params}, batch["image"], batch["questions"],
            batch.get("programs"), deterministic=not train, rngs=rngs,
        )
        loss = cross_entropy(out["answer_logits"], batch["answers"])
        metrics = answer_metrics(out["answer_logits"], batch["answers"])
        if "program_logits" in out and "programs" in batch:
            loss = loss + cross_entropy(out["program_logits"], batch["programs"])
            metrics.update(program_metrics(out["program_tokens"], batch["programs"]))
        return loss, metrics

    train_b, val_b, test_b, spe = _batch_factories(arrays, config, gather)
    return Pipeline(model, variables["params"], loss_fn, train_b, val_b, test_b,
                    ("answer_correct", "answer_total"), spe)


def _step_seq2seq_pipeline(config: ExperimentConfig) -> Pipeline:
    annotated = read_annotated_h5(config.data.annotated_h5)
    arrays = ds.flatten_steps(
        annotated,
        max_src_len=config.model.max_src_len,
        max_tgt_len=config.model.max_tgt_len,
        subset_fraction=config.data.subset_fraction,
    )
    gather = _FeatureGather(config.data.features_h5, as_tokens=True)
    model = StepExecutorSeq2Seq(config.model)
    cfg = config.model
    dummy_img = jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim))
    variables = model.init(
        jax.random.PRNGKey(config.train.seed), dummy_img,
        jnp.asarray(arrays["src"][:2]), jnp.asarray(arrays["tgt"][:2, :-1]),
    )

    def loss_fn(params, batch, rng, train):
        rngs = {"dropout": rng} if train else {}
        logits = model.apply(
            {"params": params}, batch["image"], batch["src"], batch["tgt"][:, :-1],
            batch["src"] != 0, deterministic=not train, rngs=rngs,
        )
        targets = batch["tgt"][:, 1:]
        loss = cross_entropy(logits, targets, ignore_index=0)
        metrics = masked_token_metrics(jnp.argmax(logits, -1), targets)
        return loss, metrics

    train_b, val_b, test_b, spe = _batch_factories(arrays, config, gather)
    return Pipeline(model, variables["params"], loss_fn, train_b, val_b, test_b,
                    ("token_correct", "token_total"), spe)


def _executor_pipeline(config: ExperimentConfig) -> Pipeline:
    """Thesis-final executor on raw annotated questions + split vocab."""
    from explainable_spatial_vqa_tpu.core.vocab import load_vocab

    annotated = read_annotated_h5(config.data.annotated_h5)
    vocabs = load_vocab(config.data.split_vocab_json)
    cfg = config.model
    arrays = ds.executor_step_arrays(
        annotated, vocabs["function"], vocabs["other"],
        max_input_boxes=cfg.max_input_boxes,
        max_output_boxes=cfg.num_queries,
        subset_fraction=config.data.subset_fraction,
    )
    gather = _FeatureGather(config.data.features_h5, as_tokens=True)
    model = ProgramExecutor(cfg)
    dummy = (
        jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim)),
        jnp.zeros((2, cfg.max_input_boxes, 4)),
        jnp.ones((2, cfg.max_input_boxes), bool),
        jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    variables = model.init(jax.random.PRNGKey(config.train.seed), *dummy)

    def loss_fn(params, batch, rng, train):
        rngs = {"dropout": rng} if train else {}
        input_boxes, input_mask = batch["input_boxes"], batch["input_box_mask"]
        if train and (cfg.input_box_noise > 0.0 or cfg.input_box_drop > 0.0):
            from explainable_spatial_vqa_tpu.train.losses import perturb_input_boxes

            input_boxes, input_mask = perturb_input_boxes(
                input_boxes, input_mask, jax.random.fold_in(rng, 7),
                cfg.input_box_noise, cfg.input_box_drop,
            )
        out = model.apply(
            {"params": params}, batch["image"], input_boxes,
            input_mask, batch["text"], batch["text_mask"],
            deterministic=not train, rngs=rngs,
        )
        losses = executor_set_loss(
            out, batch["target_boxes"], batch["target_box_mask"],
            batch["token_target"], batch["is_box_branch"], cfg,
        )
        routing_pred = jnp.argmax(out["routing_logits"], -1)
        routing_target = 1 - batch["is_box_branch"].astype(jnp.int32)
        token_pred = jnp.argmax(out["token_logits"], -1)
        tok_n = jnp.sum(~batch["is_box_branch"])
        metrics = {
            "routing_correct": jnp.sum(routing_pred == routing_target),
            "routing_total": routing_pred.shape[0],
            "token_correct": jnp.sum(
                (token_pred == batch["token_target"]) & ~batch["is_box_branch"]
            ),
            "token_total": tok_n,
        }
        return losses["loss"], metrics

    train_b, val_b, test_b, spe = _batch_factories(arrays, config, gather)
    return Pipeline(model, variables["params"], loss_fn, train_b, val_b, test_b,
                    ("routing_correct", "routing_total"), spe)


def _iqap_cot_pipeline(config: ExperimentConfig) -> Pipeline:
    """CoT (bbox-as-tokens) variant over mapped_sequences.h5: the combined
    program/answer sequence is decoded with CE skipping bbox-coordinate
    tokens (train_transformer_iqap_cot.py semantics, device-side mask)."""
    import json as _json

    from explainable_spatial_vqa_tpu.core.annotated_strings import read_mapped_sequences
    from explainable_spatial_vqa_tpu.models.cot import bbox_token_table, cross_entropy_skip_bbox

    mapped = read_mapped_sequences(config.data.mapped_sequences_h5)
    with open(config.data.string_vocab_json) as f:
        vocab_blob = _json.load(f)
    token_to_id = vocab_blob.get("token_to_id", vocab_blob)
    idx_to_token = {int(v): k for k, v in token_to_id.items()}

    cfg = config.model
    vocab_size = max(len(token_to_id), cfg.program_vocab_size)
    import dataclasses as _dc

    cfg = _dc.replace(
        cfg, vocab_size=vocab_size, program_vocab_size=vocab_size,
        num_answer_classes=vocab_size,
        program_len=int(mapped["program_tokens"].shape[1]),
        max_question_len=int(mapped["question_tokens"].shape[1]),
    )
    bbox_table = jnp.asarray(bbox_token_table(idx_to_token, vocab_size))

    arrays = {
        "questions": mapped["question_tokens"].astype(np.int32),
        "programs": mapped["program_tokens"].astype(np.int32),
        "answers": mapped["answer_tokens"][:, 0].astype(np.int32),
        "image_index": mapped["image_index"].astype(np.int32),
    }
    gather = _FeatureGather(config.data.features_h5, as_tokens=True)
    model = TransformerIQAP(cfg)
    dummy_img = jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim))
    variables = model.init(
        jax.random.PRNGKey(config.train.seed), dummy_img,
        jnp.asarray(arrays["questions"][:2]), method=model.init_all,
    )

    def loss_fn(params, batch, rng, train):
        v = {"params": params}
        rngs = {"dropout": rng} if train else {}
        out = model.apply(v, batch["image"], batch["questions"],
                          deterministic=not train, rngs=rngs)
        answer_loss = cross_entropy(out["answer_logits"], batch["answers"])
        # teacher-forced combined-sequence decode; CE skips bbox tokens
        programs = batch["programs"]
        inputs = jnp.concatenate(
            [jnp.full((programs.shape[0], 1), 1, jnp.int32), programs[:, :-1]], axis=1
        )
        logits = model.apply(v, inputs, out["memory"], method=model.decode_programs_tf)
        seq_loss = cross_entropy_skip_bbox(logits, programs, bbox_table, ignore_index=0)
        pred = jnp.argmax(logits, -1)
        metrics = answer_metrics(out["answer_logits"], batch["answers"])
        metrics.update(masked_token_metrics(pred, programs))
        return answer_loss + seq_loss, metrics

    train_b, val_b, test_b, spe = _batch_factories(arrays, config, gather)
    return Pipeline(model, variables["params"], loss_fn, train_b, val_b, test_b,
                    ("answer_correct", "answer_total"), spe)


_FAMILIES = {
    "generator": _generator_pipeline,
    "iqap": _iqap_pipeline,
    "lstm_iqap": _lstm_iqap_pipeline,
    "step_seq2seq": _step_seq2seq_pipeline,
    "iqap_cot": _iqap_cot_pipeline,
    "executor": _executor_pipeline,
}


def build_pipeline(config: ExperimentConfig) -> Pipeline:
    if config.model_family not in _FAMILIES:
        raise KeyError(f"unknown model family {config.model_family!r}")
    return _FAMILIES[config.model_family](config)
