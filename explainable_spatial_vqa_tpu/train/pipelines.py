"""Per-family training pipelines: artifacts -> (model, loss_fn, batches).

Each function assembles one reference training script's data flow on top of
the unified Trainer (SURVEY.md §7 step 6): loading the h5 artifacts, building
split indices (sklearn-parity), defining the loss, and returning batch
factories.  Image features are gathered per batch from the (possibly mmap'd)
features array by ``image_index``.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
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


def _process_info():
    """(process_index, process_count) for per-host batch sharding; (0, 1)
    single-host.  Every factory passes these through so a multi-host run
    (parallel/multihost.py) reads only its own rows of each global batch."""
    import jax

    return jax.process_index(), jax.process_count()


def _batch_factories(arrays, config, transform=None):
    n = len(next(iter(arrays.values())))
    train_idx, val_idx, test_idx = _splits(n, config)
    bs = config.train.batch_size
    train_sub, val_sub, test_sub = (Subset(arrays, i) for i in (train_idx, val_idx, test_idx))
    pi, pc = _process_info()

    def train_b(epoch):
        return batches(train_sub, bs, shuffle=True, seed=config.data.seed, epoch=epoch,
                       transform=transform, process_index=pi, process_count=pc)

    def val_b():
        return batches(val_sub, bs, shuffle=False, transform=transform,
                       process_index=pi, process_count=pc)

    def test_b():
        return batches(test_sub, bs, shuffle=False, transform=transform,
                       process_index=pi, process_count=pc)

    return train_b, val_b, test_b, len(train_sub) // bs


# ---------------------------------------------------------------------------
# Families
# ---------------------------------------------------------------------------


def _generator_pipeline(config: ExperimentConfig) -> Pipeline:
    import dataclasses as _dc

    enc = read_questions_h5(config.data.questions_h5)
    assert enc.programs is not None
    arrays = {
        "questions": enc.questions,
        "programs": enc.programs,
        "image_index": enc.image_idxs,
    }
    # grow vocab sizes to the data (reference infers shapes from data maxima,
    # get_data_info); max(preset, data) so eval-side reconstruction matches
    cfg = _dc.replace(
        config.model,
        vocab_size=max(config.model.vocab_size, int(enc.questions.max()) + 1),
        program_vocab_size=max(config.model.program_vocab_size,
                               int(enc.programs.max()) + 1),
        program_len=enc.programs.shape[1],
    )
    config = config.replace(model=cfg)
    model = ProgramGenerator(config.model, dtype=model_dtype(config))
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


def model_dtype(config: ExperimentConfig):
    """Resolve TrainConfig.dtype to a jnp dtype for model construction.

    "auto" follows the repo convention (CLAUDE.md): bfloat16 compute on TPU,
    float32 elsewhere; params/softmax/layernorm stay fp32 inside the models
    regardless."""
    name = config.train.dtype
    if name == "auto":
        # "axon" is the sandbox's remote-TPU backend (same idiom as
        # ops.pallas_attention.pallas_available)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        name = "bfloat16" if on_tpu else "float32"
    return jnp.dtype(name)


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
        # map by image_index VALUE, not row position: a scenes h5 exported
        # from a filtered/offset split is not dense 0..N-1, and positional
        # indexing would silently pair questions with other images' boxes
        row_of = {int(v): i for i, v in enumerate(scenes["image_index"])}
        missing = sorted({int(i) for i in enc.image_idxs} - set(row_of))
        if missing:
            raise ValueError(
                f"scenes_h5 lacks image indices {missing[:5]}"
                f"{'...' if len(missing) > 5 else ''} referenced by questions"
            )
        rows = np.asarray([row_of[int(i)] for i in enc.image_idxs])
        slots = config.model.num_bbox_slots
        gt = scenes["bounding_boxes"][rows][:, :slots]
        gt_mask = (scenes["class_labels"][rows][:, :slots] > 0)
        pad = slots - gt.shape[1]
        if pad > 0:
            gt = np.pad(gt, ((0, 0), (0, pad), (0, 0)))
            gt_mask = np.pad(gt_mask, ((0, 0), (0, pad)))
        arrays["target_boxes"] = gt.astype(np.float32)
        arrays["target_box_mask"] = gt_mask
    gather = _FeatureGather(config.data.features_h5, as_tokens=True)
    model = TransformerIQAP(config.model, dtype=model_dtype(config))
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
    model = LstmIQAP(cfg, dtype=model_dtype(config))
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
    model = StepExecutorSeq2Seq(config.model, dtype=model_dtype(config))
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

    import dataclasses as _dc

    annotated = read_annotated_h5(config.data.annotated_h5)
    vocabs = load_vocab(config.data.split_vocab_json)
    cfg = _dc.replace(
        config.model,
        vocab_size=max(config.model.vocab_size, len(vocabs["function"]) + 1),
        token_classes=max(config.model.token_classes, len(vocabs["other"]) + 1),
    )
    arrays = ds.executor_step_arrays(
        annotated, vocabs["function"], vocabs["other"],
        max_input_boxes=cfg.max_input_boxes,
        max_output_boxes=cfg.num_queries,
        subset_fraction=config.data.subset_fraction,
    )
    gather = _FeatureGather(config.data.features_h5, as_tokens=True)
    model = ProgramExecutor(cfg, dtype=model_dtype(config))
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


def _executor_scheduled_pipeline(config: ExperimentConfig) -> Pipeline:
    """Thesis executor trained with chain-level scheduled sampling: per-step
    dependency inputs are a p-mixture of ground-truth caches and the model's
    own chained predictions (train.scheduled; DAgger-style exposure-bias
    fix beyond the stateless input_box_noise jitter)."""
    from explainable_spatial_vqa_tpu.core.vocab import load_vocab
    from explainable_spatial_vqa_tpu.train.scheduled import (
        make_scheduled_loss_fn,
        schedule_p,
    )

    import dataclasses as _dc

    annotated = read_annotated_h5(config.data.annotated_h5)
    vocabs = load_vocab(config.data.split_vocab_json)
    cfg = _dc.replace(
        config.model,
        vocab_size=max(config.model.vocab_size, len(vocabs["function"]) + 1),
        token_classes=max(config.model.token_classes, len(vocabs["other"]) + 1),
    )
    arrays = ds.executor_chain_step_arrays(
        annotated, vocabs["function"], vocabs["other"],
        max_steps=28,
        max_output_boxes=cfg.num_queries,
        subset_fraction=config.data.subset_fraction,
    )
    gather = _FeatureGather(config.data.features_h5, as_tokens=True)
    model = ProgramExecutor(cfg, dtype=model_dtype(config))
    dummy = (
        jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim)),
        jnp.zeros((2, cfg.max_input_boxes, 4)),
        jnp.ones((2, cfg.max_input_boxes), bool),
        jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    variables = model.init(jax.random.PRNGKey(config.train.seed), *dummy)
    loss_fn = make_scheduled_loss_fn(model, cfg)

    n = len(arrays["image_index"])
    train_idx, val_idx, test_idx = _splits(n, config)
    bs = config.train.batch_size
    train_sub, val_sub, test_sub = (
        Subset(arrays, i) for i in (train_idx, val_idx, test_idx)
    )

    def with_p(p):
        def transform(batch):
            batch = gather(batch)
            batch["p_sample"] = np.float32(p)
            return batch

        return transform

    pi, pc = _process_info()

    def train_b(epoch):
        return batches(train_sub, bs, shuffle=True, seed=config.data.seed,
                       epoch=epoch, transform=with_p(schedule_p(epoch, cfg)),
                       process_index=pi, process_count=pc)

    def val_b():
        return batches(val_sub, bs, shuffle=False, transform=with_p(0.0),
                       process_index=pi, process_count=pc)

    def test_b():
        return batches(test_sub, bs, shuffle=False, transform=with_p(0.0),
                       process_index=pi, process_count=pc)

    return Pipeline(model, variables["params"], loss_fn, train_b, val_b, test_b,
                    ("routing_correct", "routing_total"), len(train_sub) // bs)


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
    model = TransformerIQAP(cfg, dtype=model_dtype(config))
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


class _ImageGather:
    """Batch transform attaching decoded raw images by image_index (for the
    from-pixels YOLO variant; training_bb_onlyv3.py trains on images).

    Decoded images are kept in a bounded LRU cache (a full CLEVR train split
    would otherwise pin ~40 GB of float32 pixels on the host)."""

    def __init__(self, image_dir: str, size: int = 224, cache_images: int = 2048):
        from explainable_spatial_vqa_tpu.vision.extract import collect_image_paths

        if not image_dir:
            raise ValueError(
                "this preset trains from raw pixels: pass --image_dir with "
                "the CLEVR PNG directory (DataConfig.image_dir is empty)"
            )
        self.paths = collect_image_paths(image_dir)
        self.size = size
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._cache_images = cache_images

    def _load(self, idx: int) -> np.ndarray:
        if idx in self._cache:
            self._cache.move_to_end(idx)
            return self._cache[idx]
        from explainable_spatial_vqa_tpu.vision.extract import _decode_resize_pil

        arr = _decode_resize_pil(
            self.paths[idx], (self.size, self.size)
        ).astype(np.float32) / 255.0
        self._cache[idx] = arr
        if len(self._cache) > self._cache_images:
            self._cache.popitem(last=False)
        return arr

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        batch = dict(batch)
        batch["image"] = np.stack([self._load(int(i)) for i in batch["image_index"]])
        return batch


def _prototype_step_pipeline(config: ExperimentConfig) -> Pipeline:
    """The reference's prototype per-step trainers as one family
    (preprocess_scenes/training_*.py, inference_bbinout.py): all consume the
    flattened annotated-step arrays; `kind` picks model + loss."""
    from explainable_spatial_vqa_tpu.core.vocab import load_vocab
    from explainable_spatial_vqa_tpu.models import prototypes as proto
    from explainable_spatial_vqa_tpu.train.losses import binary_cross_entropy

    annotated = read_annotated_h5(config.data.annotated_h5)
    vocabs = load_vocab(config.data.split_vocab_json)
    cfg = config.model
    import dataclasses as _dc

    cfg = _dc.replace(
        cfg,
        function_vocab_size=max(cfg.function_vocab_size, len(vocabs["function"]) + 1),
        token_vocab_size=max(cfg.token_vocab_size, len(vocabs["other"]) + 1),
        vocab_size=max(cfg.vocab_size, len(vocabs["other"]) + 1,
                       len(vocabs["function"]) + 1),
    )
    arrays = ds.executor_step_arrays(
        annotated, vocabs["function"], vocabs["other"],
        max_input_boxes=cfg.max_input_boxes,
        max_output_boxes=cfg.max_output_boxes,
        subset_fraction=config.data.subset_fraction,
    )
    kind = cfg.kind

    if kind == "multihead":
        arrays.update(ds.multihead_typed_targets(arrays, vocabs["function"],
                                                 vocabs["other"]))
    if kind == "selection":
        arrays["selected"] = ds.selection_targets(arrays)
    if kind == "yolo":
        arrays["yolo_target"] = ds.yolo_grid_targets(
            arrays["target_boxes"], arrays["target_box_mask"], cfg.grid)

    # family-appropriate sample filters (the reference trainers slice the
    # dataset the same way: token_only keeps token steps, bb_only box steps)
    if kind == "token_only":
        keep = ~arrays["is_box_branch"]
    elif kind in ("bb_only", "yolo"):
        keep = arrays["is_box_branch"]
    elif kind == "selection":
        keep = arrays["is_box_branch"] & arrays["input_box_mask"].any(-1)
    else:
        keep = np.ones(len(arrays["is_box_branch"]), bool)
    arrays = {k: v[keep] for k, v in arrays.items()}
    if len(arrays["is_box_branch"]) < 2:
        raise ValueError(
            f"preset kind {kind!r} found {len(arrays['is_box_branch'])} usable "
            f"step samples in {config.data.annotated_h5} — check that the "
            f"annotated h5 and --split_vocab_json come from the same annotate "
            f"run (e.g. `annotate --mode v3 --vocab_output vocab3.json`)"
        )

    as_tokens = kind != "multihead"  # multihead flattens (C, H, W) directly
    if kind == "yolo":
        gather: Any = _ImageGather(config.data.image_dir, cfg.image_size)
    else:
        gather = _FeatureGather(config.data.features_h5, as_tokens=as_tokens)

    b2 = lambda k: jnp.asarray(arrays[k][:2])  # noqa: E731
    rng0 = jax.random.PRNGKey(config.train.seed)

    if kind == "token_only":
        model = proto.TokenOnlyPredictor(
            token_vocab_size=cfg.token_vocab_size,
            function_vocab_size=cfg.function_vocab_size,
            max_input_boxes=cfg.max_input_boxes,
            dtype=model_dtype(config))
        dummy_img = jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim))
        variables = model.init(rng0, dummy_img, b2("text")[:, 0], b2("input_boxes"))

        def loss_fn(params, batch, rng, train):
            logits = model.apply({"params": params}, batch["image"],
                                 batch["text"][:, 0], batch["input_boxes"])
            loss = cross_entropy(logits, batch["token_target"])
            pred = jnp.argmax(logits, -1)
            return loss, {
                "token_correct": jnp.sum(pred == batch["token_target"]),
                "token_total": pred.shape[0],
            }

        monitor = ("token_correct", "token_total")

    elif kind == "bb_only":
        model = proto.BBoxOnlyPredictor(
            max_output_boxes=cfg.max_output_boxes,
            function_vocab_size=cfg.function_vocab_size,
            max_input_boxes=cfg.max_input_boxes,
            dtype=model_dtype(config))
        dummy_img = jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim))
        variables = model.init(rng0, dummy_img, b2("text")[:, 0], b2("input_boxes"))

        def loss_fn(params, batch, rng, train):
            out = model.apply({"params": params}, batch["image"],
                              batch["text"][:, 0], batch["input_boxes"])
            boxes, conf = out[..., :4], out[..., 4]
            mask = batch["target_box_mask"]
            mse = jnp.sum(((boxes - batch["target_boxes"]) ** 2)
                          * mask[..., None]) / jnp.maximum(jnp.sum(mask) * 4, 1.0)
            conf_loss = jnp.mean(binary_cross_entropy(conf, mask.astype(jnp.float32)))
            loss = mse + conf_loss
            from explainable_spatial_vqa_tpu.ops.matching import box_iou

            iou = box_iou(boxes, batch["target_boxes"])
            if cfg.iou_weight > 0.0:  # v2 (+IoU term)
                loss = loss + cfg.iou_weight * (
                    jnp.sum((1.0 - iou) * mask) / jnp.maximum(jnp.sum(mask), 1.0))
            return loss, {
                "iou_sum": jnp.sum(iou * mask),
                "iou_total": jnp.sum(mask),
            }

        monitor = ("iou_sum", "iou_total")

    elif kind == "multitask_bb":
        model = proto.MultiTaskBBoxTokenPredictor(
            max_output_boxes=cfg.max_output_boxes,
            token_vocab_size=cfg.token_vocab_size,
            function_vocab_size=cfg.function_vocab_size,
            max_input_boxes=cfg.max_input_boxes,
            dtype=model_dtype(config))
        dummy_img = jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim))
        variables = model.init(rng0, dummy_img, b2("text")[:, 0], b2("input_boxes"))

        def loss_fn(params, batch, rng, train):
            out = model.apply({"params": params}, batch["image"],
                              batch["text"][:, 0], batch["input_boxes"])
            losses = executor_set_loss(
                out, batch["target_boxes"], batch["target_box_mask"],
                batch["token_target"], batch["is_box_branch"], cfg,
            )
            routing_pred = jnp.argmax(out["routing_logits"], -1)
            routing_target = 1 - batch["is_box_branch"].astype(jnp.int32)
            return losses["loss"], {
                "routing_correct": jnp.sum(routing_pred == routing_target),
                "routing_total": routing_pred.shape[0],
            }

        monitor = ("routing_correct", "routing_total")

    elif kind == "selection":
        model = proto.BBoxSelectionPredictor(
            function_vocab_size=cfg.function_vocab_size,
            max_input_boxes=cfg.max_input_boxes,
            dtype=model_dtype(config))
        dummy_img = jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim))
        variables = model.init(rng0, dummy_img, b2("text")[:, 0], b2("input_boxes"))

        def loss_fn(params, batch, rng, train):
            logits = model.apply({"params": params}, batch["image"],
                                 batch["text"][:, 0], batch["input_boxes"])
            mask = batch["input_box_mask"].astype(jnp.float32)
            bce = binary_cross_entropy(jax.nn.sigmoid(logits), batch["selected"])
            loss = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            pred = (logits > 0).astype(jnp.float32)
            return loss, {
                "select_correct": jnp.sum((pred == batch["selected"]) * mask),
                "select_total": jnp.sum(mask),
            }

        monitor = ("select_correct", "select_total")

    elif kind == "multihead":
        model = proto.MultiHeadStepModel(
            vocab_size=cfg.vocab_size,
            image_feat_dim=cfg.image_feature_dim,
            image_spatial=tuple(cfg.image_spatial),
            max_bbox_steps=cfg.max_output_boxes,
            dtype=model_dtype(config))
        dummy_img = jnp.zeros((2, cfg.image_feature_dim, *cfg.image_spatial))
        variables = model.init(
            {"params": rng0, "sample": jax.random.fold_in(rng0, 1)},
            b2("text")[:, 0], b2("text")[:, 1:], dummy_img, b2("target_boxes"),
            deterministic=False)

        def loss_fn(params, batch, rng, train):
            rngs = {"sample": rng} if train else {}
            out = model.apply(
                {"params": params}, batch["text"][:, 0], batch["text"][:, 1:],
                batch["image"], batch["target_boxes"],
                deterministic=not train, rngs=rngs)
            head_id = batch["head_id"]
            typed = batch["typed_target"]
            total = jnp.zeros(())
            # typed heads: CE dispatched per sample by head routing.  Clamp
            # targets into each head's class range — other heads' targets can
            # exceed it, and an OOB gather fills NaN which poisons the sum
            # even at weight 0 (0 * NaN = NaN).
            for h, name in enumerate(ds.MULTIHEAD_HEADS):
                if name == "bbox":
                    continue
                sel = (head_id == h).astype(jnp.float32)
                safe_t = jnp.minimum(typed, out[name].shape[-1] - 1)
                total = total + cross_entropy(out[name], safe_t, label_weights=sel)
            # bbox branch: masked coordinate MSE + stop CE
            is_box = (head_id == 0)
            mask = batch["target_box_mask"] & is_box[:, None]
            mse = jnp.sum(((out["bbox"] - batch["target_boxes"]) ** 2)
                          * mask[..., None]) / jnp.maximum(jnp.sum(mask) * 4, 1.0)
            stop_target = (~batch["target_box_mask"]).astype(jnp.int32)
            stop_ce = cross_entropy(
                out["bbox_stop_logits"], stop_target,
                label_weights=jnp.broadcast_to(is_box[:, None], stop_target.shape
                                               ).astype(jnp.float32))
            total = total + mse + stop_ce
            head_acc_n = jnp.zeros(())
            head_acc_c = jnp.zeros(())
            for h, name in enumerate(ds.MULTIHEAD_HEADS):
                if name == "bbox":
                    continue
                sel = head_id == h
                pred = jnp.argmax(out[name], -1)
                head_acc_c = head_acc_c + jnp.sum((pred == typed) & sel)
                head_acc_n = head_acc_n + jnp.sum(sel)
            return total, {"typed_correct": head_acc_c, "typed_total": head_acc_n}

        monitor = ("typed_correct", "typed_total")

    elif kind == "hierarchical":
        model = proto.HierarchicalGenerator(
            num_image_tokens=cfg.num_image_tokens,
            image_feature_dim=cfg.image_feature_dim,
            max_inner_steps=cfg.max_output_boxes,
            dtype=model_dtype(config))
        dummy_img = jnp.zeros((2, cfg.num_image_tokens, cfg.image_feature_dim))
        variables = model.init(rng0, dummy_img, b2("target_boxes"))

        def loss_fn(params, batch, rng, train):
            out = model.apply({"params": params}, batch["image"],
                              batch["target_boxes"])
            is_box = batch["is_box_branch"]
            type_target = (~is_box).astype(jnp.int32)
            loss = cross_entropy(out["type_logits"], type_target)
            mask = batch["target_box_mask"] & is_box[:, None]
            loss = loss + jnp.sum(((out["pred_boxes"] - batch["target_boxes"]) ** 2)
                                  * mask[..., None]) / jnp.maximum(jnp.sum(mask) * 4, 1.0)
            stop_target = (~batch["target_box_mask"]).astype(jnp.float32)
            stop_bce = binary_cross_entropy(jax.nn.sigmoid(out["stop_logits"]),
                                            stop_target)
            box_rows = is_box[:, None].astype(jnp.float32)
            loss = loss + jnp.sum(stop_bce * box_rows) / jnp.maximum(
                jnp.sum(box_rows) * stop_target.shape[1], 1.0)
            value_err = (out["nonspatial_value"]
                         - batch["token_target"].astype(jnp.float32)) ** 2
            loss = loss + jnp.sum(value_err * ~is_box) / jnp.maximum(
                jnp.sum(~is_box), 1.0)
            type_pred = jnp.argmax(out["type_logits"], -1)
            return loss, {
                "type_correct": jnp.sum(type_pred == type_target),
                "type_total": type_pred.shape[0],
            }

        monitor = ("type_correct", "type_total")

    elif kind == "yolo":
        model = proto.YoloDetector(grid=cfg.grid, dtype=model_dtype(config))
        dummy_img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
        variables = model.init(rng0, dummy_img)

        def loss_fn(params, batch, rng, train):
            from explainable_spatial_vqa_tpu.models.prototypes import yolo_grid_loss

            pred = model.apply({"params": params}, batch["image"])
            loss = yolo_grid_loss(pred, batch["yolo_target"])
            obj = batch["yolo_target"][..., 4] > 0
            hit = (pred[..., 4] > 0.5) == obj
            return loss, {
                "cell_correct": jnp.sum(hit),
                "cell_total": hit.size,
            }

        monitor = ("cell_correct", "cell_total")

    else:
        raise KeyError(f"unknown prototype kind {kind!r}")

    train_b, val_b, test_b, spe = _batch_factories(arrays, config, gather)
    return Pipeline(model, variables["params"], loss_fn, train_b, val_b, test_b,
                    monitor, spe)


_FAMILIES = {
    "generator": _generator_pipeline,
    "iqap": _iqap_pipeline,
    "lstm_iqap": _lstm_iqap_pipeline,
    "step_seq2seq": _step_seq2seq_pipeline,
    "iqap_cot": _iqap_cot_pipeline,
    "executor": _executor_pipeline,
    "executor_scheduled": _executor_scheduled_pipeline,
    "prototype_step": _prototype_step_pipeline,
}


def build_pipeline(config: ExperimentConfig) -> Pipeline:
    if config.model_family not in _FAMILIES:
        raise KeyError(f"unknown model family {config.model_family!r}")
    return _FAMILIES[config.model_family](config)
