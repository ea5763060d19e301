"""Typed configuration system.

Replaces the reference's per-script ``class Config`` constant blocks and
hardcoded laptop/cluster path switches (e.g. train_transformer_iqap.py:16-40)
with one dataclass tree plus named experiment presets.  Every preset
reproduces one reference training script as configuration, per SURVEY.md §2.2.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

__all__ = [
    "DataConfig",
    "OptimConfig",
    "GeneratorConfig",
    "ExecutorConfig",
    "IQAPConfig",
    "LstmIQAPConfig",
    "StepSeq2SeqConfig",
    "PrototypeStepConfig",
    "TrainConfig",
    "ExperimentConfig",
    "PRESETS",
    "get_preset",
]


@dataclass(frozen=True)
class DataConfig:
    features_h5: str = "data/train_features.h5"
    questions_h5: str = "data/train_questions.h5"
    annotated_h5: str = "data/annotated_questions.h5"
    mapped_sequences_h5: str = "data/mapped_sequences.h5"
    scenes_h5: str = ""  # GT boxes for the iqap_bb variant (optional)
    string_vocab_json: str = "data/string_vocab.json"
    vocab_json: str = "data/vocab.json"
    split_vocab_json: str = "data/vocab3.json"
    image_dir: str = ""  # raw PNGs for the from-pixels YOLO variant
    max_question_len: int = 46
    max_program_len: int = 27
    max_src_len: int = 50
    max_tgt_len: int = 20
    max_input_boxes: int = 18
    max_output_boxes: int = 10
    subset_fraction: float = 1.0
    validation_split: float = 0.1
    test_split: float = 0.1
    seed: int = 42


@dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip_norm: Optional[float] = None
    lr_step_size: Optional[int] = None  # epochs between step decays
    lr_gamma: float = 0.1
    weight_decay: float = 0.0


@dataclass(frozen=True)
class GeneratorConfig:
    """Program generator (thesis §3.4.1: 3-layer bi-LSTM encoder, 3-layer
    decoder with Luong dot attention, emb 300, hid 512, TF 0.5)."""

    vocab_size: int = 96
    program_vocab_size: int = 45
    embed_dim: int = 300
    hidden_dim: int = 512
    encoder_layers: int = 3
    decoder_layers: int = 3
    bidirectional: bool = True
    attention: bool = True
    dropout: float = 0.3
    teacher_forcing: float = 0.5
    program_len: int = 27
    simple: bool = False  # True = checked-in 1-layer no-attention variant


@dataclass(frozen=True)
class ExecutorConfig:
    """Program executor (thesis §3.4.2: fusion encoder CLS+P+10+3 d=512 3L/4H,
    routing head, DETR-style box decoder with 10 queries/2L, token head)."""

    vocab_size: int = 128
    d_model: int = 512
    num_heads: int = 4
    encoder_layers: int = 3
    box_decoder_layers: int = 2
    num_queries: int = 10
    num_image_tokens: int = 196
    image_feature_dim: int = 1024
    max_input_boxes: int = 10
    num_text_tokens: int = 3
    token_classes: int = 32
    dropout: float = 0.1
    conf_threshold: float = 0.5
    # loss weights (thesis Table 4.1)
    routing_weight: float = 0.1
    bbox_weight: float = 5.0
    token_weight: float = 1.0
    # Hungarian cost weights
    cost_l1: float = 5.0
    cost_giou: float = 2.0
    cost_conf: float = 1.0
    matcher: str = "auto"  # auto = hungarian_jax (exact, in-jit, any backend);
    # also: hungarian (host callback), sinkhorn (entropic relaxation)
    sinkhorn_iters: int = 20
    sinkhorn_tau: float = 1.0  # lower = sharper (closer to exact assignment)
    # grounding-noise augmentation: at train time, jitter dependency boxes and
    # drop/spoof box slots to simulate imperfect upstream predictions (the
    # chained-inference regime).  0 disables (reference-faithful training).
    input_box_noise: float = 0.0
    input_box_drop: float = 0.0
    # scheduled sampling (chain-level): with probability p, a step's
    # dependency inputs are drawn from the model's OWN chained predictions
    # (computed in a stop-gradient pass with current params) instead of the
    # ground-truth caches; p ramps 0 -> scheduled_p_max linearly over
    # scheduled_ramp_epochs.  Trains the executor on the distribution it
    # actually sees at chained inference (beyond the stateless
    # input_box_noise jitter).  Used by the executor_scheduled preset.
    scheduled_p_max: float = 0.0
    scheduled_ramp_epochs: int = 5
    remat: bool = False  # rematerialize fusion blocks (memory vs FLOPs)
    # ROI content for input-box tokens (beyond-reference, off by default —
    # thesis p.18 encodes boxes from coords + center posemb only): each
    # dependency-box token additionally receives the coverage-weighted
    # average of the image tokens under its box, projected to d_model.
    # Motivation: attribute-at-box readout (query_*/same_*) otherwise has to
    # LEARN box<->patch binding through positional cross-attention from a
    # handful of samples, and measurably sits at chance (DEMO.md Table 4.4).
    box_roi: bool = False
    # Content-similarity channel (beyond-reference, off by default; requires
    # box_roi): every image token additionally receives a zero-init projection
    # of its learned-bilinear similarity to each input-box's pooled ROI
    # content.  Motivation: same_*/relate must mark ALL patches whose content
    # matches the dependency box — a content-content matching problem that
    # positional cross-attention learns slowly; this exposes the match map
    # directly (one einsum).  Zero-init ⇒ exact no-op at initialization.
    roi_sim: bool = False
    # Number of similarity heads for roi_sim.  One bilinear form yields a
    # single FULL-content match map, but same_color must match in the color
    # subspace only and same_shape in the shape subspace — different
    # functions need different similarity projections.  K heads split the
    # projected dims into K independent match maps (a basis the fusion can
    # select from via the function token).  K=1 is exactly the original
    # channel (same param shapes, same math), so existing roi_sim
    # checkpoints load unchanged.
    roi_sim_heads: int = 1
    # Input-box-count embedding (beyond-reference, off by default): CLS
    # additionally receives a zero-init embedding of the NUMBER of unmasked
    # input-box slots.  Motivation: ``count``/``exist`` must count set
    # members through attention pooling — notoriously weak — while the set
    # size is explicit in the hard boolean mask at the interface (GT set in
    # teacher-forced training, thresholded confident boxes at chained
    # inference).  Note: under grounding-noise ``input_box_drop`` the
    # training-time mask is the POST-drop one, so the channel is trained as
    # "observed count" against the true-count target — which matches
    # inference, where upstream recall < 1 drops boxes the same way.
    # Zero-init ⇒ exact no-op at init.
    count_embed: bool = False


@dataclass(frozen=True)
class IQAPConfig:
    """Transformer IQAP baseline family (train_transformer_iqap*.py)."""

    vocab_size: int = 96
    program_vocab_size: int = 45
    num_answer_classes: int = 32
    embed_dim: int = 256
    hidden_dim: int = 256
    num_heads: int = 4
    encoder_layers: int = 2
    decoder_layers: int = 2
    num_image_tokens: int = 196
    image_feature_dim: int = 1024
    program_len: int = 27
    max_question_len: int = 46
    dropout: float = 0.1
    sos_token: int = 1
    answer_loss_weight: float = 1.0
    program_loss_weight: float = 1.0
    with_bbox_head: bool = False
    num_bbox_slots: int = 10


@dataclass(frozen=True)
class LstmIQAPConfig:
    """LSTM IQAP/IQA family (train_lstm_iqap.py / train_lstm_iqa.py)."""

    vocab_size: int = 96
    program_vocab_size: int = 45
    num_answer_classes: int = 32
    embed_dim: int = 256
    hidden_dim: int = 512
    image_feature_dim: int = 1024
    image_spatial: Tuple[int, int] = (14, 14)
    program_len: int = 27
    with_program_decoder: bool = True
    teacher_forcing: float = 0.5
    dropout: float = 0.5


@dataclass(frozen=True)
class StepSeq2SeqConfig:
    """Step executor seq2seq (train_transformer_full_annotation_new.py:35-76)."""

    vocab_size: int = 128
    d_model: int = 256
    num_heads: int = 4
    encoder_layers: int = 2
    decoder_layers: int = 2
    ffn_dim: int = 512
    dropout: float = 0.1
    max_src_len: int = 50
    max_tgt_len: int = 20
    num_image_tokens: int = 196
    image_feature_dim: int = 1024


@dataclass(frozen=True)
class PrototypeStepConfig:
    """One config for the reference's prototype per-step model families
    (preprocess_scenes/training_*.py, inference_bbinout.py):

    - ``token_only``   — TokenOnlyPredictor (training_token_only.py:135-304)
    - ``bb_only``      — BBoxOnlyPredictor, positional box regression
                         (training_bb_only.py; iou_weight>0 = v2's +IoU loss)
    - ``multitask_bb`` — MultiTaskBBoxTokenPredictor + set-matching loss
                         (training_bb_and_tokensv2-1_hungarian.py:231-372)
    - ``selection``    — BBoxSelectionPredictor, per-input-box membership
                         (inference_bbinout.py:104-195)
    - ``multihead``    — MultiHeadStepModel, 8 typed heads + AR box decoder
                         (training2.py:288-433)
    - ``hierarchical`` — HierarchicalGenerator (training.py:105-224)
    - ``yolo``         — YoloDetector from raw pixels + grid loss
                         (training_bb_onlyv3.py:53-208)
    """

    kind: str = "token_only"
    function_vocab_size: int = 64
    token_vocab_size: int = 64
    vocab_size: int = 64  # multihead text vocab
    max_input_boxes: int = 18
    max_output_boxes: int = 10
    image_feature_dim: int = 1024
    image_spatial: Tuple[int, int] = (14, 14)
    num_image_tokens: int = 196
    iou_weight: float = 0.0  # bb_only v2: + iou_weight * (1 - IoU)
    # multitask_bb set loss (duck-typed into train.losses.executor_set_loss)
    matcher: str = "sinkhorn"  # the reference script's own relaxation
    sinkhorn_iters: int = 20
    sinkhorn_tau: float = 1.0
    cost_l1: float = 5.0
    cost_giou: float = 2.0
    cost_conf: float = 1.0
    routing_weight: float = 1.0
    bbox_weight: float = 1.0
    token_weight: float = 1.0
    input_box_noise: float = 0.0
    input_box_drop: float = 0.0
    # yolo
    grid: int = 7
    image_size: int = 224


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 16
    num_epochs: int = 100
    patience: int = 10
    checkpoint_dir: str = "checkpoints"
    checkpoint_interval: int = 10
    log_every: int = 50
    eval_every: int = 1
    # compute dtype for model matmuls; params/softmax/layernorm stay float32.
    # "auto" = bfloat16 on TPU (the production convention), float32 elsewhere
    # (CPU bf16 is emulated and slow).  Consumed by train.pipelines.
    dtype: str = "auto"
    mesh_shape: Tuple[int, ...] = (-1,)  # -1 = all devices on the data axis
    mesh_axes: Tuple[str, ...] = ("data",)
    seed: int = 42
    resume: bool = True


@dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model_family: str  # generator | executor | iqap | lstm_iqap | step_seq2seq
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    model: Any = None

    def replace(self, **kwargs: Any) -> "ExperimentConfig":
        return dataclasses.replace(self, **kwargs)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)


def _preset_map() -> Dict[str, ExperimentConfig]:
    presets: Dict[str, ExperimentConfig] = {}

    # Thesis-final pair (hyperparams of record: BASELINE.md / thesis Table 4.1)
    presets["generator"] = ExperimentConfig(
        name="generator",
        model_family="generator",
        model=GeneratorConfig(),
        optim=OptimConfig(learning_rate=1e-3),
        train=TrainConfig(batch_size=64, num_epochs=20, patience=5),
    )
    presets["executor"] = ExperimentConfig(
        name="executor",
        model_family="executor",
        model=ExecutorConfig(),
        optim=OptimConfig(learning_rate=1e-4),
        train=TrainConfig(batch_size=16, num_epochs=100, patience=10),
    )

    # Beyond-reference: ROI content injection for dependency-box tokens
    # (ExecutorConfig.box_roi) — fixes attribute-at-box readout
    # (query_*/same_*), which otherwise has to learn box<->patch binding
    # from a handful of samples (DEMO.md box-ROI diagnostic).
    presets["executor_roi"] = ExperimentConfig(
        name="executor_roi",
        model_family="executor",
        model=ExecutorConfig(box_roi=True),
        optim=OptimConfig(learning_rate=1e-4),
        train=TrainConfig(batch_size=16, num_epochs=100, patience=10),
    )

    # Beyond-reference: box_roi + input-box-count embedding
    # (ExecutorConfig.count_embed) — count/exist read the input-set size
    # directly instead of counting through attention pooling.
    presets["executor_roi_count"] = ExperimentConfig(
        name="executor_roi_count",
        model_family="executor",
        model=ExecutorConfig(box_roi=True, count_embed=True),
        optim=OptimConfig(learning_rate=1e-4),
        train=TrainConfig(batch_size=16, num_epochs=100, patience=10),
    )

    # Beyond-reference: box_roi + content-similarity channel
    # (ExecutorConfig.roi_sim) — gives same_*/relate the "all patches whose
    # content matches the dependency box" map directly.
    presets["executor_roi_sim"] = ExperimentConfig(
        name="executor_roi_sim",
        model_family="executor",
        model=ExecutorConfig(box_roi=True, roi_sim=True),
        optim=OptimConfig(learning_rate=1e-4),
        train=TrainConfig(batch_size=16, num_epochs=100, patience=10),
    )

    # all three opt-in channels together — the round-5 capacity-scale
    # decision configuration (roi_sim K=4 subspace match maps + the
    # count identity hint on top of box_roi; DESIGN.md par-11-13)
    presets["executor_roi_sim_count"] = ExperimentConfig(
        name="executor_roi_sim_count",
        model_family="executor",
        model=ExecutorConfig(box_roi=True, roi_sim=True, roi_sim_heads=4,
                             count_embed=True),
        optim=OptimConfig(learning_rate=1e-4),
        train=TrainConfig(batch_size=16, num_epochs=100, patience=10),
    )

    presets["executor_scheduled"] = ExperimentConfig(
        name="executor_scheduled",
        model_family="executor_scheduled",
        model=ExecutorConfig(scheduled_p_max=0.5, scheduled_ramp_epochs=5),
        optim=OptimConfig(learning_rate=1e-4),
        train=TrainConfig(batch_size=16, num_epochs=100, patience=10),
    )

    # Checked-in reference script configurations
    presets["lstm_qp"] = ExperimentConfig(
        name="lstm_qp",
        model_family="generator",
        model=GeneratorConfig(
            embed_dim=256, hidden_dim=512, encoder_layers=1, decoder_layers=1,
            bidirectional=False, attention=False, dropout=0.5, simple=True,
        ),
        optim=OptimConfig(learning_rate=1e-3),
        train=TrainConfig(batch_size=64, num_epochs=20, patience=5),
    )
    presets["transformer_iqap"] = ExperimentConfig(
        name="transformer_iqap",
        model_family="iqap",
        model=IQAPConfig(),
        optim=OptimConfig(learning_rate=1e-3, grad_clip_norm=1.0, lr_step_size=10),
        train=TrainConfig(batch_size=64, num_epochs=100, patience=10),
    )
    presets["transformer_iqap_bb"] = ExperimentConfig(
        name="transformer_iqap_bb",
        model_family="iqap",
        model=IQAPConfig(encoder_layers=1, decoder_layers=1, with_bbox_head=True),
        optim=OptimConfig(learning_rate=1e-3, grad_clip_norm=1.0),
        train=TrainConfig(batch_size=64, num_epochs=100, patience=10),
    )
    presets["lstm_iqap"] = ExperimentConfig(
        name="lstm_iqap",
        model_family="lstm_iqap",
        model=LstmIQAPConfig(),
        optim=OptimConfig(learning_rate=1e-3),
        train=TrainConfig(batch_size=64, num_epochs=50, patience=5),
    )
    presets["lstm_iqa"] = ExperimentConfig(
        name="lstm_iqa",
        model_family="lstm_iqap",
        model=LstmIQAPConfig(with_program_decoder=False),
        optim=OptimConfig(learning_rate=1e-3),
        train=TrainConfig(batch_size=64, num_epochs=50, patience=5),
    )
    presets["transformer_iqap_cot"] = ExperimentConfig(
        name="transformer_iqap_cot",
        model_family="iqap_cot",
        model=IQAPConfig(encoder_layers=1, decoder_layers=1, program_len=100,
                         max_question_len=20),
        optim=OptimConfig(learning_rate=1e-3, grad_clip_norm=1.0),
        train=TrainConfig(batch_size=64, num_epochs=100, patience=10),
    )
    presets["step_seq2seq"] = ExperimentConfig(
        name="step_seq2seq",
        model_family="step_seq2seq",
        model=StepSeq2SeqConfig(),
        optim=OptimConfig(learning_rate=1e-4),
        train=TrainConfig(batch_size=32, num_epochs=10),
    )

    # Prototype step-model families (preprocess_scenes/training_*.py) — each
    # reference trainer as a preset over the shared annotated-step arrays.
    def proto(name, kind, lr=1e-3, bs=32, epochs=10, clip=None, **kw):
        presets[name] = ExperimentConfig(
            name=name,
            model_family="prototype_step",
            model=PrototypeStepConfig(kind=kind, **kw),
            optim=OptimConfig(learning_rate=lr, grad_clip_norm=clip),
            train=TrainConfig(batch_size=bs, num_epochs=epochs, patience=3),
        )

    proto("token_only", "token_only", lr=1e-3)          # training_token_only.py
    proto("bb_only", "bb_only")                          # training_bb_only.py (v1)
    proto("bb_only_iou", "bb_only", iou_weight=1.0)      # training_bb_onlyv2.py
    proto("yolo_bb", "yolo", lr=1e-4)                    # training_bb_onlyv3.py
    proto("multitask_bb", "multitask_bb", lr=1e-3)       # hungarian/sinkhorn script
    proto("bbinout", "selection", lr=1e-3)               # inference_bbinout.py
    # lr 1e-4 + clipping: the flattened-image Dense (200k fan-in) diverges
    # at 1e-3 on random features
    proto("multihead", "multihead", lr=1e-4, clip=1.0)   # training2.py
    proto("hierarchical", "hierarchical", lr=1e-3)       # training.py
    return presets


PRESETS: Dict[str, ExperimentConfig] = _preset_map()


def get_preset(name: str, **overrides: Any) -> ExperimentConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    config = PRESETS[name]
    if overrides:
        config = config.replace(**overrides)
    return config
