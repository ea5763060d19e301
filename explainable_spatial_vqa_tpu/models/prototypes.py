"""Executor prototype families (SURVEY.md §2.2).

The reference explored the executor design through a series of prototype
models; each is reimplemented here as a compact Flax module so every config
the reference can train remains trainable:

- ``FusedStepEncoder`` + ``TokenOnlyPredictor`` / ``BBoxOnlyPredictor`` /
  ``MultiTaskBBoxTokenPredictor``: avg-pooled image FC-256 (+) function-
  embedding FC-32 (+) flattened-input-boxes FC-64 -> 352-d fusion with typed
  heads (training_token_only.py:135-165, training_bb_only*.py,
  training_bb_and_tokensv2-1_hungarian.py:231-280).
- ``BBoxSelectionPredictor``: per-input-box binary "in the output set" logits
  over [global image+function feat | per-box MLP feat]
  (inference_bbinout.py:126-161).
- ``MultiHeadStepModel``: LSTM text encoder + flattened-image FC -> shared
  representation -> 8 typed heads incl. an autoregressive LSTM box decoder
  emitting (box, stop) per step with scheduled teacher forcing
  (preprocess_scenes/training2.py:75-350) — the decoder loop is an nn.scan.
- ``YoloDetector`` + ``yolo_grid_loss``: tiny conv backbone from raw pixels
  -> (S, S, 5) grid with obj/noobj-weighted MSE
  (training_bb_onlyv3.py:141-208).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "FusedStepEncoder",
    "TokenOnlyPredictor",
    "BBoxOnlyPredictor",
    "MultiTaskBBoxTokenPredictor",
    "BBoxSelectionPredictor",
    "MultiHeadStepModel",
    "HierarchicalGenerator",
    "CompositionalStepPredictor",
    "YoloDetector",
    "yolo_grid_loss",
]


class FusedStepEncoder(nn.Module):
    """352-d fused (image, function, input-boxes) representation."""

    function_vocab_size: int = 40
    function_emb_dim: int = 32
    max_input_boxes: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, image_feat: jnp.ndarray, func_token: jnp.ndarray, input_boxes: jnp.ndarray
    ) -> jnp.ndarray:
        """image_feat: (B, C, H, W) or (B, P, C); func_token (B,);
        input_boxes (B, max_input_boxes, 4)."""
        if image_feat.ndim == 4:
            pooled = jnp.mean(image_feat, axis=(2, 3))  # (B, C)
        else:
            pooled = jnp.mean(image_feat, axis=1)
        x_img = nn.Dense(256, dtype=self.dtype, name="img_fc")(pooled.astype(self.dtype))
        emb = nn.Embed(self.function_vocab_size, self.function_emb_dim, name="func_emb")(
            func_token
        ).astype(self.dtype)
        x_func = nn.Dense(32, dtype=self.dtype, name="func_fc")(emb)
        flat = input_boxes.reshape(input_boxes.shape[0], -1).astype(self.dtype)
        x_box = nn.Dense(64, dtype=self.dtype, name="bbox_fc1")(flat)
        x_box = nn.Dense(64, dtype=self.dtype, name="bbox_fc2")(nn.relu(x_box))
        return jnp.concatenate([x_img, x_func, x_box], axis=-1)  # (B, 352)


class TokenOnlyPredictor(nn.Module):
    """Fused encoder + single token head (training_token_only.py)."""

    token_vocab_size: int = 29
    function_vocab_size: int = 40
    max_input_boxes: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_feat, func_token, input_boxes) -> jnp.ndarray:
        fused = FusedStepEncoder(
            self.function_vocab_size, max_input_boxes=self.max_input_boxes,
            dtype=self.dtype, name="encoder",
        )(image_feat, func_token, input_boxes)
        h = nn.relu(nn.Dense(64, dtype=self.dtype, name="head_hidden")(fused))
        return nn.Dense(self.token_vocab_size, dtype=jnp.float32, name="head_out")(h)


class BBoxOnlyPredictor(nn.Module):
    """Fused encoder + box-set head (training_bb_only*.py)."""

    max_output_boxes: int = 10
    function_vocab_size: int = 40
    max_input_boxes: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_feat, func_token, input_boxes) -> jnp.ndarray:
        fused = FusedStepEncoder(
            self.function_vocab_size, max_input_boxes=self.max_input_boxes,
            dtype=self.dtype, name="encoder",
        )(image_feat, func_token, input_boxes)
        h = nn.relu(nn.Dense(256, dtype=self.dtype, name="head_hidden")(fused))
        out = nn.Dense(self.max_output_boxes * 5, dtype=jnp.float32, name="head_out")(h)
        return nn.sigmoid(out.reshape(-1, self.max_output_boxes, 5))


class MultiTaskBBoxTokenPredictor(nn.Module):
    """Branch head + box head + token head over the fused representation
    (the Sinkhorn/Hungarian training script's model, hungarian:231-280).
    Set-matching losses come from train.losses.executor_set_loss with
    matcher='sinkhorn'."""

    max_output_boxes: int = 10
    token_vocab_size: int = 29
    function_vocab_size: int = 40
    max_input_boxes: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_feat, func_token, input_boxes) -> Dict[str, jnp.ndarray]:
        fused = FusedStepEncoder(
            self.function_vocab_size, max_input_boxes=self.max_input_boxes,
            dtype=self.dtype, name="encoder",
        )(image_feat, func_token, input_boxes)
        branch = nn.Dense(2, dtype=jnp.float32, name="branch_head")(fused)
        h = nn.relu(nn.Dense(256, dtype=self.dtype, name="bbox_hidden")(fused))
        raw = nn.Dense(self.max_output_boxes * 5, dtype=jnp.float32, name="bbox_out")(h)
        boxes = nn.sigmoid(raw.reshape(-1, self.max_output_boxes, 5))
        t = nn.relu(nn.Dense(64, dtype=self.dtype, name="token_hidden")(fused))
        token = nn.Dense(self.token_vocab_size, dtype=jnp.float32, name="token_out")(t)
        return {
            "routing_logits": branch,
            "pred_boxes": boxes[..., :4],
            "pred_conf": boxes[..., 4],
            "token_logits": token,
        }


class BBoxSelectionPredictor(nn.Module):
    """Per-input-box selection logits (inference_bbinout.py:126-161)."""

    function_vocab_size: int = 40
    function_emb_dim: int = 32
    max_input_boxes: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_feat, func_token, input_boxes) -> jnp.ndarray:
        if image_feat.ndim == 4:
            pooled = jnp.mean(image_feat, axis=(2, 3))
        else:
            pooled = jnp.mean(image_feat, axis=1)
        x_img = nn.Dense(128, dtype=self.dtype, name="img_fc")(pooled.astype(self.dtype))
        emb = nn.Embed(self.function_vocab_size, self.function_emb_dim, name="func_emb")(
            func_token
        ).astype(self.dtype)
        x_func = nn.Dense(32, dtype=self.dtype, name="func_fc")(emb)
        global_feat = jnp.concatenate([x_img, x_func], axis=-1)  # (B, 160)
        box = nn.Dense(16, dtype=self.dtype, name="box_fc1")(input_boxes.astype(self.dtype))
        box = nn.Dense(16, dtype=self.dtype, name="box_fc2")(nn.relu(box))  # (B, S, 16)
        expanded = jnp.broadcast_to(
            global_feat[:, None, :], (box.shape[0], box.shape[1], global_feat.shape[-1])
        )
        combined = jnp.concatenate([expanded, box], axis=-1)  # (B, S, 176)
        h = nn.relu(nn.Dense(64, dtype=self.dtype, name="head_hidden")(combined))
        return nn.Dense(1, dtype=jnp.float32, name="head_out")(h)[..., 0]  # (B, S)


class MultiHeadStepModel(nn.Module):
    """Shared encoder + 8 typed heads + autoregressive box decoder
    (training2.py:288-350)."""

    vocab_size: int = 64
    embed_dim: int = 128
    hidden_dim: int = 256
    image_feat_dim: int = 1024
    image_spatial: Tuple[int, int] = (14, 14)
    max_bbox_steps: int = 10
    teacher_forcing: float = 0.5
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.embedding = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")
        self.text_encoder = nn.OptimizedLSTMCell(self.hidden_dim, dtype=self.dtype)
        self.image_fc = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.fc_shared = nn.Dense(self.hidden_dim, dtype=self.dtype)
        # box decoder
        self.dec_cell = nn.OptimizedLSTMCell(self.hidden_dim, dtype=self.dtype)
        self.start_token = self.param(
            "start_token", nn.initializers.normal(1.0), (self.hidden_dim,)
        )
        self.box_out = nn.Dense(4, dtype=jnp.float32)
        self.stop_out = nn.Dense(2, dtype=jnp.float32)
        self.input_proj = nn.Dense(self.hidden_dim, dtype=self.dtype)
        # typed heads
        self.integer_head = nn.Dense(11, dtype=jnp.float32)
        self.boolean_head = nn.Dense(2, dtype=jnp.float32)
        self.size_head = nn.Dense(2, dtype=jnp.float32)
        self.color_head = nn.Dense(8, dtype=jnp.float32)
        self.shape_head = nn.Dense(3, dtype=jnp.float32)
        self.material_head = nn.Dense(2, dtype=jnp.float32)
        self.vocab_head = nn.Dense(self.vocab_size, dtype=jnp.float32)

    def __call__(
        self,
        function_tokens: jnp.ndarray,  # (B,)
        input_tokens: jnp.ndarray,  # (B, L)
        image_feats: jnp.ndarray,  # (B, C, H, W)
        teacher_boxes: Optional[jnp.ndarray] = None,  # (B, T, 4)
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        batch = function_tokens.shape[0]
        text = jnp.concatenate(
            [self.embedding(function_tokens)[:, None], self.embedding(input_tokens)], axis=1
        ).astype(self.dtype)
        carry = self.text_encoder.initialize_carry(jax.random.PRNGKey(0), (batch, 1))
        carry, _ = nn.scan(
            lambda mdl, c, x: mdl(c, x),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(self.text_encoder, carry, text)
        text_repr = carry[1]

        image_repr = nn.relu(self.image_fc(image_feats.reshape(batch, -1).astype(self.dtype)))
        shared = nn.relu(self.fc_shared(jnp.concatenate([text_repr, image_repr], axis=-1)))

        steps = self.max_bbox_steps
        if teacher_boxes is None:
            teacher_boxes = jnp.zeros((batch, steps, 4), jnp.float32)
            tf_ratio = 0.0
        else:
            tf_ratio = self.teacher_forcing if not deterministic else 0.0
        if tf_ratio > 0.0:
            coins = jax.random.bernoulli(self.make_rng("sample"), tf_ratio, (steps,))
        else:
            coins = jnp.zeros((steps,), bool)

        start = jnp.broadcast_to(self.start_token, (batch, self.hidden_dim)).astype(self.dtype)
        dec_carry = (jnp.zeros_like(shared), shared)  # (c, h) seeded from encoder

        def step(mdl, scan_carry, inputs):
            carry, inp = scan_carry
            teach_t, coin = inputs
            carry, h = mdl.dec_cell(carry, inp)
            box = mdl.box_out(h)
            stop = mdl.stop_out(h)
            src = jnp.where(coin, teach_t, box)
            nxt = mdl.input_proj(src.astype(mdl.dtype))
            return (carry, nxt), (box, stop)

        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False},
            in_axes=0, out_axes=0,
        )
        (_, _), (boxes, stops) = scan(
            self, (dec_carry, start), (jnp.swapaxes(teacher_boxes, 0, 1), coins)
        )
        return {
            "bbox": jnp.swapaxes(boxes, 0, 1),  # (B, T, 4)
            "bbox_stop_logits": jnp.swapaxes(stops, 0, 1),  # (B, T, 2)
            "integer": self.integer_head(shared),
            "boolean": self.boolean_head(shared),
            "size": self.size_head(shared),
            "color": self.color_head(shared),
            "shape": self.shape_head(shared),
            "material": self.material_head(shared),
            "vocab": self.vocab_head(shared),
        }


class HierarchicalGenerator(nn.Module):
    """Image-only encoder + typed decoder branch (training.py:105-224):
    a transformer encoder over projected image tokens, a start-query decoder
    whose output routes {spatial, nonspatial}; the spatial branch
    autoregressively emits boxes with a stop flag (teacher-forced here as one
    causal pass), the nonspatial branch emits one scalar value.
    """

    d_model: int = 256
    num_heads: int = 4
    num_layers: int = 2
    num_image_tokens: int = 196
    image_feature_dim: int = 1024
    max_inner_steps: int = 10
    dtype: Any = jnp.float32

    def setup(self) -> None:
        from explainable_spatial_vqa_tpu.models.layers import (
            TransformerDecoder,
            TransformerEncoder,
        )

        self.image_proj = nn.Dense(self.d_model, dtype=self.dtype)
        self.encoder = TransformerEncoder(
            self.num_layers, self.d_model, self.num_heads, self.d_model * 4,
            dropout=0.0, dtype=self.dtype,
        )
        self.decoder = TransformerDecoder(
            self.num_layers, self.d_model, self.num_heads, self.d_model * 4,
            dropout=0.0, dtype=self.dtype,
        )
        self.start_query = self.param(
            "start_query", nn.initializers.normal(1.0), (self.d_model,)
        )
        self.type_head = nn.Dense(2, dtype=jnp.float32)
        self.bbox_embedding = nn.Dense(self.d_model, dtype=self.dtype)
        self.bbox_out = nn.Dense(4, dtype=jnp.float32)
        self.stop_out = nn.Dense(1, dtype=jnp.float32)
        self.nonspatial_out = nn.Dense(1, dtype=jnp.float32)

    def __call__(
        self,
        image_tokens: jnp.ndarray,  # (B, P, C)
        gt_boxes: Optional[jnp.ndarray] = None,  # (B, T, 4) teacher boxes
    ) -> Dict[str, jnp.ndarray]:
        batch = image_tokens.shape[0]
        memory = self.encoder(self.image_proj(image_tokens.astype(self.dtype)))
        start = jnp.broadcast_to(
            self.start_query, (batch, 1, self.d_model)
        ).astype(self.dtype)

        global_rep = self.decoder(start, memory)[:, 0]
        out: Dict[str, jnp.ndarray] = {"type_logits": self.type_head(global_rep)}
        out["nonspatial_value"] = self.nonspatial_out(global_rep)[:, 0]

        if gt_boxes is None:
            gt_boxes = jnp.zeros((batch, self.max_inner_steps, 4), jnp.float32)
        emb = self.bbox_embedding(gt_boxes.astype(self.dtype))
        dec_in = jnp.concatenate([start, emb], axis=1)  # (B, T+1, d)
        dec_out = self.decoder(dec_in, memory)[:, :-1]  # predict box t from prefix <t
        out["pred_boxes"] = self.bbox_out(dec_out)  # (B, T, 4)
        out["stop_logits"] = self.stop_out(dec_out)[..., 0]  # (B, T)
        return out


class YoloDetector(nn.Module):
    """Tiny conv backbone from raw pixels -> (S, S, B*5) grid."""

    grid: int = 7
    boxes_per_cell: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (N, H, W, 3) float in [0, 1]; H=W=224."""
        x = images.astype(self.dtype)
        for features in (16, 32, 64, 128):
            x = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(256, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype)(x)  # 14 -> 7
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype)(x))
        x = nn.Dense(self.grid * self.grid * self.boxes_per_cell * 5,
                     dtype=jnp.float32)(x)
        return x.reshape(-1, self.grid, self.grid, self.boxes_per_cell * 5)


def yolo_grid_loss(
    pred: jnp.ndarray, target: jnp.ndarray,
    lambda_coord: float = 5.0, lambda_noobj: float = 0.5,
) -> jnp.ndarray:
    """Simplified YOLO loss: coord + obj-conf + noobj-conf MSE sums / batch
    (training_bb_onlyv3.py:187-208)."""
    obj = target[..., 4] > 0
    sq = (pred - target) ** 2
    loss_coord = jnp.sum(jnp.where(obj[..., None], sq[..., :4], 0.0))
    loss_obj = jnp.sum(jnp.where(obj, sq[..., 4], 0.0))
    loss_noobj = jnp.sum(jnp.where(~obj, sq[..., 4], 0.0))
    return (lambda_coord * loss_coord + loss_obj + lambda_noobj * loss_noobj) / pred.shape[0]


class CompositionalStepPredictor(nn.Module):
    """Mean-pooled multi-modal fusion prototype
    (train_transformer_full_annotation.py:143-231): average-pooled image
    features, mean question-token embeddings (hashed ids in the reference —
    any id space works), mean input-bbox embeddings, mean chain-of-thought
    token embeddings -> 4*d fusion -> (output bbox, next-function logits over
    a 14-entry function vocab).  Batched here (the reference ran batch=1)."""

    d_model: int = 256
    question_vocab_size: int = 10000
    prog_vocab_size: int = 1000
    num_functions: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_feat: jnp.ndarray,  # (B, C, H, W)
        question_tokens: jnp.ndarray,  # (B, Lq) int, 0 = pad
        input_boxes: jnp.ndarray,  # (B, N, 4)
        input_box_mask: jnp.ndarray,  # (B, N) bool
        prog_tokens: jnp.ndarray,  # (B, Lp) int, 0 = pad
    ) -> Dict[str, jnp.ndarray]:
        def masked_mean(x, mask):
            total = jnp.sum(jnp.where(mask[..., None], x, 0.0), axis=1)
            count = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
            return total / count

        f_img = nn.Dense(self.d_model, dtype=self.dtype, name="image_fc")(
            jnp.mean(image_feat, axis=(2, 3)).astype(self.dtype)
        )
        q_emb = nn.Embed(self.question_vocab_size, self.d_model, name="question_emb")(
            question_tokens
        ).astype(self.dtype)
        f_question = masked_mean(q_emb, question_tokens != 0)
        f_input = masked_mean(
            nn.Dense(self.d_model, dtype=self.dtype, name="input_encoder")(
                input_boxes.astype(self.dtype)
            ),
            input_box_mask,
        )
        p_emb = nn.Embed(self.prog_vocab_size, self.d_model, name="prog_emb")(
            prog_tokens
        ).astype(self.dtype)
        f_prog = masked_mean(p_emb, prog_tokens != 0)

        fused = nn.Dense(self.d_model, dtype=self.dtype, name="fusion_fc")(
            jnp.concatenate([f_img, f_question, f_input, f_prog], axis=-1)
        )
        return {
            "pred_box": nn.Dense(4, dtype=jnp.float32, name="output_head")(fused),
            "next_function_logits": nn.Dense(
                self.num_functions, dtype=jnp.float32, name="function_head"
            )(fused),
        }
