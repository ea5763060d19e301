"""Transformer IQAP baseline family: (image features, question) -> answer (+
program, + optional bbox set).

Reimplements the reference family as one configurable model
(/root/reference/code/train_transformer_iqap.py:121-268 — 2-layer encoder over
[CLS | 196 image tokens | question], answer MLP on CLS, 2-layer transformer
decoder; train_transformer_iqap_bb.py:219-356 adds a bbox head off mean-pooled
memory).

The reference generates the program autoregressively *during training* with
no teacher forcing, re-running the whole decoder per token
(autoregressive_program_generation, train_transformer_iqap.py:213-268).  The
TPU path keeps those exact semantics — argmax feedback, gradients through each
step's logits only — but runs as a single ``lax.scan`` with KV caches
(:func:`explainable_spatial_vqa_tpu.ops.decoding.greedy_decode_logits`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from explainable_spatial_vqa_tpu.core.config import IQAPConfig
from explainable_spatial_vqa_tpu.models.layers import (
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
)
from explainable_spatial_vqa_tpu.ops.decoding import greedy_decode_logits

__all__ = ["TransformerIQAP"]


class TransformerIQAP(nn.Module):
    config: IQAPConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.image_proj = nn.Dense(cfg.embed_dim, dtype=self.dtype, name="image_proj")
        self.embed = nn.Embed(cfg.vocab_size, cfg.embed_dim, name="embed")
        self.cls_token = self.param("cls", nn.initializers.normal(1.0), (1, 1, cfg.embed_dim))
        self.pos_encoder = PositionalEncoding(
            cfg.embed_dim,
            max_len=cfg.num_image_tokens + cfg.max_question_len + 1,
            dropout=cfg.dropout,
        )
        self.encoder = TransformerEncoder(
            cfg.encoder_layers, cfg.embed_dim, cfg.num_heads, cfg.embed_dim * 4,
            cfg.dropout, dtype=self.dtype, name="encoder",
        )
        self.answer_hidden = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name="answer_hidden")
        self.answer_out = nn.Dense(cfg.num_answer_classes, dtype=jnp.float32, name="answer_out")
        self.answer_dropout = nn.Dropout(0.1)

        self.prog_embed = nn.Embed(cfg.program_vocab_size, cfg.embed_dim, name="prog_embed")
        self.pos_decoder = PositionalEncoding(
            cfg.embed_dim, max_len=cfg.program_len + 1, dropout=cfg.dropout
        )
        self.prog_decoder = TransformerDecoder(
            cfg.decoder_layers, cfg.embed_dim, cfg.num_heads, cfg.embed_dim * 4,
            cfg.dropout, dtype=self.dtype, name="prog_decoder",
        )
        self.prog_out = nn.Dense(cfg.program_vocab_size, dtype=jnp.float32, name="prog_out")

        if cfg.with_bbox_head:
            self.bbox_hidden = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name="bbox_hidden")
            self.bbox_out = nn.Dense(cfg.num_bbox_slots * 4, dtype=jnp.float32, name="bbox_out")

    def encode(
        self,
        image_tokens: jnp.ndarray,
        questions: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """[CLS | image | question] -> encoder memory (B, 1+P+L, d)."""
        batch = image_tokens.shape[0]
        img = self.image_proj(image_tokens.astype(self.dtype))
        q = self.embed(questions).astype(self.dtype)
        cls = jnp.broadcast_to(self.cls_token, (batch, 1, img.shape[-1])).astype(self.dtype)
        x = jnp.concatenate([cls, img, q], axis=1)
        x = self.pos_encoder(x, deterministic=deterministic)
        # reference applies no key-padding mask (train_transformer_iqap.py:199)
        return self.encoder(x, None, deterministic)

    def answer_logits(self, memory: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cls = memory[:, 0]
        h = nn.relu(self.answer_hidden(cls))
        h = self.answer_dropout(h, deterministic=deterministic)
        return self.answer_out(h)

    def bbox_predictions(self, memory: jnp.ndarray) -> jnp.ndarray:
        """Mean-pooled image-token memory -> (B, num_bbox_slots, 4) in [0,1]
        (train_transformer_iqap_bb.py:318-333)."""
        cfg = self.config
        pooled = jnp.mean(memory[:, 1 : 1 + cfg.num_image_tokens], axis=1)
        h = nn.relu(self.bbox_hidden(pooled))
        out = nn.sigmoid(self.bbox_out(h))
        return out.reshape(out.shape[0], cfg.num_bbox_slots, 4)

    # -- program decoding ---------------------------------------------------

    def decode_programs_tf(
        self, program_inputs: jnp.ndarray, memory: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """Teacher-forced decode (used by eval and the TF config variants)."""
        x = self.prog_embed(program_inputs).astype(self.dtype)
        x = self.pos_decoder(x, deterministic=deterministic)
        x = self.prog_decoder(x, memory, None, deterministic)
        return self.prog_out(x)

    def init_cache(self, memory: jnp.ndarray, max_len: int):
        return self.prog_decoder.init_cache(memory.shape[0], max_len, memory)

    def decode_step(self, token, cache, index, memory_mask=None):
        x = self.prog_embed(token[:, None]).astype(self.dtype)
        x = self.pos_decoder(x, deterministic=True, offset=index)
        x, cache = self.prog_decoder.decode_step(x, cache, index, memory_mask)
        return self.prog_out(x)[:, 0], cache

    def __call__(
        self,
        image_tokens: jnp.ndarray,
        questions: jnp.ndarray,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Training/eval forward matching the reference semantics: answer from
        CLS + programs generated autoregressively without teacher forcing."""
        memory = self.encode(image_tokens, questions, deterministic)
        out: Dict[str, jnp.ndarray] = {"memory": memory}
        out["answer_logits"] = self.answer_logits(memory, deterministic)
        if self.config.with_bbox_head:
            out["pred_boxes"] = self.bbox_predictions(memory)
        return out

    def init_all(self, image_tokens: jnp.ndarray, questions: jnp.ndarray):
        """Initialization path touching every parameter (the program decoder
        is not reached by ``__call__``)."""
        out = self.__call__(image_tokens, questions)
        dummy = jnp.zeros((image_tokens.shape[0], 1), jnp.int32)
        out["program_logits"] = self.decode_programs_tf(dummy, out["memory"])
        return out


def generate_programs(
    model: TransformerIQAP,
    variables,
    memory: jnp.ndarray,
    start_token: Optional[int] = None,
    max_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autoregressive greedy program generation with per-step logits.

    Gradient semantics match the reference: argmax feedback is non-
    differentiable; losses flow through the returned logits.
    """
    cfg = model.config
    return greedy_decode_logits(
        model,
        variables,
        memory,
        None,
        cfg.sos_token if start_token is None else start_token,
        cfg.program_len if max_len is None else max_len,
    )
