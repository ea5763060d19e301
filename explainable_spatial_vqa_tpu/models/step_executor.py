"""Step-executor seq2seq: per-program-step (image, src tokens) -> output tokens.

TPU-native equivalent of the reference ``MultiModalTransformer``
(/root/reference/code/train_transformer_full_annotation_new.py:35-76): image
features (B, 196, 1024) are projected to d_model and concatenated with the
embedded src text (function token + input-value tokens); a transformer
encoder produces memory; a transformer decoder emits the output-value token
sequence (teacher-forced in training).

Inference redesign: instead of re-running encoder+decoder per generated token
(reference greedy_decode, inference_transformer_full_annotation_new.py:126-146),
``encode`` runs once and greedy decoding is a ``lax.scan`` over a KV cache —
see :func:`explainable_spatial_vqa_tpu.ops.decoding.greedy_decode`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from explainable_spatial_vqa_tpu.core.config import StepSeq2SeqConfig
from explainable_spatial_vqa_tpu.models.layers import (
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
)

__all__ = ["StepExecutorSeq2Seq", "image_grid_to_tokens"]


def image_grid_to_tokens(features: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) feature grid -> (B, H*W, C) token sequence (channel-last),
    matching the reference's view+permute (train_..._new.py:62)."""
    b, c, h, w = features.shape
    return features.reshape(b, c, h * w).transpose(0, 2, 1)


class StepExecutorSeq2Seq(nn.Module):
    config: StepSeq2SeqConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.image_proj = nn.Dense(cfg.d_model, dtype=self.dtype, name="image_proj")
        self.embed = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed")
        self.pos_encoder = PositionalEncoding(
            cfg.d_model, max_len=cfg.max_src_len + cfg.num_image_tokens, dropout=cfg.dropout
        )
        self.pos_decoder = PositionalEncoding(cfg.d_model, max_len=cfg.max_tgt_len, dropout=cfg.dropout)
        self.encoder = TransformerEncoder(
            cfg.encoder_layers, cfg.d_model, cfg.num_heads, cfg.ffn_dim, cfg.dropout,
            dtype=self.dtype, name="encoder",
        )
        self.decoder = TransformerDecoder(
            cfg.decoder_layers, cfg.d_model, cfg.num_heads, cfg.ffn_dim, cfg.dropout,
            dtype=self.dtype, name="decoder",
        )
        self.output_proj = nn.Dense(cfg.vocab_size, dtype=jnp.float32, name="output")

    def encode(
        self,
        image_tokens: jnp.ndarray,
        src_tokens: jnp.ndarray,
        src_pad_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """image_tokens: (B, P, 1024); src_tokens: (B, S) int.

        Returns (memory (B, P+S, d), memory key mask (B, 1, 1, P+S) or None).
        """
        img = self.image_proj(image_tokens.astype(self.dtype))
        src = self.embed(src_tokens).astype(self.dtype)
        x = jnp.concatenate([img, src], axis=1)
        x = self.pos_encoder(x, deterministic=deterministic)
        key_mask = None
        if src_pad_mask is not None:
            img_valid = jnp.ones(img.shape[:2], dtype=bool)
            valid = jnp.concatenate([img_valid, src_pad_mask], axis=1)  # (B, P+S)
            key_mask = valid[:, None, None, :]
        memory = self.encoder(x, key_mask, deterministic)
        return memory, key_mask

    def decode(
        self,
        tgt_tokens: jnp.ndarray,
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced decode: tgt_tokens (B, T) -> logits (B, T, V)."""
        x = self.embed(tgt_tokens).astype(self.dtype)
        x = self.pos_decoder(x, deterministic=deterministic)
        x = self.decoder(x, memory, memory_mask, deterministic)
        return self.output_proj(x)

    def __call__(
        self,
        image_tokens: jnp.ndarray,
        src_tokens: jnp.ndarray,
        tgt_tokens: jnp.ndarray,
        src_pad_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        memory, key_mask = self.encode(image_tokens, src_tokens, src_pad_mask, deterministic)
        return self.decode(tgt_tokens, memory, key_mask, deterministic)

    # -- cached decode path -------------------------------------------------

    def init_cache(self, memory: jnp.ndarray, max_len: int) -> Tuple[Dict[str, Any], ...]:
        return self.decoder.init_cache(memory.shape[0], max_len, memory)

    def decode_step(
        self,
        token: jnp.ndarray,
        cache: Tuple[Dict[str, Any], ...],
        index: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Tuple[Dict[str, Any], ...]]:
        """token: (B,) int -> (logits (B, V), new cache)."""
        x = self.embed(token[:, None]).astype(self.dtype)
        x = self.pos_decoder(x, deterministic=True, offset=index)
        x, cache = self.decoder.decode_step(x, cache, index, memory_mask)
        return self.output_proj(x)[:, 0], cache
