"""Autoregressive decoding as compiled scans over KV caches.

The reference decodes greedily by re-embedding the whole prefix and re-running
the full decoder stack once per emitted token with no cache
(inference_transformer_full_annotation_new.py:126-146;
train_transformer_iqap.py:213-268 does the same *inside the training step*).
Here decoding is a single ``lax.scan`` of O(1)-per-token cached steps — the
whole loop lives on device, shapes are static, and one compilation serves all
batches.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["greedy_decode", "greedy_decode_logits"]


def greedy_decode(
    model: Any,
    variables: Any,
    memory: jnp.ndarray,
    memory_mask: Optional[jnp.ndarray],
    start_token: int,
    max_len: int,
    end_token: Optional[int] = None,
    pad_token: int = 0,
) -> jnp.ndarray:
    """Greedy decode ``max_len`` tokens given encoder ``memory``.

    ``model`` must expose ``init_cache(memory, max_len)`` and
    ``decode_step(token, cache, index, memory_mask)`` methods (see
    StepExecutorSeq2Seq).  Returns (B, max_len) int32 tokens; once
    ``end_token`` is emitted, the remainder is ``pad_token``.
    """
    batch = memory.shape[0]
    cache = model.apply(variables, memory, max_len, method=model.init_cache)
    start = jnp.full((batch,), start_token, dtype=jnp.int32)
    finished = jnp.zeros((batch,), dtype=bool)

    def body(carry, index):
        token, cache, finished = carry
        logits, cache = model.apply(
            variables, token, cache, index, memory_mask, method=model.decode_step
        )
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emitted = jnp.where(finished, pad_token, next_token)
        if end_token is not None:
            finished = jnp.logical_or(finished, next_token == end_token)
        return (emitted, cache, finished), emitted

    (_, _, _), tokens = jax.lax.scan(body, (start, cache, finished), jnp.arange(max_len))
    return tokens.T  # (B, max_len)


def greedy_decode_logits(
    model: Any,
    variables: Any,
    memory: jnp.ndarray,
    memory_mask: Optional[jnp.ndarray],
    start_token: int,
    max_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """As :func:`greedy_decode` but also returns per-step logits
    (B, max_len, V) — used by the no-teacher-forcing IQAP training path where
    gradients flow through the logits of self-generated prefixes."""
    batch = memory.shape[0]
    cache = model.apply(variables, memory, max_len, method=model.init_cache)
    start = jnp.full((batch,), start_token, dtype=jnp.int32)

    def body(carry, index):
        token, cache = carry
        logits, cache = model.apply(
            variables, token, cache, index, memory_mask, method=model.decode_step
        )
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (next_token, cache), (next_token, logits)

    (_, _), (tokens, logits) = jax.lax.scan(body, (start, cache), jnp.arange(max_len))
    return tokens.T, jnp.swapaxes(logits, 0, 1)
