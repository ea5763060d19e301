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

__all__ = ["greedy_decode", "greedy_decode_logits", "beam_search_decode"]


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


def beam_search_decode(
    model: Any,
    variables: Any,
    memory: jnp.ndarray,
    memory_mask: Optional[jnp.ndarray],
    start_token: int,
    max_len: int,
    beam_size: int = 4,
    end_token: Optional[int] = None,
    pad_token: int = 0,
    length_penalty: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam search over the cached decoder (thesis §3.4.1 'beam optional').

    Returns (tokens (B, K, max_len), scores (B, K)) sorted best-first.
    The whole search is one lax.scan: caches live flattened at (B*K, ...)
    and are re-gathered along the beam axis each step.
    """
    batch = memory.shape[0]
    k = beam_size

    def tile(x: jnp.ndarray) -> jnp.ndarray:
        return jnp.repeat(x, k, axis=0)  # (B*K, ...)

    memory_k = tile(memory)
    mask_k = tile(memory_mask) if memory_mask is not None else None
    cache = model.apply(variables, memory_k, max_len, method=model.init_cache)

    neg_inf = -1e30
    # beam 0 starts live; others start dead so the first step seeds diversity
    scores = jnp.tile(
        jnp.asarray([0.0] + [neg_inf] * (k - 1), jnp.float32), (batch, 1)
    )  # (B, K)
    tokens = jnp.full((batch, k), start_token, jnp.int32)
    finished = jnp.zeros((batch, k), bool)

    def gather_beams(tree, beam_index):
        """Reindex (B*K, ...) leaves by per-batch beam choices (B, K)."""
        flat_index = (
            beam_index + jnp.arange(batch)[:, None] * k
        ).reshape(-1)  # (B*K,)

        return jax.tree_util.tree_map(lambda leaf: leaf[flat_index], tree)

    def body(carry, index):
        scores, tokens, finished, cache = carry
        logits, cache = model.apply(
            variables, tokens.reshape(-1), cache, index, mask_k,
            method=model.decode_step,
        )  # (B*K, V)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        vocab = logp.shape[-1]
        logp = logp.reshape(batch, k, vocab)

        # finished beams only extend with pad at unchanged score
        pad_only = jnp.full((vocab,), neg_inf).at[pad_token].set(0.0)
        logp = jnp.where(finished[..., None], pad_only[None, None, :], logp)

        total = scores[..., None] + logp  # (B, K, V)
        flat = total.reshape(batch, k * vocab)
        top_scores, top_index = jax.lax.top_k(flat, k)  # (B, K)
        beam_index = top_index // vocab
        token_index = (top_index % vocab).astype(jnp.int32)

        cache = gather_beams(cache, beam_index)
        finished = jnp.take_along_axis(finished, beam_index, axis=1)
        if end_token is not None:
            finished = finished | (token_index == end_token)
        return (top_scores, token_index, finished, cache), (token_index, beam_index)

    (scores, _, _, _), (step_tokens, step_beams) = jax.lax.scan(
        body, (scores, tokens, finished, cache), jnp.arange(max_len)
    )

    # backtrack beam paths: walk parents from the last step
    def backtrack(carry, step):
        beam_index = carry  # (B, K) current beam choice at step+1
        toks = jnp.take_along_axis(step_tokens[step], beam_index, axis=1)
        parents = jnp.take_along_axis(step_beams[step], beam_index, axis=1)
        return parents, toks

    last = jnp.tile(jnp.arange(k)[None, :], (batch, 1))
    _, rev_tokens = jax.lax.scan(backtrack, last, jnp.arange(max_len - 1, -1, -1))
    out_tokens = jnp.flip(jnp.transpose(rev_tokens, (1, 2, 0)), axis=-1)  # (B, K, T)

    if length_penalty:
        lengths = jnp.sum(out_tokens != pad_token, axis=-1).astype(jnp.float32)
        scores = scores / jnp.power(jnp.maximum(lengths, 1.0), length_penalty)
    order = jnp.argsort(-scores, axis=-1)
    scores = jnp.take_along_axis(scores, order, axis=-1)
    out_tokens = jnp.take_along_axis(out_tokens, order[..., None], axis=1)
    return out_tokens, scores
