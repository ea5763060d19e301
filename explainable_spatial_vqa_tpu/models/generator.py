"""Program Generator: question tokens -> program tokens.

Two variants behind one config (GeneratorConfig):

- ``simple=True``: the checked-in prototype — embedding, 1-layer LSTM encoder,
  1-layer LSTM decoder fed its own argmax, no attention
  (/root/reference/code/train_lstm_qp.py:62-107).
- ``simple=False`` (default): the thesis-final generator (§3.4.1 p.16) —
  3-layer bidirectional LSTM encoder, 3-layer LSTM decoder with Luong
  dot-product attention over encoder states, embedding 300 / hidden 512,
  scheduled teacher forcing (ratio 0.5).

All recurrence is ``nn.scan`` / ``lax.scan`` — the whole decode loop compiles
to one XLA while-loop; greedy decoding runs fully on device (the reference
decodes step-by-step in Python).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from explainable_spatial_vqa_tpu.core.config import GeneratorConfig

__all__ = ["ProgramGenerator"]


class _LSTMStack(nn.Module):
    """Multi-layer LSTM cell stack operating on one timestep."""

    hidden_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.cells = [
            nn.OptimizedLSTMCell(self.hidden_dim, dtype=self.dtype, name=f"cell_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, carry, x):
        new_carry = []
        for cell, c in zip(self.cells, carry):
            c, x = cell(c, x)
            new_carry.append(c)
        return tuple(new_carry), x

    def initialize_carry(self, rng, batch_shape):
        # linen cells derive the carry shape as input_shape[:-1] + (hidden,)
        return tuple(
            cell.initialize_carry(rng, tuple(batch_shape) + (1,)) for cell in self.cells
        )


class ProgramGenerator(nn.Module):
    config: GeneratorConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.embed = nn.Embed(cfg.vocab_size, cfg.embed_dim, name="embed")
        self.prog_embed = nn.Embed(cfg.program_vocab_size, cfg.embed_dim, name="prog_embed")
        enc_layers = 1 if cfg.simple else cfg.encoder_layers
        dec_layers = 1 if cfg.simple else cfg.decoder_layers
        self.enc_fwd = _LSTMStack(cfg.hidden_dim, enc_layers, self.dtype, name="enc_fwd")
        if cfg.bidirectional and not cfg.simple:
            self.enc_bwd = _LSTMStack(cfg.hidden_dim, enc_layers, self.dtype, name="enc_bwd")
            self.enc_proj = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name="enc_proj")
        self.decoder = _LSTMStack(cfg.hidden_dim, dec_layers, self.dtype, name="decoder")
        if cfg.attention and not cfg.simple:
            self.attn_combine = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name="attn_combine")
        self.out_proj = nn.Dense(cfg.program_vocab_size, dtype=jnp.float32, name="out_proj")
        self.dropout_layer = nn.Dropout(cfg.dropout)

    # -- encoder ------------------------------------------------------------

    def encode(
        self, questions: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, Tuple]:
        """questions: (B, L) int (0 = <NULL> pad).

        Returns (enc_outputs (B, L, H), final decoder-init carry)."""
        cfg = self.config
        emb = self.embed(questions).astype(self.dtype)  # (B, L, E)
        emb = self.dropout_layer(emb, deterministic=deterministic)
        batch = questions.shape[0]
        init = self.enc_fwd.initialize_carry(jax.random.PRNGKey(0), (batch,))

        # NOTE: the two directions must stay SEPARATE nn.scan calls.  A
        # merged single-scan form (both stacks stepped in one body, scanning
        # over `self`) is numerically identical and was latency-neutral on
        # TPU, but reproducibly SIGABRTs XLA:CPU when differentiated under
        # the 8-device test mesh (fatal abort inside the compiled train
        # step; tests/test_e2e.py::test_real_fixture_full_chain_trainability
        # caught it).  Do not re-merge without re-running that test.
        carry_f, outs_f = nn.scan(
            lambda mdl, c, x: mdl(c, x),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self.enc_fwd, init, emb)

        if cfg.bidirectional and not cfg.simple:
            init_b = self.enc_bwd.initialize_carry(jax.random.PRNGKey(0), (batch,))
            emb_rev = jnp.flip(emb, axis=1)
            carry_b, outs_b = nn.scan(
                lambda mdl, c, x: mdl(c, x),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )(self.enc_bwd, init_b, emb_rev)
            outs_b = jnp.flip(outs_b, axis=1)
            enc_outputs = self.enc_proj(jnp.concatenate([outs_f, outs_b], axis=-1))
            # decoder init: combine directions per layer (sum of c and h)
            dec_init = tuple(
                (cf[0] + cb[0], cf[1] + cb[1]) for cf, cb in zip(carry_f, carry_b)
            )
        else:
            enc_outputs = outs_f
            dec_init = carry_f

        # pad decoder carry if decoder is deeper than encoder
        dec_layers = len(self.decoder.cells)
        if len(dec_init) < dec_layers:
            extra = self.decoder.initialize_carry(jax.random.PRNGKey(0), (batch,))
            dec_init = tuple(dec_init) + tuple(extra[len(dec_init):])
        return enc_outputs, dec_init[:dec_layers]

    # -- single decode step -------------------------------------------------

    def _decode_step(
        self,
        carry: Tuple,
        token: jnp.ndarray,
        enc_outputs: jnp.ndarray,
        enc_mask: Optional[jnp.ndarray],
        deterministic: bool,
    ) -> Tuple[Tuple, jnp.ndarray]:
        cfg = self.config
        x = self.prog_embed(token).astype(self.dtype)  # (B, E)
        x = self.dropout_layer(x, deterministic=deterministic)
        carry, h = self.decoder(carry, x)  # h: (B, H)
        if cfg.attention and not cfg.simple:
            # Luong dot attention: scores over encoder outputs
            scores = jnp.einsum("bh,blh->bl", h, enc_outputs).astype(jnp.float32)
            if enc_mask is not None:
                scores = jnp.where(enc_mask, scores, -1e30)
            weights = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            context = jnp.einsum("bl,blh->bh", weights, enc_outputs)
            h = jnp.tanh(self.attn_combine(jnp.concatenate([h, context], axis=-1)))
        logits = self.out_proj(h)  # (B, V)
        return carry, logits

    # -- training forward ---------------------------------------------------

    def __call__(
        self,
        questions: jnp.ndarray,
        program_targets: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        start_token: int = 1,
        teacher_forcing: Optional[float] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced/scheduled-sampling training forward.

        questions (B, L); program_targets (B, T) — if None, pure greedy
        self-feeding (the simple variant's no-TF training,
        train_lstm_qp.py:76-108).  Returns {"logits": (B, T, V),
        "tokens": (B, T)}.
        """
        cfg = self.config
        enc_outputs, carry = self.encode(questions, deterministic)
        enc_mask = questions != 0
        batch = questions.shape[0]
        length = cfg.program_len if program_targets is None else program_targets.shape[1]

        tf_ratio = cfg.teacher_forcing if teacher_forcing is None else teacher_forcing
        if program_targets is None:
            tf_ratio = 0.0
            program_targets = jnp.zeros((batch, length), jnp.int32)

        use_tf = not deterministic and tf_ratio > 0.0
        if use_tf:
            tf_rng = self.make_rng("sample")
            coins = jax.random.bernoulli(tf_rng, tf_ratio, (length,))
        else:
            coins = jnp.ones((length,), bool) if tf_ratio >= 1.0 else jnp.zeros((length,), bool)

        start = jnp.full((batch,), start_token, jnp.int32)

        def step(mdl, scan_carry, inputs):
            carry, prev_token = scan_carry
            target_t, coin = inputs
            carry, logits = mdl._decode_step(
                carry, prev_token, enc_outputs, enc_mask, deterministic
            )
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            next_token = jnp.where(coin, target_t, pred)
            return (carry, next_token), (logits, pred)

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
        )
        # teacher input at step t+1 is gold token t (classic shifted seq2seq)
        (_, _), (logits, tokens) = scan(self, (carry, start), (program_targets.T, coins))
        return {
            "logits": jnp.swapaxes(logits, 0, 1),
            "tokens": jnp.swapaxes(tokens, 0, 1),
        }

    def generate(
        self,
        questions: jnp.ndarray,
        max_len: Optional[int] = None,
        start_token: int = 1,
    ) -> jnp.ndarray:
        """Greedy decode (B, T) fully on device."""
        length = max_len or self.config.program_len
        out = self.__call__(
            questions,
            jnp.zeros((questions.shape[0], length), jnp.int32),
            deterministic=True,
            start_token=start_token,
            teacher_forcing=0.0,
        )
        return out["tokens"]

    def beam_generate(
        self,
        questions: jnp.ndarray,
        beam_size: int = 4,
        max_len: Optional[int] = None,
        start_token: int = 1,
        end_token: int = 2,
        pad_token: int = 0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Beam-search decode fully on device ('beam optional', thesis §3.4.1).

        Returns (tokens (B, K, T), scores (B, K)) sorted best-first.  Same
        search structure as ops.decoding.beam_search_decode but over LSTM
        carries instead of transformer KV caches: the decoder carry pytree is
        tiled to (B*K, ...) and re-gathered along the beam axis each step.
        """
        cfg = self.config
        length = max_len or cfg.program_len
        k = beam_size
        enc_outputs, carry = self.encode(questions, True)
        enc_mask = questions != 0
        batch = questions.shape[0]

        tile = lambda x: jnp.repeat(x, k, axis=0)  # noqa: E731
        enc_k = tile(enc_outputs)
        mask_k = tile(enc_mask)
        carry = jax.tree_util.tree_map(tile, tuple(carry))

        neg_inf = -1e30
        scores = jnp.tile(
            jnp.asarray([0.0] + [neg_inf] * (k - 1), jnp.float32), (batch, 1)
        )
        tokens = jnp.full((batch, k), start_token, jnp.int32)
        finished = jnp.zeros((batch, k), bool)

        def gather_beams(tree, beam_index):
            flat = (beam_index + jnp.arange(batch)[:, None] * k).reshape(-1)
            return jax.tree_util.tree_map(lambda leaf: leaf[flat], tree)

        def body(mdl, state, _):
            carry, scores, tokens, finished = state
            carry2, logits = mdl._decode_step(
                carry, tokens.reshape(-1), enc_k, mask_k, True
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            vocab = logp.shape[-1]
            logp = logp.reshape(batch, k, vocab)
            pad_only = jnp.full((vocab,), neg_inf).at[pad_token].set(0.0)
            logp = jnp.where(finished[..., None], pad_only[None, None, :], logp)
            total = scores[..., None] + logp
            top_scores, top_index = jax.lax.top_k(total.reshape(batch, k * vocab), k)
            beam_index = top_index // vocab
            token_index = (top_index % vocab).astype(jnp.int32)
            carry2 = gather_beams(carry2, beam_index)
            finished = jnp.take_along_axis(finished, beam_index, axis=1)
            finished = finished | (token_index == end_token)
            return (carry2, top_scores, token_index, finished), (token_index, beam_index)

        scan = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            length=length, out_axes=0,
        )
        (carry, scores, _, _), (step_tokens, step_beams) = scan(
            self, (carry, scores, tokens, finished), None
        )

        def backtrack(beam_index, step):
            toks = jnp.take_along_axis(step_tokens[step], beam_index, axis=1)
            parents = jnp.take_along_axis(step_beams[step], beam_index, axis=1)
            return parents, toks

        last = jnp.tile(jnp.arange(k)[None, :], (batch, 1))
        _, rev_tokens = jax.lax.scan(backtrack, last, jnp.arange(length - 1, -1, -1))
        out_tokens = jnp.flip(jnp.transpose(rev_tokens, (1, 2, 0)), axis=-1)

        order = jnp.argsort(-scores, axis=-1)
        scores = jnp.take_along_axis(scores, order, axis=-1)
        out_tokens = jnp.take_along_axis(out_tokens, order[..., None], axis=1)
        return out_tokens, scores
