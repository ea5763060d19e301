"""LSTM IQAP/IQA baseline family.

Reimplements the reference's ``VQAModel``
(/root/reference/code/train_lstm_iqap.py:82-150): question LSTM encoder
(hidden 512, final state), image pathway = flattened (1024*14*14) features
through a Dense to hidden, concat -> answer classifier; optionally an LSTM
program decoder with scheduled teacher forcing.  ``train_lstm_iqa.py`` is the
same model without the program decoder (config flag).

The image flatten-to-Dense is a 200k x 512 matmul — ideal MXU work; the
program decode loop is an ``nn.scan``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from explainable_spatial_vqa_tpu.core.config import LstmIQAPConfig

__all__ = ["LstmIQAP"]


class LstmIQAP(nn.Module):
    config: LstmIQAPConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.embed = nn.Embed(cfg.vocab_size, cfg.embed_dim, name="embed")
        self.q_lstm = nn.OptimizedLSTMCell(cfg.hidden_dim, dtype=self.dtype, name="q_lstm")
        self.image_fc = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name="image_fc")
        self.answer_fc = nn.Dense(cfg.num_answer_classes, dtype=jnp.float32, name="answer_fc")
        self.dropout_layer = nn.Dropout(cfg.dropout)
        if cfg.with_program_decoder:
            self.prog_embed = nn.Embed(
                cfg.program_vocab_size, cfg.embed_dim, name="prog_embed"
            )
            self.dec_init_fc = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name="dec_init_fc")
            self.dec_lstm = nn.OptimizedLSTMCell(
                cfg.hidden_dim, dtype=self.dtype, name="dec_lstm"
            )
            self.prog_fc = nn.Dense(cfg.program_vocab_size, dtype=jnp.float32, name="prog_fc")

    def _encode(self, image_features, questions, deterministic):
        cfg = self.config
        emb = self.embed(questions).astype(self.dtype)
        carry = self.q_lstm.initialize_carry(
            jax.random.PRNGKey(0), (questions.shape[0], 1)
        )
        carry, _ = nn.scan(
            lambda mdl, c, x: mdl(c, x),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self.q_lstm, carry, emb)
        q_repr = carry[1]  # final hidden state (B, H)

        img_flat = image_features.reshape(image_features.shape[0], -1).astype(self.dtype)
        img_repr = nn.relu(self.image_fc(img_flat))
        fused = jnp.concatenate([q_repr, img_repr], axis=-1)
        fused = self.dropout_layer(fused, deterministic=deterministic)
        return fused

    def __call__(
        self,
        image_features: jnp.ndarray,
        questions: jnp.ndarray,
        program_targets: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        teacher_forcing: Optional[float] = None,
        start_token: int = 1,
    ) -> Dict[str, jnp.ndarray]:
        """image_features: (B, C, H, W) or (B, F); questions: (B, L).

        Returns answer logits and, when configured, program logits/tokens.
        """
        cfg = self.config
        fused = self._encode(image_features, questions, deterministic)
        out: Dict[str, jnp.ndarray] = {"answer_logits": self.answer_fc(fused)}
        if not cfg.with_program_decoder:
            return out

        batch = questions.shape[0]
        length = cfg.program_len if program_targets is None else program_targets.shape[1]
        tf_ratio = cfg.teacher_forcing if teacher_forcing is None else teacher_forcing
        if program_targets is None:
            tf_ratio = 0.0
            program_targets = jnp.zeros((batch, length), jnp.int32)
        use_tf = not deterministic and tf_ratio > 0.0
        if use_tf:
            coins = jax.random.bernoulli(self.make_rng("sample"), tf_ratio, (length,))
        else:
            coins = (
                jnp.ones((length,), bool) if tf_ratio >= 1.0 else jnp.zeros((length,), bool)
            )

        h0 = jnp.tanh(self.dec_init_fc(fused))
        carry = (jnp.zeros_like(h0), h0)
        start = jnp.full((batch,), start_token, jnp.int32)

        def step(mdl, scan_carry, inputs):
            carry, prev = scan_carry
            target_t, coin = inputs
            x = mdl.prog_embed(prev).astype(mdl.dtype)
            carry, h = mdl.dec_lstm(carry, x)
            logits = mdl.prog_fc(h)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(coin, target_t, pred)
            return (carry, nxt), (logits, pred)

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        (_, _), (logits, tokens) = scan(self, (carry, start), (program_targets.T, coins))
        out["program_logits"] = jnp.swapaxes(logits, 0, 1)
        out["program_tokens"] = jnp.swapaxes(tokens, 0, 1)
        return out
