#!/usr/bin/env python
"""Data-efficiency sweep demo (thesis §4.2.3 / Fig 4.4a protocol): train the
program generator on increasing question counts, report held-out program
exact-match per size.  Synthetic templated corpus; CPU-friendly."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from explainable_spatial_vqa_tpu.clevr import synthetic as syn
from explainable_spatial_vqa_tpu.core import vocab as voc
from explainable_spatial_vqa_tpu.core.artifacts import encode_questions
from explainable_spatial_vqa_tpu.core.config import GeneratorConfig
from explainable_spatial_vqa_tpu.evalsuite import data_efficiency_sweep
from explainable_spatial_vqa_tpu.models.generator import ProgramGenerator
from explainable_spatial_vqa_tpu.train.losses import cross_entropy


def main():
    _, questions = syn.synthesize_dataset(150, 5, seed=9)
    vocab = voc.build_clevr_vocab([questions])
    enc = encode_questions(questions, vocab)
    q_all, p_all = enc.questions, enc.programs
    n_eval = 150
    q_eval, p_eval = q_all[-n_eval:], p_all[-n_eval:]
    q_pool, p_pool = q_all[:-n_eval], p_all[:-n_eval]

    def train_at(fraction: float) -> float:
        n = max(int(len(q_pool) * fraction), 16)
        q, p = q_pool[:n], p_pool[:n]
        cfg = GeneratorConfig(
            vocab_size=int(q_all.max()) + 1, program_vocab_size=int(p_all.max()) + 1,
            embed_dim=48, hidden_dim=96, encoder_layers=1, decoder_layers=1,
            dropout=0.0, program_len=p_all.shape[1],
        )
        model = ProgramGenerator(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.asarray(q[:2]), jnp.asarray(p[:2]),
        )
        params, tx = variables["params"], optax.adam(2e-3)
        opt_state = tx.init(params)
        rng = np.random.RandomState(0)

        @jax.jit
        def step(params, opt_state, qb, pb):
            def loss_fn(pr):
                out = model.apply({"params": pr}, qb, pb, deterministic=True,
                                  teacher_forcing=1.0)
                return cross_entropy(out["logits"], pb)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(300):
            idx = rng.choice(len(q), min(64, len(q)), replace=False)
            params, opt_state, _ = step(params, opt_state, jnp.asarray(q[idx]),
                                        jnp.asarray(p[idx]))
        gen = np.asarray(model.apply({"params": params}, jnp.asarray(q_eval),
                                     method=model.generate))
        em = 0
        for i in range(len(p_eval)):
            end = (np.argmax(p_eval[i] == 2) + 1) if (p_eval[i] == 2).any() else len(p_eval[i])
            em += int((gen[i][:end] == p_eval[i][:end]).all())
        acc = em / len(p_eval)
        print(f"  {n} training questions -> held-out program EM {acc:.3f}", flush=True)
        return acc

    print("generator data-efficiency sweep (held-out EM by train size):")
    results = data_efficiency_sweep(train_at, fractions=(0.1, 0.3, 1.0))
    print({f"{k:.1f}": round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
