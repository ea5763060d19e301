"""Program generator tests: shapes, greedy decode, teacher forcing, overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from explainable_spatial_vqa_tpu.core.config import GeneratorConfig
from explainable_spatial_vqa_tpu.models.generator import ProgramGenerator

CFG = GeneratorConfig(
    vocab_size=20, program_vocab_size=12, embed_dim=16, hidden_dim=24,
    encoder_layers=2, decoder_layers=2, program_len=5, dropout=0.0,
)
SIMPLE_CFG = GeneratorConfig(
    vocab_size=20, program_vocab_size=12, embed_dim=16, hidden_dim=24,
    simple=True, dropout=0.0, program_len=5,
)


def _questions(batch=2, length=7, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randint(4, CFG.vocab_size, (batch, length))
    q[:, -2:] = 0  # pad tail
    return jnp.asarray(q, jnp.int32)


@pytest.mark.parametrize("cfg", [CFG, SIMPLE_CFG], ids=["thesis", "simple"])
def test_forward_and_generate(cfg):
    model = ProgramGenerator(cfg)
    q = _questions()
    targets = jnp.asarray(np.random.RandomState(1).randint(0, 12, (2, 5)), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, q, targets
    )
    out = model.apply(variables, q, targets)
    assert out["logits"].shape == (2, 5, cfg.program_vocab_size)
    assert out["tokens"].shape == (2, 5)
    gen = model.apply(variables, q, method=model.generate)
    assert gen.shape == (2, cfg.program_len)


def test_teacher_forcing_uses_targets():
    """With TF ratio 1.0 the decoder input at step t+1 is the gold token; with
    0.0 it is the argmax prediction — outputs must differ for a random net."""
    model = ProgramGenerator(CFG)
    q = _questions()
    targets = jnp.asarray(np.random.RandomState(1).randint(1, 12, (2, 5)), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, q, targets)
    out_tf = model.apply(
        variables, q, targets, deterministic=False, teacher_forcing=1.0,
        rngs={"sample": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
    )
    out_free = model.apply(
        variables, q, targets, deterministic=True, teacher_forcing=0.0,
    )
    assert not np.allclose(np.asarray(out_tf["logits"]), np.asarray(out_free["logits"]))


def test_generator_overfits():
    """Greedy decode must reproduce a memorized (question -> program) pair."""
    model = ProgramGenerator(SIMPLE_CFG)
    q = _questions(batch=4, seed=3)
    targets = jnp.asarray(np.random.RandomState(4).randint(1, 12, (4, 5)), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, q, targets
    )
    params = variables["params"]
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = ProgramGenerator(SIMPLE_CFG).apply(
                {"params": p}, q, targets, deterministic=True, teacher_forcing=1.0
            )
            logp = jax.nn.log_softmax(out["logits"], axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None], -1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(200):
        params, opt_state, loss = step(params, opt_state)
    gen = ProgramGenerator(SIMPLE_CFG).apply({"params": params}, q, method="generate")
    assert float(loss) < 0.1
    np.testing.assert_array_equal(np.asarray(gen), np.asarray(targets))


def test_beam_generate_matches_greedy_at_beam1():
    model = ProgramGenerator(CFG)
    q = _questions(batch=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        q, jnp.zeros((4, CFG.program_len), jnp.int32),
    )
    greedy = np.asarray(model.apply(variables, q, method=model.generate))
    beam, scores = model.apply(variables, q, beam_size=1, method=model.beam_generate)
    beam = np.asarray(beam)[:, 0]
    # identical up to (and including) the first END token; the beam pads after
    # END while greedy keeps free-running
    for g, b in zip(greedy, beam):
        ends = np.flatnonzero(g == 2)
        stop = (ends[0] + 1) if len(ends) else len(g)
        np.testing.assert_array_equal(g[:stop], b[:stop])
        assert (b[stop:] == 0).all()


def test_beam_generate_scores_sorted_and_improving():
    model = ProgramGenerator(CFG)
    q = _questions(batch=3, seed=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "sample": jax.random.PRNGKey(3)},
        q, jnp.zeros((3, CFG.program_len), jnp.int32),
    )
    _, s1 = model.apply(variables, q, beam_size=1, method=model.beam_generate)
    toks, s4 = model.apply(variables, q, beam_size=4, method=model.beam_generate)
    s1, s4 = np.asarray(s1), np.asarray(s4)
    assert toks.shape == (3, 4, CFG.program_len)
    assert (np.diff(s4, axis=-1) <= 1e-6).all()  # sorted best-first
    assert (s4[:, 0] >= s1[:, 0] - 1e-5).all()  # wider beam never worse
