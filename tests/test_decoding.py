"""Beam search: best beam equals greedy; scores sorted; shapes; end-token."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from explainable_spatial_vqa_tpu.core.config import StepSeq2SeqConfig
from explainable_spatial_vqa_tpu.models.step_executor import StepExecutorSeq2Seq
from explainable_spatial_vqa_tpu.ops.decoding import beam_search_decode, greedy_decode

CFG = StepSeq2SeqConfig(
    vocab_size=16, d_model=16, num_heads=2, encoder_layers=1, decoder_layers=1,
    ffn_dim=32, max_src_len=8, max_tgt_len=4, num_image_tokens=4, image_feature_dim=8,
)


@pytest.fixture(scope="module")
def setup():
    model = StepExecutorSeq2Seq(CFG)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 4, 8), jnp.float32)
    src = jnp.asarray(rng.randint(1, 16, (2, 5)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, src, jnp.zeros((2, 3), jnp.int32))
    memory, key_mask = model.apply(variables, img, src, None, method=model.encode)
    return model, variables, memory, key_mask


def test_beam_one_equals_greedy(setup):
    model, variables, memory, key_mask = setup
    greedy = np.asarray(greedy_decode(model, variables, memory, key_mask, 1, 4))
    beams, scores = beam_search_decode(
        model, variables, memory, key_mask, 1, 4, beam_size=3
    )
    np.testing.assert_array_equal(np.asarray(beams)[:, 0], greedy)
    assert (np.diff(np.asarray(scores), axis=-1) <= 1e-5).all()


def test_beam_shapes_and_jit(setup):
    model, variables, memory, key_mask = setup

    @jax.jit
    def run(memory):
        return beam_search_decode(model, variables, memory, key_mask, 1, 4,
                                  beam_size=2, end_token=2)

    beams, scores = run(memory)
    assert beams.shape == (2, 2, 4)
    assert scores.shape == (2, 2)


def test_beam_score_is_sum_of_logprobs(setup):
    """The best beam's score must equal the sum of per-step log-probs of its
    tokens under the model (verifies backtracking correctness)."""
    model, variables, memory, key_mask = setup
    beams, scores = beam_search_decode(
        model, variables, memory, key_mask, 1, 4, beam_size=3
    )
    beams, scores = np.asarray(beams), np.asarray(scores)
    # teacher-force the best beam and accumulate its log-probs
    prefix = np.concatenate([np.full((2, 1), 1, np.int32), beams[:, 0, :-1]], axis=1)
    logits = model.apply(variables, jnp.asarray(prefix), memory, key_mask,
                         method=model.decode)
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    picked = np.take_along_axis(np.asarray(logp), beams[:, 0, :, None], axis=-1)[..., 0]
    np.testing.assert_allclose(picked.sum(-1), scores[:, 0], atol=1e-3)
