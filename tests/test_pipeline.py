"""End-to-end inference pipeline: program parsing, chain compilation, run."""

import jax
import jax.numpy as jnp
import numpy as np

from explainable_spatial_vqa_tpu.core import programs as prog
from explainable_spatial_vqa_tpu.core.config import ExecutorConfig, GeneratorConfig
from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner
from explainable_spatial_vqa_tpu.infer.pipeline import (
    InferencePipeline,
    decode_program_ids,
    programs_to_chains,
)
from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
from explainable_spatial_vqa_tpu.models.generator import ProgramGenerator


def test_decode_program_ids_roundtrip(fixture_train_question):
    program = fixture_train_question["program"]
    tokens = prog.program_tokens(program, "postfix")
    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2}
    for t in tokens:
        vocab.setdefault(t, len(vocab))
    inv = {v: k for k, v in vocab.items()}
    ids = np.asarray([[1] + [vocab[t] for t in tokens] + [2, 0, 0]])
    decoded = decode_program_ids(ids, inv, "postfix")
    assert decoded[0] is not None
    assert prog.program_to_str(decoded[0], "postfix") == " ".join(tokens)


def test_decode_malformed_program():
    inv = {0: "<NULL>", 1: "<START>", 2: "<END>", 3: "count", 4: "scene"}
    # count with no operand available -> arity parse fails -> None
    ids = np.asarray([[1, 3, 2], [1, 4, 2]])
    decoded = decode_program_ids(ids, inv, "postfix")
    assert decoded[0] is None
    assert decoded[1] is not None and decoded[1][0]["function"] == "scene"


def test_programs_to_chains(fixture_train_question):
    program = fixture_train_question["program"]
    fn_vocab = {}
    for node in program:
        fn_vocab.setdefault(prog.function_token(node), len(fn_vocab) + 1)
    chains = programs_to_chains([program, None], np.asarray([0, 0]), fn_vocab, max_steps=16)
    assert chains.num_steps[0] == min(len(program), 16)
    assert chains.num_steps[1] == 1  # no-op fallback
    # deps mirror the program's inputs
    for s, node in enumerate(program[:16]):
        for d, dep in enumerate(node["inputs"][:2]):
            assert chains.deps[0, s, d] == dep


def test_programs_to_chains_truncation_is_counted():
    """Truncation is a FIRST-CLASS metric (not just a log line): programs
    deeper than max_steps must be counted on the returned ChainArrays so
    tally/bench can report them instead of silently corrupting quadrants."""
    deep = [{"function": "scene", "inputs": []}] + [
        {"function": "filter_size[large]", "inputs": [i]} for i in range(7)
    ]
    shallow = deep[:3]
    fn_vocab = {"scene": 1, "filter_size[large]": 2}
    chains = programs_to_chains(
        [deep, shallow, None], np.asarray([0, 0, 0]), fn_vocab, max_steps=4)
    assert chains.truncated == 1
    assert chains.num_steps[0] == 4  # cut at the bound
    assert chains.num_steps[1] == 3  # untouched
    ok = programs_to_chains(
        [deep, shallow], np.asarray([0, 0]), fn_vocab, max_steps=16)
    assert ok.truncated == 0


def test_chain_arrays_truncation_is_counted():
    """GT chains deeper than max_steps are counted too (cli tally reports
    truncated_gt_programs from this field)."""
    from explainable_spatial_vqa_tpu.train.datasets import chain_arrays

    mk = lambda depth: {
        "image_index": 0, "answer": "1",
        "annotated_program": [
            {"function": "scene", "inputs": []}] + [
            {"function": "count", "inputs": [i]} for i in range(depth - 1)],
    }
    out = chain_arrays([mk(6), mk(2)], {"scene": 1, "count": 2}, max_steps=4)
    assert out.truncated == 1
    assert out.num_steps[0] == 4 and out.num_steps[1] == 2
    assert chain_arrays([mk(2)], {"scene": 1, "count": 2},
                        max_steps=4).truncated == 0


def test_shipped_corpus_depth_within_serving_bound():
    """Every shipped synthetic corpus pins GT depth <= its max_nodes knob, so
    GT chains never truncate at a serving bound set to the corpus max_nodes
    (the demo protocols run max_steps=16 with max_nodes=16)."""
    from explainable_spatial_vqa_tpu.clevr.synthetic import synthesize_dataset

    for hop_prob, chain_prob in [(0.0, 0.0), (1.0, 0.8)]:
        _, questions = synthesize_dataset(
            6, 6, seed=0, hop_prob=hop_prob, chain_prob=chain_prob,
            max_nodes=16)
        assert questions, "corpus synthesis produced no questions"
        depths = [len(q["program"]) for q in questions]
        assert max(depths) <= 16


def test_pipeline_end_to_end(fixture_train_question):
    gen_cfg = GeneratorConfig(
        vocab_size=24, program_vocab_size=16, embed_dim=8, hidden_dim=12,
        encoder_layers=1, decoder_layers=1, program_len=6, dropout=0.0, simple=True,
    )
    exe_cfg = ExecutorConfig(
        vocab_size=16, d_model=32, num_heads=2, encoder_layers=1, box_decoder_layers=1,
        num_queries=3, num_image_tokens=4, image_feature_dim=8, max_input_boxes=4,
        token_classes=8,
    )
    generator = ProgramGenerator(gen_cfg)
    executor = ProgramExecutor(exe_cfg)
    rng = np.random.RandomState(0)
    questions = jnp.asarray(rng.randint(4, 24, (2, 7)), jnp.int32)
    gen_vars = generator.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        questions, jnp.zeros((2, 6), jnp.int32),
    )
    img = jnp.asarray(rng.rand(2, 4, 8), jnp.float32)
    exe_vars = executor.init(
        jax.random.PRNGKey(2), img, jnp.zeros((2, 4, 4)), jnp.ones((2, 4), bool),
        jnp.zeros((2, 3), jnp.int32), jnp.ones((2, 3), bool),
    )
    runner = ExecutorChainRunner(executor, exe_vars, exe_cfg, max_steps=6)

    inv = {0: "<NULL>", 1: "<START>", 2: "<END>"}
    for i, t in enumerate(["scene", "count", "exist", "filter_size[large]"], start=3):
        inv[i] = t
    fn_vocab = {"scene": 1, "count": 2, "exist": 3, "filter_size[large]": 4}

    pipeline = InferencePipeline(generator, gen_vars, runner, inv, fn_vocab)
    result = pipeline.run(
        np.asarray(questions), np.asarray(img), np.asarray([0, 1]),
        gt_answers=np.asarray([1, 2]),
        gt_programs=np.zeros((2, 6), np.int32),
    )
    assert result.program_ids.shape == (2, 6)
    assert result.answers.shape == (2,)
    assert result.tally is not None and result.tally.total == 2
