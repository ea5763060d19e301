"""Full inference pipeline: question -> program -> chained execution -> answer.

The deployment path of the framework (BASELINE.json "full pipeline" config):

1. the Program Generator greedily decodes fused program tokens (postfix) for
   a batch of questions, fully on device;
2. decoded programs are parsed back to node lists (core.programs arity
   parser) and compiled to ChainArrays — functions mapped into the executor's
   function vocab, dependency indices recovered from the postfix structure;
3. the ExecutorChainRunner executes all questions' step k simultaneously,
   threading box/token outputs through HBM caches;
4. the final non-spatial step's token is the answer; the faithfulness tally
   compares (program, answer) correctness jointly.

Replaces run_model_* + inference_* script pairs
(/root/reference/code/run_model_transformer_iqap.py:306-544,
inference_transformer_iqap_tally.py:279-357).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from explainable_spatial_vqa_tpu.core import programs as prog
from explainable_spatial_vqa_tpu.core.tokenizer import END, NULL, START
from explainable_spatial_vqa_tpu.evalsuite.faithfulness import FaithfulnessTally, tally_faithfulness
from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner
from explainable_spatial_vqa_tpu.train.datasets import ChainArrays

logger = logging.getLogger(__name__)

__all__ = ["decode_program_ids", "programs_to_chains", "InferencePipeline"]


def decode_program_ids(
    program_ids: np.ndarray,
    idx_to_token: Mapping[int, str],
    mode: str = "postfix",
) -> List[Optional[List[Dict[str, Any]]]]:
    """Decoded generator ids -> program node lists (None where unparseable).

    Strips <START>/<END>/<NULL> and inverts the ``mode`` linearization via
    the arity parser; malformed programs (bad arity structure) yield None and
    count as incorrect in the tally.
    """
    out: List[Optional[List[Dict[str, Any]]]] = []
    for row in np.asarray(program_ids):
        tokens: List[str] = []
        for idx in row:
            token = idx_to_token.get(int(idx), NULL)
            if token == END:
                break
            if token in (NULL, START):
                continue
            tokens.append(token)
        try:
            entries = [prog.parse_function_token(t) for t in tokens]
            if mode == "postfix":
                out.append(prog.postfix_to_list(entries))
            elif mode == "prefix":
                out.append(prog.prefix_to_list(entries))
            else:
                raise ValueError(mode)
        except Exception:
            out.append(None)
    return out


def programs_to_chains(
    programs: Sequence[Optional[Sequence[Dict[str, Any]]]],
    image_index: np.ndarray,
    function_vocab: Mapping[str, int],
    max_steps: int = 28,
) -> ChainArrays:
    """Node lists -> ChainArrays for the vectorized runner.  Unparseable
    programs become 1-step no-ops (their answers read as token 0)."""
    n = len(programs)
    functions = np.zeros((n, max_steps), np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = np.ones(n, np.int32)
    truncated = 0
    for i, program in enumerate(programs):
        if not program:
            continue
        truncated += int(len(program) > max_steps)
        program = list(program)[:max_steps]
        num_steps[i] = len(program)
        for s, node in enumerate(program):
            functions[i, s] = function_vocab.get(prog.function_token(node), 0)
            for d, dep in enumerate(node.get("inputs", [])[:2]):
                deps[i, s, d] = dep
    if truncated:
        logger.warning(
            "programs_to_chains: %d generated programs exceed max_steps=%d "
            "and were truncated (their answers will read a mid-chain value)",
            truncated, max_steps,
        )
    return ChainArrays(np.asarray(image_index, np.int32), functions, deps,
                       num_steps, [], truncated=truncated)


@dataclass
class PipelineResult:
    program_ids: np.ndarray  # (N, L) generated program tokens
    answers: np.ndarray  # (N,) predicted answer token ids (value vocab)
    answer_valid: np.ndarray  # (N,) final step produced a token
    tally: Optional[FaithfulnessTally] = None
    # generated programs deeper than the runner's max_steps whose execution
    # was truncated — first-class metric, not just a log line (a corpus with
    # deeper GT programs would otherwise silently corrupt the quadrants)
    truncated: int = 0


class InferencePipeline:
    """Generator + executor end-to-end runner."""

    def __init__(
        self,
        generator,
        generator_vars,
        runner: ExecutorChainRunner,
        program_idx_to_token: Mapping[int, str],
        executor_function_vocab: Mapping[str, int],
        mode: str = "postfix",
    ):
        self.generator = generator
        self.generator_vars = generator_vars
        self.runner = runner
        self.program_idx_to_token = dict(program_idx_to_token)
        self.executor_function_vocab = dict(executor_function_vocab)
        self.mode = mode
        self._generate = jax.jit(
            lambda q: generator.apply(generator_vars, q, method=generator.generate)
        )

    def run(
        self,
        questions: np.ndarray,
        image_tokens: np.ndarray,
        image_index: np.ndarray,
        gt_answers: Optional[np.ndarray] = None,
        gt_programs: Optional[np.ndarray] = None,
        chain_mode: str = "sorted",
    ) -> PipelineResult:
        program_ids = np.asarray(self._generate(jnp.asarray(questions)))
        programs = decode_program_ids(program_ids, self.program_idx_to_token, self.mode)
        chains = programs_to_chains(
            programs, image_index, self.executor_function_vocab, self.runner.max_steps
        )
        # grouping by PREDICTED chain depth is not oracle knowledge — the
        # depth is known once the program is generated; parity with the
        # plain runner is exact for all fast paths (tests/test_chain.py).
        # "sorted" (default) is the serving fast path (docs/DESIGN.md §10):
        # depth-sorted batches, dynamic loop bound, one compile per batch
        # size; "pool" is the continuous-batching path (§10.2): one jitted
        # while_loop over a slot pool, finished questions retire mid-loop;
        # "bucketed" keeps the r2 per-depth-bucket compiles.
        if chain_mode == "pool":
            # the pool gathers image tokens per iteration by image_index —
            # it takes the per-IMAGE cache directly, never the per-question
            # duplication the other runners consume
            out = self.runner.run_pool(image_tokens, chains)
        else:
            if isinstance(image_tokens, jax.Array):
                # features resident in HBM: gather by index on device (no
                # PCIe round-trip per call — the thesis image-feature cache)
                gathered = jnp.take(
                    image_tokens, jnp.asarray(chains.image_index), axis=0
                )
            else:
                gathered = np.asarray(image_tokens)[chains.image_index]
            if chain_mode == "sorted":
                out = self.runner.run_sorted(gathered, chains)
            elif chain_mode == "bucketed":
                out = self.runner.run_bucketed(gathered, chains)
            elif chain_mode == "plain":
                out = self.runner.run(gathered, chains)
            else:
                raise ValueError(f"unknown chain_mode {chain_mode!r}")
        result = PipelineResult(
            program_ids=program_ids,
            answers=out["final_tokens"],
            answer_valid=out["final_is_token"],
            truncated=chains.truncated,
        )
        if gt_answers is not None and gt_programs is not None:
            answers = np.where(result.answer_valid, result.answers, -1)
            result.tally = tally_faithfulness(
                answers, np.asarray(gt_answers), program_ids, np.asarray(gt_programs)
            )
        return result
