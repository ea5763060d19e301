"""Dataset assembly: annotated questions -> padded training arrays.

Three consumers:

1. **Step seq2seq** (StepExecutorSeq2Seq): flatten questions into per-step
   (image_index, src tokens, tgt tokens) records, mirroring the reference
   ``VQADataset`` (train_transformer_full_annotation_new.py:81-134): src =
   function token + input_values tokens, tgt = output_values tokens, steps
   with empty tgt dropped.  Specials policy:
   - ``reference_compat=True``: raw ids, no START/END, pad 0 (the reference
     overloads vocab id 0 as both a real token and CE ignore-index);
   - default: tokens shifted by ``SPECIALS_OFFSET`` with <PAD>=0 <START>=1
     <END>=2 reserved — a sound contract for our own training runs.

2. **Thesis executor** (ProgramExecutor): per-step records with numeric
   boxes: input box set (from dependency outputs), 3-slot text tokens
   ⟨func, arg1, arg2⟩, target box set or target value token, branch flag.

3. **Chained inference**: per-question step metadata (function ids,
   dependency indices, step counts) — see infer/chain.py.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Sequence, Tuple

import numpy as np

from explainable_spatial_vqa_tpu.clevr.executor import NON_SPATIAL_FUNCTIONS
from explainable_spatial_vqa_tpu.core.vocab import canonicalize

logger = logging.getLogger(__name__)

__all__ = [
    "SPECIALS_OFFSET",
    "PAD",
    "START",
    "END",
    "flatten_steps",
    "parse_boxes",
    "executor_step_arrays",
    "chain_arrays",
]

PAD, START, END = 0, 1, 2
SPECIALS_OFFSET = 3


def _encode_tokens(text: str, offset: int) -> List[int]:
    return [int(tok) + offset for tok in text.split()]


def flatten_steps(
    annotated_questions: Sequence[Dict[str, Any]],
    max_src_len: int = 50,
    max_tgt_len: int = 20,
    reference_compat: bool = False,
    subset_fraction: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Flatten converted (id-string) annotated questions to step records.

    Returns {"image_index", "src", "tgt"} padded int32 arrays.  With specials
    (default), tgt = <START> tokens <END>; src/tgt token ids are shifted by
    SPECIALS_OFFSET.
    """
    offset = 0 if reference_compat else SPECIALS_OFFSET
    image_index: List[int] = []
    srcs: List[List[int]] = []
    tgts: List[List[int]] = []
    for q in annotated_questions:
        for step in q["annotated_program"]:
            tgt_text = step["output_values"].strip()
            if not tgt_text:
                continue
            src_text = (step["function"] + " " + step["input_values"]).strip()
            src = _encode_tokens(src_text, offset)[:max_src_len]
            tgt = _encode_tokens(tgt_text, offset)
            if not reference_compat:
                tgt = [START] + tgt + [END]
            tgt = tgt[:max_tgt_len]
            image_index.append(q["image_index"])
            srcs.append(src)
            tgts.append(tgt)

    total = len(srcs)
    if subset_fraction < 1.0:
        total = int(total * subset_fraction)
        image_index, srcs, tgts = image_index[:total], srcs[:total], tgts[:total]

    src_arr = np.zeros((total, max_src_len), np.int32)
    tgt_arr = np.zeros((total, max_tgt_len), np.int32)
    for i, (s, t) in enumerate(zip(srcs, tgts)):
        src_arr[i, : len(s)] = s
        tgt_arr[i, : len(t)] = t
    return {
        "image_index": np.asarray(image_index, np.int32),
        "src": src_arr,
        "tgt": tgt_arr,
    }


_BOX_RE = None


def parse_boxes(text: str) -> np.ndarray:
    """Parse '[x y x y] [x y x y] ...' into (K, 4) float32 (reference
    parse_bboxes, hungarian:44-54)."""
    global _BOX_RE
    if _BOX_RE is None:
        import re

        _BOX_RE = re.compile(r"\[([^\]]+)\]")
    rows = []
    for group in _BOX_RE.findall(text or ""):
        values = [float(x) for x in group.split()]
        if len(values) == 4:
            rows.append(values)
    if not rows:
        return np.zeros((0, 4), np.float32)
    return np.asarray(rows, np.float32)


def _parse_question_steps(
    q: Dict[str, Any],
    function_vocab: Mapping[str, int],
    value_vocab: Mapping[str, int],
) -> List[Dict[str, Any]]:
    """Parse one annotated question into per-step records (shared by the flat
    teacher-forced builder and the chain-structured builder).

    The CLI's `annotate` writes vocab-converted records into the h5 (id
    strings, reference apply_vocab semantics) with raw text only in
    --raw_json; accept both forms.  Converted functions are bare id digits;
    converted token outputs are ids EXCEPT numerics, which apply_split_vocab
    passes through verbatim (preprocess_continousv3.py:316-337).

    ``valid`` marks steps that survive the degenerate-step drop rules; all
    steps are still parsed so later steps' dependency positions stay correct.
    """
    inv_function = {v: k for k, v in function_vocab.items()}
    step_outputs: List[Tuple[str, Any]] = []  # (kind, value) per step
    parsed_steps: List[Dict[str, Any]] = []
    for step in q["annotated_program"]:
        function = step["function"]
        converted = False
        unresolved = False
        if function not in function_vocab and function.strip().isdigit():
            fid = int(function)
            if fid in inv_function:
                function = inv_function[fid]
                converted = True
            else:
                # a converted record whose id the given vocab does not know
                # (vocab mismatch): the step's branch/targets are
                # unknowable — keep its position but never train/score on it
                unresolved = True
        base = function.split("[")[0]
        is_box = base not in NON_SPATIAL_FUNCTIONS
        out_text = step["output_values"].strip()

        # dependency gathering from previously recorded *ground-truth*
        # outputs (teacher forcing at the step level, as in training data)
        dep_boxes: List[np.ndarray] = []
        dep_tokens: List[int] = []
        for dep in step.get("inputs", []):
            if dep >= len(step_outputs):
                continue
            kind, value = step_outputs[dep]
            if kind == "box":
                dep_boxes.append(value)
            elif kind == "token" and value >= 0:
                dep_tokens.append(value)

        target_boxes = np.zeros((0, 4), np.float32)
        if is_box:
            target_boxes = parse_boxes(out_text)
            step_outputs.append(("box", target_boxes))
            token_id = -1
        else:
            # raw annotations carry python reprs ("True"); the vocab is
            # canonicalized (true/false), so canonicalize before lookup.
            # Converted records hold id digits — except count outputs,
            # whose numerals pass through conversion verbatim and resolve
            # through the vocab like raw records.
            can = canonicalize(out_text)
            if converted and base != "count" and can.isdigit():
                token_id = int(can)
            else:
                token_id = value_vocab.get(can, -1)
            step_outputs.append(("token", token_id))

        valid = not (
            unresolved
            or (is_box and len(target_boxes) == 0 and out_text == "")
            or (not is_box and token_id < 0)
        )
        parsed_steps.append({
            "function": function,
            "function_id": function_vocab.get(function, 0),
            "is_box": is_box,
            "inputs": list(step.get("inputs", [])),
            "dep_boxes": dep_boxes,
            "dep_tokens": dep_tokens,
            "target_boxes": target_boxes,
            "token_id": token_id,
            "valid": valid,
        })
    return parsed_steps


def executor_step_arrays(
    annotated_questions: Sequence[Dict[str, Any]],
    function_vocab: Mapping[str, int],
    value_vocab: Mapping[str, int],
    max_input_boxes: int = 10,
    max_output_boxes: int = 10,
    subset_fraction: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Build thesis-executor training records from *raw* (unconverted)
    annotated questions (text fields still tokens, boxes still bbox strings).

    Per step:
    - ``text``: (3,) int — function id (function vocab), then up to 2 value
      tokens from non-spatial dependency outputs (value vocab); pad -1->0 with
      text_mask.
    - ``input_boxes``: (max_input_boxes, 4) + ``input_box_mask`` — dependency
      spatial outputs, concatenated and truncated.
    - ``target_boxes``: (max_output_boxes, 4) + ``target_box_mask`` for
      spatial steps; ``token_target`` for non-spatial steps; ``is_box_branch``.
    Steps whose spatial output is empty (post-INVALID poisoning) are dropped,
    matching the seq2seq dataset's empty-tgt drop.
    """
    records: Dict[str, List[Any]] = {
        "image_index": [], "text": [], "text_mask": [], "input_boxes": [],
        "input_box_mask": [], "target_boxes": [], "target_box_mask": [],
        "token_target": [], "is_box_branch": [],
    }
    for q in annotated_questions:
        for parsed in _parse_question_steps(q, function_vocab, value_vocab):
            if not parsed["valid"]:
                continue
            dep_tokens = parsed["dep_tokens"]
            text = [parsed["function_id"]] + dep_tokens[:2]
            text_mask = [True] + [True] * len(dep_tokens[:2])
            while len(text) < 3:
                text.append(0)
                text_mask.append(False)

            dep_boxes = parsed["dep_boxes"]
            boxes_in = (
                np.concatenate(dep_boxes, axis=0) if dep_boxes else np.zeros((0, 4), np.float32)
            )[:max_input_boxes]
            in_pad = np.zeros((max_input_boxes, 4), np.float32)
            in_pad[: len(boxes_in)] = boxes_in
            in_mask = np.arange(max_input_boxes) < len(boxes_in)

            if parsed["is_box"]:
                target = parsed["target_boxes"][:max_output_boxes]
                t_pad = np.zeros((max_output_boxes, 4), np.float32)
                t_pad[: len(target)] = target
                t_mask = np.arange(max_output_boxes) < len(target)
                token_target = 0
            else:
                t_pad = np.zeros((max_output_boxes, 4), np.float32)
                t_mask = np.zeros(max_output_boxes, bool)
                token_target = parsed["token_id"]

            records["image_index"].append(q["image_index"])
            records["text"].append(text)
            records["text_mask"].append(text_mask)
            records["input_boxes"].append(in_pad)
            records["input_box_mask"].append(in_mask)
            records["target_boxes"].append(t_pad)
            records["target_box_mask"].append(t_mask)
            records["token_target"].append(token_target)
            records["is_box_branch"].append(parsed["is_box"])

    total = len(records["image_index"])
    total_steps = sum(len(q["annotated_program"]) for q in annotated_questions)
    if total_steps and total < total_steps // 2:
        # >half the steps failed the parse rules — almost always a vocab
        # mismatch (converted h5 scored against the wrong split_vocab_json)
        logger.warning(
            "executor_step_arrays: only %d of %d annotated steps are usable "
            "— check that the vocab JSONs match the annotated h5",
            total, total_steps,
        )
    if subset_fraction < 1.0:
        total = int(total * subset_fraction)
    out = {
        "image_index": np.asarray(records["image_index"][:total], np.int32),
        "text": np.asarray(records["text"][:total], np.int32),
        "text_mask": np.asarray(records["text_mask"][:total], bool),
        "input_boxes": np.asarray(records["input_boxes"][:total], np.float32),
        "input_box_mask": np.asarray(records["input_box_mask"][:total], bool),
        "target_boxes": np.asarray(records["target_boxes"][:total], np.float32),
        "target_box_mask": np.asarray(records["target_box_mask"][:total], bool),
        "token_target": np.asarray(records["token_target"][:total], np.int32),
        "is_box_branch": np.asarray(records["is_box_branch"][:total], bool),
    }
    return out


def executor_chain_step_arrays(
    annotated_questions: Sequence[Dict[str, Any]],
    function_vocab: Mapping[str, int],
    value_vocab: Mapping[str, int],
    max_steps: int = 28,
    max_output_boxes: int = 10,
    subset_fraction: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Chain-structured executor training arrays (one row per QUESTION).

    Unlike ``executor_step_arrays`` (flat teacher-forced step records), this
    keeps each question's program as arrays over step positions so training
    can thread dependencies through caches exactly like chained inference —
    the substrate for chain-level scheduled sampling (train.scheduled).

    Per question: ``functions`` (S,), ``deps`` (S, 2) int64 (-1 = none),
    ``num_steps``, per-step targets ``target_boxes`` (S, Q, 4) /
    ``target_box_mask`` (S, Q) / ``token_target`` (S,) / ``is_box_branch``
    (S,), and ``step_valid`` (S,) masking degenerate steps out of the loss
    (they still occupy positions so dependency indices stay aligned).
    Questions with more than ``max_steps`` steps are skipped.
    """
    records: Dict[str, List[Any]] = {k: [] for k in (
        "image_index", "functions", "deps", "num_steps", "target_boxes",
        "target_box_mask", "token_target", "is_box_branch", "step_valid",
    )}
    skipped_long = 0
    skipped_empty = 0
    for q in annotated_questions:
        parsed = _parse_question_steps(q, function_vocab, value_vocab)
        s = len(parsed)
        if s == 0 or s > max_steps:
            skipped_long += int(s > max_steps)
            skipped_empty += int(s == 0)
            continue
        functions = np.zeros(max_steps, np.int32)
        deps = np.full((max_steps, 2), -1, np.int64)
        t_boxes = np.zeros((max_steps, max_output_boxes, 4), np.float32)
        t_mask = np.zeros((max_steps, max_output_boxes), bool)
        token_target = np.zeros(max_steps, np.int32)
        is_box = np.zeros(max_steps, bool)
        valid = np.zeros(max_steps, bool)
        for k, p in enumerate(parsed):
            functions[k] = p["function_id"]
            for d, dep in enumerate(p["inputs"][:2]):
                if 0 <= dep < k:  # backwards-only, like the flat parser
                    deps[k, d] = dep
            boxes = p["target_boxes"][:max_output_boxes]
            t_boxes[k, : len(boxes)] = boxes
            t_mask[k, : len(boxes)] = True
            token_target[k] = max(p["token_id"], 0)
            is_box[k] = p["is_box"]
            valid[k] = p["valid"]
        records["image_index"].append(q["image_index"])
        records["functions"].append(functions)
        records["deps"].append(deps)
        records["num_steps"].append(s)
        records["target_boxes"].append(t_boxes)
        records["target_box_mask"].append(t_mask)
        records["token_target"].append(token_target)
        records["is_box_branch"].append(is_box)
        records["step_valid"].append(valid)
    if skipped_long or skipped_empty:
        logger.warning(
            "executor_chain_step_arrays: skipped %d questions longer than "
            "max_steps=%d and %d with zero parsed steps",
            skipped_long, max_steps, skipped_empty,
        )
    total = len(records["image_index"])
    if subset_fraction < 1.0:
        total = int(total * subset_fraction)
    dtypes = {"image_index": np.int32, "num_steps": np.int32}
    return {
        k: np.asarray(v[:total], dtypes.get(k))
        for k, v in records.items()
    }


@dataclass
class ChainArrays:
    """Per-question static chain metadata for vectorized inference."""

    image_index: np.ndarray  # (N,)
    functions: np.ndarray  # (N, S) function-vocab ids, 0-padded
    deps: np.ndarray  # (N, S, 2) dependency step indices, -1 = absent
    num_steps: np.ndarray  # (N,)
    answers: List[str]  # raw answer strings (for eval)
    # First-class truncation accounting: how many programs exceeded the
    # serving depth bound and had their tails dropped (their final step then
    # reads a mid-chain value — answers score wrong, and silent truncation
    # would corrupt the faithfulness quadrants; reference chains run to
    # depth 27, utils_programs.py max program len).
    truncated: int = 0


def chain_arrays(
    annotated_questions: Sequence[Dict[str, Any]],
    function_vocab: Mapping[str, int],
    max_steps: int = 28,
) -> ChainArrays:
    """Parse raw annotated questions into chain-execution metadata.

    Uses ``annotated_program``'s own function/inputs (equivalent to parsing
    final_chain_of_thought, which serializes exactly these;
    preprocess_continousv3.py:438-439).
    """
    n = len(annotated_questions)
    functions = np.zeros((n, max_steps), np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = np.zeros(n, np.int32)
    image_index = np.zeros(n, np.int32)
    answers: List[str] = []
    inv = {v: k for k, v in function_vocab.items()}
    truncated = 0
    for i, q in enumerate(annotated_questions):
        truncated += int(len(q["annotated_program"]) > max_steps)
        program = q["annotated_program"][:max_steps]
        num_steps[i] = len(program)
        image_index[i] = q["image_index"]
        answers.append(str(q.get("answer", "")))
        for s, step in enumerate(program):
            fn = step["function"]
            if fn not in function_vocab and fn.strip().isdigit() and int(fn) in inv:
                functions[i, s] = int(fn)  # vocab-converted record: already an id
            else:
                functions[i, s] = function_vocab.get(fn, 0)
            for d, dep in enumerate(step.get("inputs", [])[:2]):
                deps[i, s, d] = dep
    if truncated:
        logger.warning(
            "chain_arrays: %d questions exceed max_steps=%d and were "
            "TRUNCATED — their final step is a mid-chain value, so their "
            "answers will score wrong; raise max_steps to cover them",
            truncated, max_steps,
        )
    return ChainArrays(image_index, functions, deps, num_steps, answers,
                       truncated=truncated)


# ---------------------------------------------------------------------------
# Prototype step-model targets (derived from executor_step_arrays output)
# ---------------------------------------------------------------------------

MULTIHEAD_HEADS = (
    "bbox", "integer", "boolean", "size", "color", "shape", "material", "vocab"
)

_BOOLEAN_BASES = {
    "exist", "equal_color", "equal_shape", "equal_size", "equal_material",
    "equal_integer", "less_than", "greater_than",
}
_ATTR_HEAD = {
    "query_size": ("size", ("large", "small")),
    "query_color": ("color", ("gray", "red", "blue", "green", "brown",
                              "purple", "cyan", "yellow")),
    "query_shape": ("shape", ("cube", "sphere", "cylinder")),
    "query_material": ("material", ("rubber", "metal")),
}


def multihead_typed_targets(
    arrays: Dict[str, np.ndarray],
    function_vocab: Mapping[str, int],
    value_vocab: Mapping[str, int],
) -> Dict[str, np.ndarray]:
    """Per-record routing + typed-class targets for the 8-head step model
    (training2.py:356-433 dispatches the loss by function output type).

    Returns head_id (N,) int32 (index into MULTIHEAD_HEADS) and typed_target
    (N,) int32 (class within that head; 0 for the bbox head)."""
    inv_f = {v: k for k, v in function_vocab.items()}
    inv_v = {v: k for k, v in value_vocab.items()}
    fids = arrays["text"][:, 0]
    n = len(fids)
    head_id = np.zeros(n, np.int32)
    typed = np.zeros(n, np.int32)
    for i in range(n):
        if arrays["is_box_branch"][i]:
            head_id[i] = MULTIHEAD_HEADS.index("bbox")
            continue
        base = inv_f.get(int(fids[i]), "").split("[")[0]
        value = canonicalize(str(inv_v.get(int(arrays["token_target"][i]), "")))
        if base == "count":
            head_id[i] = MULTIHEAD_HEADS.index("integer")
            try:
                typed[i] = min(max(int(value), 0), 10)
            except ValueError:
                typed[i] = 0
        elif base in _BOOLEAN_BASES:
            head_id[i] = MULTIHEAD_HEADS.index("boolean")
            typed[i] = 1 if value == "true" else 0
        elif base in _ATTR_HEAD:
            name, classes = _ATTR_HEAD[base]
            head_id[i] = MULTIHEAD_HEADS.index(name)
            typed[i] = classes.index(value) if value in classes else 0
        else:
            head_id[i] = MULTIHEAD_HEADS.index("vocab")
            typed[i] = int(arrays["token_target"][i])
    return {"head_id": head_id, "typed_target": typed}


def selection_targets(
    arrays: Dict[str, np.ndarray], tol: float = 1e-4
) -> np.ndarray:
    """Per-input-box membership labels for the bbox-selection predictor:
    an input box is selected iff it (nearly) equals some output box
    (inference_bbinout.py:104-113 matches by coordinate equality)."""
    inp = arrays["input_boxes"]  # (N, S, 4)
    out = arrays["target_boxes"]  # (N, T, 4)
    diff = np.abs(inp[:, :, None, :] - out[:, None, :, :]).max(-1)  # (N, S, T)
    match = (diff < tol) & arrays["target_box_mask"][:, None, :]
    return (match.any(-1) & arrays["input_box_mask"]).astype(np.float32)


def yolo_grid_targets(
    boxes: np.ndarray, mask: np.ndarray, grid: int = 7
) -> np.ndarray:
    """(N, grid, grid, 5) YOLO targets from normalized xyxy box sets: each
    valid box writes (cx_off, cy_off, w, h, 1) into its center cell
    (training_bb_onlyv3.py:53-135's grid-target construction)."""
    n = boxes.shape[0]
    target = np.zeros((n, grid, grid, 5), np.float32)
    for i in range(n):
        for b, valid in zip(boxes[i], mask[i]):
            if not valid:
                continue
            cx = (b[0] + b[2]) * 0.5
            cy = (b[1] + b[3]) * 0.5
            col = min(int(cx * grid), grid - 1)
            row = min(int(cy * grid), grid - 1)
            target[i, row, col] = (
                cx * grid - col, cy * grid - row, b[2] - b[0], b[3] - b[1], 1.0
            )
    return target
