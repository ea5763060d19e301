"""CLEVR functional-program structure utilities.

A CLEVR program is serialized in question JSON as a *list* of nodes, each
``{"function": str, "value_inputs": [str], "inputs": [int]}`` where ``inputs``
holds indices of earlier list entries (a topologically ordered DAG whose last
node is the root).  This module converts between the list form, an explicit
tree form, and flat prefix/postfix serializations, and provides the
string <-> node encodings used to build program token vocabularies.

Behavioral parity with the reference implementation
(``/root/reference/code/preprocess_questions/utils_programs.py:15-156``):
identical traversal orders, identical ``name[v1,v2]`` token text, identical
arity rules.  The implementation here is new (dataclass-based, iterative where
the reference recursed) but produces byte-identical program strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence

__all__ = [
    "Node",
    "arity",
    "function_token",
    "parse_function_token",
    "is_chain",
    "list_to_tree",
    "tree_to_list",
    "list_to_prefix",
    "list_to_postfix",
    "prefix_to_list",
    "postfix_to_list",
    "program_to_str",
    "program_tokens",
]


@dataclass
class Node:
    """One program node in tree form."""

    function: str
    value_inputs: List[str] = field(default_factory=list)
    children: List["Node"] = field(default_factory=list)

    def to_flat(self) -> Dict[str, Any]:
        return {"function": self.function, "value_inputs": list(self.value_inputs)}


# Two-input CLEVR functions; ``scene`` is nullary; everything else is unary.
# Matches reference get_num_inputs (utils_programs.py:147-156), including its
# substring test for 'equal' (so equal_color/equal_integer/... are all binary).
_BINARY_EXACT = {"union", "intersect", "less_than", "greater_than"}


def arity(function: str) -> int:
    """Number of program inputs consumed by ``function``."""
    if function == "scene":
        return 0
    if "equal" in function or function in _BINARY_EXACT:
        return 2
    return 1


def function_token(entry: Dict[str, Any]) -> str:
    """Serialize a node dict to its fused token text: ``filter_size[large]``."""
    values = entry.get("value_inputs") or []
    if values:
        return "%s[%s]" % (entry["function"], ",".join(values))
    return entry["function"]


def parse_function_token(token: str) -> Dict[str, Any]:
    """Inverse of :func:`function_token`."""
    if "[" not in token:
        return {"function": token, "value_inputs": []}
    name, _, value_text = token.partition("[")
    value_text = value_text.replace("]", "")
    return {"function": name, "value_inputs": value_text.split(",")}


def is_chain(program_list: Sequence[Dict[str, Any]]) -> bool:
    """True iff the program is a pure chain (every node used, all arity<=1).

    Mirrors reference ``is_chain`` (utils_programs.py:15-27): walk from the
    root following single inputs; any two-input node makes it non-chain, and
    every node must be visited.
    """
    if not program_list:
        return False
    visited = [False] * len(program_list)
    cur = len(program_list) - 1
    while True:
        visited[cur] = True
        inputs = program_list[cur]["inputs"]
        if len(inputs) == 0:
            break
        if len(inputs) > 1:
            return False
        cur = inputs[0]
    return all(visited)


def list_to_tree(program_list: Sequence[Dict[str, Any]]) -> Node:
    """Build the explicit tree rooted at the last list entry."""

    def build(idx: int) -> Node:
        entry = program_list[idx]
        return Node(
            function=entry["function"],
            value_inputs=list(entry["value_inputs"]),
            children=[build(i) for i in entry["inputs"]],
        )

    return build(len(program_list) - 1)


def tree_to_list(root: Node) -> List[Dict[str, Any]]:
    """Inverse of :func:`list_to_tree`.

    Produces the same index assignment as the reference ``tree_to_list``
    (utils_programs.py:79-97): the root gets the final slot and children are
    laid out right-to-left in a reverse pre-order so that inputs always point
    to smaller indices.
    """

    def count(node: Node) -> int:
        return 1 + sum(count(c) for c in node.children)

    total = count(root)
    out: List[Dict[str, Any]] = [None] * total  # type: ignore[list-item]

    def place(node: Node, idx: int) -> int:
        out[idx] = {
            "function": node.function,
            "value_inputs": list(node.value_inputs),
            "inputs": [],
        }
        next_idx = idx - 1
        for child in reversed(node.children):
            out[idx]["inputs"].insert(0, next_idx)
            next_idx = place(child, next_idx)
        return next_idx

    place(root, total - 1)
    return out


def _prefix_of(node: Node, out: List[Dict[str, Any]]) -> None:
    out.append(node.to_flat())
    for child in node.children:
        _prefix_of(child, out)


def _postfix_of(node: Node, out: List[Dict[str, Any]]) -> None:
    for child in node.children:
        _postfix_of(child, out)
    out.append(node.to_flat())


def list_to_prefix(program_list: Sequence[Dict[str, Any]]) -> List[Dict[str, Any]]:
    out: List[Dict[str, Any]] = []
    _prefix_of(list_to_tree(program_list), out)
    return out


def list_to_postfix(program_list: Sequence[Dict[str, Any]]) -> List[Dict[str, Any]]:
    out: List[Dict[str, Any]] = []
    _postfix_of(list_to_tree(program_list), out)
    return out


def prefix_to_list(program_prefix: Sequence[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Parse a prefix serialization back to list form using arity lookup."""
    items = list(program_prefix)
    pos = 0

    def parse() -> Node:
        nonlocal pos
        entry = items[pos]
        pos += 1
        node = Node(entry["function"], list(entry["value_inputs"]))
        node.children = [parse() for _ in range(arity(entry["function"]))]
        return node

    return tree_to_list(parse())


def postfix_to_list(program_postfix: Sequence[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Parse a postfix serialization back to list form using arity lookup.

    Children are popped right-to-left then reversed, matching the reference
    ``postfix_to_tree`` (utils_programs.py:120-129).
    """
    items = list(program_postfix)

    def parse() -> Node:
        entry = items.pop()
        node = Node(entry["function"], list(entry["value_inputs"]))
        node.children = [parse() for _ in range(arity(entry["function"]))][::-1]
        return node

    return tree_to_list(parse())


def program_tokens(program_list: Sequence[Dict[str, Any]], mode: str = "postfix") -> List[str]:
    """Fused-token serialization of a program in the given linearization mode.

    ``mode``: 'chain' (None-equivalent -> raises), 'prefix', 'postfix', or
    'list' (raw order).  Returns the token list (no specials).
    """
    if mode == "chain":
        if not is_chain(program_list):
            raise ValueError("program is not a chain")
        entries: Sequence[Dict[str, Any]] = program_list
    elif mode == "prefix":
        entries = list_to_prefix(program_list)
    elif mode == "postfix":
        entries = list_to_postfix(program_list)
    elif mode == "list":
        entries = program_list
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return [function_token(e) for e in entries]


def program_to_str(program_list: Sequence[Dict[str, Any]], mode: str = "postfix") -> str:
    """Space-joined fused-token program string (reference program_to_str,
    preprocess_questions.py:39-50)."""
    return " ".join(program_tokens(program_list, mode))
