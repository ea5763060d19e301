"""Parameter sharding rules for model-parallel layouts.

The thesis-scale models (<50M params) fit comfortably replicated, so pure DP
is the production layout; this module provides the tensor-parallel option for
larger configs: regex rules map parameter paths to PartitionSpecs (Megatron
convention — alternate Dense kernels column/row-sharded over the ``model``
axis so activations stay sharded between the pair and XLA inserts a single
psum per block).
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_params_by_rules", "EXECUTOR_TP_RULES", "param_path_strings"]

# Megatron-style pairing for the fusion encoder's FFN and attention blocks:
# first projection column-sharded (outputs split), second row-sharded
# (inputs split, psum on exit).
EXECUTOR_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*FeedForward.*Dense_0.*kernel", P(None, "model")),
    (r".*FeedForward.*Dense_1.*kernel", P("model", None)),
    (r".*ffn.*Dense_0.*kernel", P(None, "model")),
    (r".*ffn.*Dense_1.*kernel", P("model", None)),
    (r".*attn.*(q|k|v)/kernel", P(None, "model", None)),
    (r".*attn.*out/kernel", P("model", None, None)),
    (r".*text_embed.*embedding", P("model", None)),
)


def param_path_strings(params: Any) -> Sequence[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return ["/".join(str(k.key) for k in path) for path, _ in flat]


def shard_params_by_rules(
    params: Any, mesh: Mesh, rules: Sequence[Tuple[str, P]] = EXECUTOR_TP_RULES
) -> Any:
    """device_put each param with the first matching rule's spec (replicated
    otherwise).  Rules whose spec rank mismatches the leaf rank fall back to
    replication rather than erroring."""
    compiled = [(re.compile(pattern), spec) for pattern, spec in rules]

    def place(path, leaf):
        path_str = "/".join(str(k.key) for k in path)
        for pattern, spec in compiled:
            if pattern.match(path_str):
                if len(spec) <= leaf.ndim:
                    # verify divisibility on sharded axes
                    ok = True
                    for axis, name in enumerate(spec):
                        if name is None:
                            continue
                        size = mesh.shape[name] if isinstance(name, str) else 1
                        if leaf.shape[axis] % size != 0:
                            ok = False
                            break
                    if ok:
                        return jax.device_put(leaf, NamedSharding(mesh, spec))
                break
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
