"""Multi-host (multi-process) execution entry points.

The reference is single-machine only (SURVEY.md §5.8); this extends the
framework's mesh design across hosts connected by DCN: each process owns a
slice of the global device set, ``jax.distributed.initialize`` wires the
coordination service, and the SAME sharded-jit programs run unchanged — the
mesh simply spans all processes' devices and XLA routes collectives over
ICI within a slice and DCN across slices.

Data flow: every host computes the identical global batch permutation
(seeded identically), gathers only its own contiguous row slice
(`host_batch_slice`), and assembles global ``jax.Array``s from the local
shards with ``jax.make_array_from_process_local_data`` (`global_batch`).
With ``process_count == 1`` every path degenerates exactly to the
single-host behavior (dryrun-tested in tests/test_multihost.py).
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize",
    "is_multihost",
    "host_batch_slice",
    "global_batch",
    "make_global_mesh",
]

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host cluster (wraps ``jax.distributed.initialize``).

    Call BEFORE any other jax API touches the backend.  With no arguments,
    jax auto-detects the cluster environment (TPU pod metadata / SLURM /
    Open MPI); pass explicit values otherwise.  ``num_processes=1`` is the
    valid degenerate dryrun: a one-process "cluster" whose behavior must
    match (and is tested against) plain single-host execution.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_multihost() -> bool:
    return jax.process_count() > 1


def host_batch_slice(
    global_batch_size: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """This host's contiguous row slice of every global batch.

    Global row layout is process-major (host p owns rows
    ``[p*per_host, (p+1)*per_host)``), matching `make_global_mesh`'s
    process-major data-axis device order so
    ``jax.make_array_from_process_local_data`` places each host's rows on
    its own devices without any cross-host transfer.  Pure host math —
    unit-tested for disjoint exact cover across hosts.
    """
    process_index = jax.process_index() if process_index is None else process_index
    process_count = jax.process_count() if process_count is None else process_count
    if global_batch_size % process_count:
        raise ValueError(
            f"global batch size {global_batch_size} must divide across "
            f"{process_count} processes"
        )
    per_host = global_batch_size // process_count
    return slice(process_index * per_host, (process_index + 1) * per_host)


def make_global_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = ("data",),
) -> Mesh:
    """Mesh over ALL processes' devices in process-major enumeration order.

    ``jax.devices()`` enumerates process-major, so a 1-D ``("data",)`` mesh
    puts each host's rows on its own chips: the data axis crosses DCN only
    at gradient-reduction time, never for batch placement.  (The
    single-host `make_mesh` topology reordering is intentionally skipped
    here — reordering the data axis across processes would break the
    contiguous `host_batch_slice` ↔ addressable-shard correspondence.)
    """
    import numpy as np

    devices = list(jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    total = int(np.prod(shape))
    grid = np.asarray(devices[:total]).reshape(shape)
    return Mesh(grid, tuple(axes))


def global_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Assemble global jax.Arrays from per-host local batch shards.

    Each leaf's leading dim is this host's `host_batch_slice` rows of the
    global batch; the returned arrays are global (leading dim =
    local * process_count), sharded over ``axis``.  Scalars replicate.
    Single-process, this equals ``device_put`` with the same shardings
    (parity-tested).
    """
    import jax.numpy as jnp

    batch_shard = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def put(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return jax.make_array_from_process_local_data(replicated, x)
        return jax.make_array_from_process_local_data(batch_shard, x)

    return jax.tree_util.tree_map(put, batch)
