"""Mesh construction and sharding rules.

The reference has no distributed execution of any kind (SURVEY.md §2); this
is the framework's own scaling layer.  The models here are small (<100M
params) while the scaling axis is throughput, so the primary layout is pure
data parallelism over a 1-D ``("data",)`` mesh riding ICI: parameters
replicated, batches sharded, gradient reduction emitted by XLA as ``psum``
from the sharded-jit partitioning.  A second ``("data", "model")`` shape is
supported for sharding the large IQAP image-flatten matmul and embedding
tables when configured.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "pad_to_multiple"]


def make_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; a single -1 dimension absorbs all remaining devices."""
    explicit_devices = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    total = int(np.prod(shape))
    if not explicit_devices and total == len(devices) and len(devices) > 1:
        # Topology-aware layout: mesh_utils orders devices so that the
        # innermost mesh axes map to physically adjacent chips (ICI
        # neighbors on the TPU torus), keeping the "model" axis — whose
        # collectives are latency-bound — on the shortest links.  Fall back
        # to enumeration order when the backend exposes no topology (CPU).
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh(tuple(shape), devices=devices)
            return Mesh(grid, tuple(axes))
        except Exception as exc:  # pragma: no cover - backend dependent
            import logging

            logging.getLogger(__name__).debug(
                "mesh_utils.create_device_mesh(%s) failed (%s); falling back "
                "to enumeration-order layout", tuple(shape), exc,
            )
    grid = np.asarray(devices[:total]).reshape(shape)
    return Mesh(grid, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(array: Any, multiple: int, axis: int = 0):
    """Pad ``array`` along ``axis`` so its size divides ``multiple``; returns
    (padded, original_size).  Used to keep batch shapes static across the
    final partial batch of an epoch/eval sweep."""
    size = array.shape[axis]
    remainder = size % multiple
    if remainder == 0:
        return array, size
    pad = multiple - remainder
    widths = [(0, 0)] * array.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(array), widths), size


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put every array in a pytree with its batch dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
