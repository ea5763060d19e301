"""Host-side batching for array datasets.

The artifacts are padded fixed-shape arrays (questions h5, features h5,
flattened step records), so the input pipeline is plain NumPy: shuffle an
index permutation per epoch, gather, and feed sharded device batches.  Split
membership reproduces sklearn's ``train_test_split(random_state=seed)`` so
metrics are comparable with the reference runs
(train_transformer_iqap.py:436-439).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np

__all__ = ["train_val_test_split", "batches", "Subset"]


def train_val_test_split(
    n: int, test_fraction: float = 0.1, val_fraction: float = 0.1, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reproduce sklearn.model_selection.train_test_split semantics.

    sklearn shuffles with ``check_random_state(seed).permutation(n)`` and
    takes the *first* ``ceil(n*test_size)`` entries as the test split, then
    splits train/val the same way with a fresh RandomState(seed).  Verified
    against sklearn (tests/test_train.py::test_split_matches_sklearn).
    """

    def split(indices: np.ndarray, test_size: float, seed: int):
        n_test = int(np.ceil(len(indices) * test_size))
        perm = np.random.RandomState(seed).permutation(len(indices))
        test = indices[perm[:n_test]]
        train = indices[perm[n_test:]]
        return train, test

    indices = np.arange(n)
    train_val, test = split(indices, test_fraction, seed)
    val_size = val_fraction / (1.0 - test_fraction)
    train, val = split(train_val, val_size, seed)
    return train, val, test


class Subset:
    """View over a dict-of-arrays dataset through an index array."""

    def __init__(self, arrays: Dict[str, np.ndarray], indices: np.ndarray):
        self.arrays = arrays
        self.indices = np.asarray(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def gather(self, batch_indices: np.ndarray) -> Dict[str, np.ndarray]:
        idx = self.indices[batch_indices]
        return {k: v[idx] for k, v in self.arrays.items()}


def batches(
    data: Subset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = True,
    transform: Optional[Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]]] = None,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield dict batches; static batch shape (drop_last) keeps one XLA
    compilation alive for the whole run.

    Multi-host (SURVEY.md §5.8 DCN extension): ``batch_size`` is GLOBAL.
    Every host computes the identical permutation (same seed/epoch) and
    gathers only its own contiguous ``parallel.multihost.host_batch_slice``
    rows of each global batch — the h5/array reads themselves are per-host,
    so input bandwidth scales with hosts.  ``process_count=1`` is exactly
    the single-host behavior.
    """
    n = len(data)
    order = (
        np.random.RandomState(seed + epoch).permutation(n) if shuffle else np.arange(n)
    )
    if process_count > 1 and not drop_last:
        # a partial final batch would slice with the full-batch host plan,
        # giving hosts divergent shard shapes (host 0 gets the remainder,
        # later hosts none) and stalling the global-array assembly
        raise ValueError("multi-host batches() requires drop_last=True")
    if process_count > 1:
        from explainable_spatial_vqa_tpu.parallel.multihost import host_batch_slice

        local = host_batch_slice(batch_size, process_index, process_count)
    else:
        local = slice(None)
    limit = n - (n % batch_size) if drop_last else n
    for start in range(0, limit, batch_size):
        batch = data.gather(order[start : start + batch_size][local])
        if transform is not None:
            batch = transform(batch)
        yield batch
