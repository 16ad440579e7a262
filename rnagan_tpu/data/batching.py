"""Shared epoch-batch index generation.

Every loader in the package batches the same way: deterministic per-epoch
shuffle, slice into batches, wrap-pad the final short batch to a multiple of
the mesh data-axis size (static jitted shapes; padding rows are *real* rows so
BatchNorm statistics stay sane) and mark the duplicates in a validity mask.
This is that logic, once.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def batch_indices(
    n: int,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    pad_to: int = 1,
    drop_remainder: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield ``(indices, valid_mask)`` per batch over ``n`` items."""
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed + epoch).shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size and drop_remainder:
            return
        mask = np.ones(len(idx), np.float32)
        # every batch (not just the short tail) pads up to a pad_to multiple:
        # a batch_size smaller than / not divisible by the mesh data axis
        # would otherwise produce shards jax.device_put cannot split
        target = -(-max(len(idx), min(batch_size, n)) // pad_to) * pad_to
        if len(idx) < target:
            pad = target - len(idx)
            idx = np.concatenate([idx, order[np.arange(pad) % n]])
            mask = np.concatenate([mask, np.zeros(pad, np.float32)])
        yield idx, mask
