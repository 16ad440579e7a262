"""Tile batching: host-side pipeline feeding the GAN trainer.

The reference's tile path (reference ``read_data.py:157-371``) is a torch
Dataset over per-slide LMDB databases with per-item open/decompress/unpickle
at batch size 8 — CPU-bound and latency-serialized. The TPU build splits this
into:

* a **store** layer (``data/store.py`` — LMDB/LZ4-compatible native reader)
  that materializes a slide's sampled tiles as contiguous arrays at
  dataset-build time (the reference also samples keys at build time,
  ``read_data.py:205-207``, keeping shapes static);
* this module: epoch batching over in-memory arrays with wrap-padding to the
  mesh data-axis multiple, and the float conversion the reference does with
  torchvision transforms (ConvertImageDtype + Normalize(0.5, 0.5) ->
  [-1, 1], ``histopathology_gan.py:106-109``);
* a threaded prefetcher so host decode overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def tiles_to_float(images: np.ndarray) -> np.ndarray:
    """uint8 NHWC [0,255] -> float32 [-1,1]."""
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    return (np.asarray(images, np.float32) - 0.5) / 0.5


class TileBatches:
    """Epoch batch iterator over tiles (+ optional per-tile RNA vectors and
    labels) — the PatchDataset / PatchRNADataset equivalent at the batch level
    (reference ``read_data.py:157-371``)."""

    def __init__(
        self,
        images: np.ndarray,
        rna: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        *,
        batch_size: int = 8,
        shuffle: bool = True,
        seed: int = 0,
        pad_to: int = 1,
        drop_remainder: bool = False,
    ):
        self.images = images
        self.rna = rna
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.pad_to = pad_to
        self.drop_remainder = drop_remainder

    def __len__(self):
        n = len(self.images)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        from rnagan_tpu.data.batching import batch_indices

        for idx, _ in batch_indices(
            len(self.images), self.batch_size, shuffle=self.shuffle, seed=self.seed,
            epoch=epoch, pad_to=self.pad_to, drop_remainder=self.drop_remainder,
        ):
            batch = {"image": tiles_to_float(self.images[idx])}
            if self.rna is not None:
                batch["rna_data"] = np.asarray(self.rna[idx], np.float32)
            if self.labels is not None:
                batch["labels"] = np.asarray(self.labels[idx], np.int32)
            yield batch


class Prefetcher:
    """Threaded prefetch: decouples host-side batch assembly from the device
    step (the reference leans on 4 DataLoader workers for this,
    ``histopathology_gan.py:164-168``).

    ``transfer``, when given, is applied to each item inside the worker
    thread — pass ``jax.device_put`` (or ``parallel.mesh.shard_batch``) so the
    host->device transfer of batch N+1 overlaps the device compute of batch N
    instead of serializing inside the consumer's dispatch. On tunneled/remote
    TPU backends the transfer RPC can exceed the step time itself, so this
    overlap is the difference between transfer+compute and
    max(transfer, compute) per step."""

    def __init__(self, iterator: Iterator, depth: int = 2, transfer=None):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err: Optional[BaseException] = None

        def run():
            try:
                for item in iterator:
                    if transfer is not None:
                        item = transfer(item)
                    self._q.put(item)
            except BaseException as e:  # surfaced on next()
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
