"""Explicit random-key discipline.

The reference relies on PyTorch's implicit global RNG, and its ``--seed`` flags
are dead in both main training scripts (seeding commented out at reference
``betaVAE_training.py:34-35``, ``histopathology_gan.py:74-75``). The TPU build
makes randomness explicit and reproducible: one root key per run, folded into
named per-purpose streams, folded again by step index inside jitted code.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import jax
import jax.numpy as jnp


def _name_to_int(name: str) -> int:
    """Stable 31-bit integer from a stream name."""
    digest = hashlib.sha256(name.encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "little") & 0x7FFFFFFF


class KeyStream:
    """A named, forkable stream of PRNG keys.

    >>> ks = KeyStream(seed=99)
    >>> k1 = ks.fold("dropout", step=10)     # pure: same args -> same key
    >>> sub = ks.child("generator")          # independent named substream
    >>> k2 = next(sub)                       # stateful convenience iterator
    """

    def __init__(self, seed: int = 0, *, key: jax.Array | None = None):
        self._key = jax.random.key(seed) if key is None else key
        self._counter = 0

    @property
    def key(self) -> jax.Array:
        return self._key

    def fold(self, name: str, step: int = 0) -> jax.Array:
        """Pure derivation: key for (stream name, step)."""
        k = jax.random.fold_in(self._key, _name_to_int(name))
        return jax.random.fold_in(k, step)

    def child(self, name: str) -> "KeyStream":
        return KeyStream(key=jax.random.fold_in(self._key, _name_to_int(name)))

    def __next__(self) -> jax.Array:
        k = jax.random.fold_in(self._key, self._counter)
        self._counter += 1
        return k

    def __iter__(self) -> Iterator[jax.Array]:
        return self

    def take(self, n: int) -> jax.Array:
        """n stacked keys (for vmapped consumers)."""
        ks = [next(self) for _ in range(n)]
        return jnp.stack(ks)


def step_key(base: jax.Array, step: jax.Array | int, lane: int = 0) -> jax.Array:
    """Fold a (traced) step counter and lane index into a base key.

    Safe to call inside jit: ``fold_in`` accepts traced integers.
    """
    k = jax.random.fold_in(base, step)
    if lane:
        k = jax.random.fold_in(k, lane)
    return k
