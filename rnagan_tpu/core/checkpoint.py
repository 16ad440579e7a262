"""Checkpointing.

Reference formats (SURVEY.md section 5.4): ``torch.save(state_dict)`` for the
VAE/classifier (``model_dict_best.pt`` / ``model_last.pt``, reference
``betaVAE.py:270-275``) and torchgan ``.model`` bundles (G+D+optimizers+step)
for GANs (``histopathology_gan.py:298-302``).

This module stores arbitrary JAX pytrees as msgpack with a JSON metadata
sidecar, and — fixing a reference gap — always bundles the RNA normalization
scaler with model state (the reference re-fits the scaler from re-split CSVs in
every script, making outputs split-dependent; ``betaVAE_sample.py:66-96``).

Torch ``.pt`` interop shims live next to each model (e.g.
``models/betavae.py``) so reference checkpoints can be imported.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    # flax msgpack handles numeric ndarrays only; encode strings as uint8
    def conv(x):
        if isinstance(x, (str, bytes)):
            raw = x.encode("utf-8") if isinstance(x, str) else x
            return np.frombuffer(b"\xffSTR" + raw, dtype=np.uint8).copy()
        return np.asarray(x)

    return jax.tree_util.tree_map(conv, tree)


def _from_numpy(tree):
    def conv(x):
        arr = np.asarray(x)
        if arr.dtype == np.uint8 and arr.ndim == 1 and arr.size >= 4 and bytes(arr[:4]) == b"\xffSTR":
            return bytes(arr[4:]).decode("utf-8")
        return x

    return jax.tree_util.tree_map(conv, tree)


def save_pytree(path: str, tree: Any) -> None:
    """Serialize one pytree to ``path`` as msgpack. ``to_state_dict`` first so
    namedtuple structures (e.g. optax optimizer states) become plain dicts."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.msgpack_serialize(_to_numpy(serialization.to_state_dict(tree)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_pytree(path: str, target: Any = None) -> Any:
    with open(path, "rb") as f:
        restored = _from_numpy(serialization.msgpack_restore(f.read()))
    if target is not None:
        return serialization.from_state_dict(target, restored)
    return restored


def save_bundle(path: str, trees: Dict[str, Any], metadata: Optional[Dict[str, Any]] = None) -> None:
    """Save a named bundle (e.g. generator/discriminator/opt states/step) —
    the equivalent of torchgan's ``.model`` files."""
    payload = {"__meta__": json.dumps(metadata or {}), **trees}
    save_pytree(path, payload)


def load_bundle(path: str, targets: Optional[Dict[str, Any]] = None):
    """Returns ``(trees, metadata)``. If ``targets`` given, each named tree is
    restored onto the matching target structure."""
    raw = load_pytree(path)
    meta = json.loads(raw.pop("__meta__", "{}"))
    if targets is not None:
        out = {}
        for name, tree in raw.items():
            tgt = targets.get(name)
            out[name] = serialization.from_state_dict(tgt, tree) if tgt is not None else tree
        return out, meta
    return raw, meta


class AsyncSaver:
    """Background-thread checkpoint writer.

    ``device_get`` + serialization of a multi-GB GAN state over a slow
    host link would stall the training loop once per epoch; this fetches and
    writes on a worker thread while the next epoch trains. One in-flight save
    at a time — a newer request waits for the previous write to finish (so
    the newest state always wins and disk writes never interleave).
    """

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._thread = None
        self._error: Optional[BaseException] = None

    def save_bundle(self, path: str, trees: Dict[str, Any], metadata: Optional[Dict[str, Any]] = None) -> None:
        import threading

        import jax.numpy as jnp

        self.wait()
        # Snapshot device arrays on the caller thread BEFORE the next train
        # step can donate (and thereby delete) their buffers. jnp.copy is an
        # async device-side dispatch, so this doesn't block on the device;
        # the worker then fetches the copies at leisure.
        snapshot = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, trees
        )

        def work():
            try:
                with self._lock:
                    save_bundle(path, snapshot, metadata)
            except BaseException as e:  # re-raised on the caller side
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


class BestKeeper:
    """Track best-on-validation checkpoints, mirroring the reference's
    best/last pattern (``model_dict_best.pt`` + ``model_last.pt``,
    reference ``betaVAE.py:270-275``)."""

    def __init__(self, save_dir: str, best_name: str = "model_best.ckpt", last_name: str = "model_last.ckpt"):
        self.save_dir = save_dir
        self.best_path = os.path.join(save_dir, best_name)
        self.last_path = os.path.join(save_dir, last_name)
        self.best_loss = float("inf")
        self.best_epoch = -1
        os.makedirs(save_dir, exist_ok=True)

    def update(self, epoch: int, val_loss: float, trees: Dict[str, Any], metadata: Optional[Dict[str, Any]] = None) -> bool:
        improved = val_loss < self.best_loss
        if improved:
            self.best_loss = val_loss
            self.best_epoch = epoch
            save_bundle(self.best_path, trees, {**(metadata or {}), "epoch": epoch, "val_loss": val_loss})
        return improved

    def save_last(self, trees: Dict[str, Any], metadata: Optional[Dict[str, Any]] = None) -> None:
        save_bundle(self.last_path, trees, metadata or {})
