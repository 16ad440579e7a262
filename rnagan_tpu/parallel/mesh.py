"""Device mesh and sharding helpers.

The reference has no distributed layer at all — single CUDA device plus
optional intra-process ``nn.DataParallel`` (reference ``betaVAE_training.py:148-150``,
SURVEY.md section 2.4). This module is the TPU framework's replacement: a named
``jax.sharding.Mesh`` over ICI with a data axis (batch sharding) and a reserved
model axis. Training steps are jitted with ``NamedSharding`` annotations on
their inputs; XLA emits the collectives (gradient all-reduce arises from the
sharded batch, global-batch statistics from ordinary ``jnp.mean`` over sharded
arrays) — no hand-written communication backend.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rnagan_tpu.core.config import MeshConfig


def init_distributed(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` (auto-detected on
    TPU pods when called with no arguments). After this, ``jax.devices()``
    spans the slice and :func:`make_mesh` lays the data axis over ICI.
    The reference has no multi-host story at all (SURVEY.md section 2.4)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. ``cfg.data == -1`` uses every visible device
    on the data axis (model axis size 1)."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    data = cfg.data if cfg.data > 0 else max(1, n // max(1, cfg.model))
    model = cfg.model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis; everything else
    replicated."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m) if m > 1 else n


def shard_dense_params(params: Any, mesh: Mesh) -> Any:
    """Tensor-parallel placement for MLP models: every Dense ``kernel`` whose
    output dim divides the model-axis size is sharded column-wise over the
    model axis (with its bias sharded to match); everything else replicated.

    Under jit this is pure data placement — XLA partitions the matmuls and
    inserts the collectives (column-parallel layers need none on the forward;
    the activations come out sharded and the next layer consumes them). The
    reference's largest layer (19198x6000) fits one chip, so this is an
    opt-in scaling axis rather than a necessity (SURVEY.md 2.4)."""
    model_axis = mesh.axis_names[1]
    model_size = mesh.shape[model_axis]

    def spec_for(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if model_size > 1 and hasattr(x, "ndim"):
            if name == "kernel" and x.ndim == 2 and x.shape[-1] % model_size == 0:
                return NamedSharding(mesh, P(None, model_axis))
            if name in ("bias", "scale", "mean", "var") and x.ndim == 1 and x.shape[0] % model_size == 0:
                return NamedSharding(mesh, P(model_axis))
        return NamedSharding(mesh, P())

    shardings = jax.tree_util.tree_map_with_path(spec_for, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch (pytree of arrays, leading dim = global batch)
    with the batch dim sharded over the data axis.

    The global batch size must divide evenly by the data-axis size; callers pad
    or drop remainders host-side so jitted shapes stay static (the reference
    keeps shapes static the same way — sampling at dataset-build time,
    ``read_data.py:205-207``).

    Multi-host: when this process only holds its local shard of the batch
    (``jax.process_count() > 1``), arrays are assembled with
    ``make_array_from_process_local_data`` so each host contributes its slice
    of the global batch.
    """
    multihost = jax.process_count() > 1

    def put(x):
        if isinstance(x, jax.Array) and not multihost:
            # already on device (e.g. transferred by a Prefetcher thread):
            # device_put with the target sharding is a no-op when it already
            # matches and an on-device reshard otherwise — never a host copy
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        arr = np.asarray(x)
        sharding = batch_sharding(mesh, arr.ndim)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(put, batch)
