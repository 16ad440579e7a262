"""Multimodal fusion training (reference ``src/main.py`` — inoperative there:
imports missing ``model``/``wsi_model``/``ssl_training`` modules,
``main.py:14-17``; SURVEY.md 2.5).

Implements the declared pipeline: bags of tiles per slide + the patient's
RNA profile -> frozen-except-top-stages ResNet backbone + RNAEncoder ->
FusionModel classifier, cross-entropy (``main.py:84-96,136-164``). The
freeze-except-layer3/4 policy (``main.py:136-143``) maps to a masked optax
update (zero updates for frozen parameter subtrees).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct, traverse_util

from rnagan_tpu.core.config import MeshConfig
from rnagan_tpu.core.metrics import MetricsLogger
from rnagan_tpu.core.rng import KeyStream, step_key
from rnagan_tpu.data.patches import BagData
from rnagan_tpu.data.tiles import tiles_to_float
from rnagan_tpu.models.fusion import FusionModel
from rnagan_tpu.models.resnet import ResNet, resnet50
from rnagan_tpu.parallel.mesh import make_mesh, replicated, shard_batch


@dataclass(frozen=True)
class FusionConfig:
    num_classes: int = 2
    lr: float = 3e-4
    weight_decay: float = 0.0
    num_epochs: int = 10
    batch_size: int = 4
    bag_size: int = 40
    rna_hidden_dims: Tuple[int, ...] = (6000, 4000, 2048)
    #: freeze every backbone stage except layer3/layer4 (+ heads), main.py:136-143
    freeze_backbone_early: bool = True
    seed: int = 99
    mesh: MeshConfig = field(default_factory=MeshConfig)


class FusionTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def _trainable_mask(params, freeze_early: bool):
    """True where trainable. Frozen: backbone conv1/bn1/layer1/layer2 when
    freeze_early (the reference's requires_grad policy, main.py:136-143)."""
    if not freeze_early:
        return jax.tree_util.tree_map(lambda _: True, params)
    flat = traverse_util.flatten_dict(params)
    frozen_prefixes = ("conv1", "bn1", "layer1_", "layer2_")

    def trainable(path):
        # only the top-level stage name decides (inner conv1/bn1 layer names
        # must not match the stage prefixes)
        return not str(path[0]).startswith(frozen_prefixes)

    return traverse_util.unflatten_dict({k: trainable(k) for k in flat})


class FusionTrainer:
    def __init__(self, cfg: FusionConfig, *, backbone: Optional[ResNet] = None,
                 mesh=None, logger: Optional[MetricsLogger] = None):
        self.cfg = cfg
        self.model = FusionModel(
            backbone or resnet50(num_classes=cfg.num_classes),
            rna_hidden_dims=cfg.rna_hidden_dims,
            num_classes=cfg.num_classes,
        )
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.logger = logger or MetricsLogger()
        self.keys = KeyStream(cfg.seed)
        self._base_key = self.keys.fold("fusion")
        self._tx = None  # built at init_state (needs the param mask)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    def _build_tx(self, params) -> None:
        mask = {"backbone": _trainable_mask(params["backbone"], self.cfg.freeze_backbone_early)}
        for k in params:
            if k != "backbone":
                mask[k] = jax.tree_util.tree_map(lambda _: True, params[k])
        labels = jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask)
        # multi_transform (not optax.masked — which leaves unmasked updates
        # pass through as raw gradients) so frozen subtrees get zero updates
        self._tx = optax.multi_transform(
            {"train": optax.adamw(self.cfg.lr, weight_decay=self.cfg.weight_decay),
             "freeze": optax.set_to_zero()},
            labels,
        )

    def init_state(self, bag_shape: Tuple[int, int, int, int], rna_features: int) -> FusionTrainState:
        bags = jnp.zeros((1,) + tuple(bag_shape), jnp.float32)
        rna = jnp.zeros((1, rna_features), jnp.float32)
        variables = self.model.init(
            {"params": self.keys.fold("init"), "dropout": self.keys.fold("drop")}, bags, rna, train=False
        )
        params = variables["params"]
        self._build_tx(params)
        state = FusionTrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self._tx.init(params),
        )
        return jax.device_put(state, replicated(self.mesh))

    def _train_step_impl(self, state, bags, rna, labels, mask):
        key = step_key(self._base_key, state.step)

        def loss_fn(params):
            logits, upd = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                bags, rna, train=True, mutable=["batch_stats"], rngs={"dropout": key},
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            loss = jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            acc = jnp.sum((jnp.argmax(logits, 1) == labels) * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            return loss, (acc, upd["batch_stats"])

        (loss, (acc, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self._tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            FusionTrainState(step=state.step + 1, params=params, batch_stats=stats, opt_state=opt_state),
            {"loss": loss, "acc": acc},
        )

    def _eval_step_impl(self, state, bags, rna):
        logits = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, bags, rna, train=False
        )
        return jnp.argmax(logits, axis=1)

    def fit(self, bags: BagData, *, num_epochs: Optional[int] = None,
            state: Optional[FusionTrainState] = None) -> Tuple[FusionTrainState, Dict[str, Any]]:
        assert bags.rna is not None, "fusion training needs per-slide RNA"
        cfg = self.cfg
        if state is None:
            state = self.init_state(bags.bags.shape[1:], bags.rna.shape[1])
        elif self._tx is None:
            # resuming on a fresh trainer instance: build the (param-mask)
            # optimizer from the restored params
            self._build_tx(state.params)
        from rnagan_tpu.data.batching import batch_indices

        n_dev = self.mesh.devices.size
        history = []
        n = len(bags)
        for epoch in range(num_epochs or cfg.num_epochs):
            sums, count = {"loss": 0.0, "acc": 0.0}, 0
            pending = []  # metrics stay on device; drained in chunks
            for idx, m in batch_indices(n, cfg.batch_size, shuffle=True, seed=cfg.seed,
                                        epoch=epoch, pad_to=n_dev):
                batch = shard_batch(
                    {
                        "bags": tiles_to_float(bags.bags[idx]) * 0.5 + 0.5,  # [0,1] for imagenet-style nets
                        "rna": bags.rna[bags.slide_idx[idx]],
                        "y": bags.labels[idx].astype(np.int32),
                        "m": m,
                    },
                    self.mesh,
                )
                state, metrics = self._train_step(state, batch["bags"], batch["rna"], batch["y"], batch["m"])
                pending.append(metrics)
                count += 1
                if len(pending) >= 512:
                    for fetched in jax.device_get(pending):
                        for k in sums:
                            sums[k] += float(fetched[k])
                    pending.clear()
            for fetched in jax.device_get(pending):
                for k in sums:
                    sums[k] += float(fetched[k])
            history.append({k: v / max(count, 1) for k, v in sums.items()})
            self.logger.scalars("fusion", history[-1], epoch)
        return state, {"history": history}

    def predict(self, bags: BagData, state: FusionTrainState) -> np.ndarray:
        from rnagan_tpu.data.batching import batch_indices

        preds = []
        n_dev = self.mesh.devices.size
        for idx, m in batch_indices(len(bags), self.cfg.batch_size, pad_to=n_dev):
            batch = shard_batch(
                {"bags": tiles_to_float(bags.bags[idx]) * 0.5 + 0.5,
                 "rna": bags.rna[bags.slide_idx[idx]]},
                self.mesh,
            )
            p = np.asarray(self._eval_step(state, batch["bags"], batch["rna"]))
            preds.append(p[np.asarray(m) > 0])
        return np.concatenate(preds) if preds else np.zeros(0, np.int64)
