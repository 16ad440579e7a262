"""Downstream ML experiment: tile classification (TCGA-GBM vs TCGA-LUAD).

The reference experiment (``src/ml_experiments.py``) trains a ResNet50 tile
classifier under 5-fold stratified CV — AdamW lr 3e-5 / wd 0.01, CE loss, 40
epochs, flip augmentations + ImageNet normalization, best-on-val checkpoint,
accuracy + weighted F1 (``ml_experiments.py:282-362``) — comparing real vs
synthetic training tiles. That script cannot run as shipped (syntax error at
``:330-332``, missing imports ``:20``; SURVEY.md section 2.5); this module
implements the declared experiment:

* augmentation (random H/V flips) and ImageNet normalization happen inside
  the jitted train step on device;
* one donated jitted program per optimization step over the mesh data axis;
* the SimCLR-pretrained path (``ResnetSSL``, ``ml_experiments.py:286-293``)
  maps to loading ported backbone weights via
  ``models.resnet.params_from_torch_state_dict``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rnagan_tpu.core.config import MeshConfig
from rnagan_tpu.core.metrics import MetricsLogger
from rnagan_tpu.core.rng import KeyStream, step_key
from rnagan_tpu.models import resnet as resnet_zoo
from rnagan_tpu.models.resnet import ResNet, init_resnet
from rnagan_tpu.parallel.mesh import make_mesh, replicated, shard_batch

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class MLConfig:
    """Reference hyperparameters (``ml_experiments.py:299,342-345,282``)."""

    num_classes: int = 2
    lr: float = 3e-5
    weight_decay: float = 0.01
    num_epochs: int = 40
    batch_size: int = 64
    folds: int = 5
    image_size: int = 224
    seed: int = 99
    arch: str = "resnet50"
    mesh: MeshConfig = field(default_factory=MeshConfig)


class MLTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def stratified_folds(labels: np.ndarray, n_folds: int, seed: int) -> List[Tuple[np.ndarray, np.ndarray]]:
    """(train_idx, val_idx) per fold, class-stratified (the reference uses
    sklearn StratifiedKFold, ``ml_experiments.py:282``)."""
    rng = np.random.RandomState(seed)
    per_class = {}
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        rng.shuffle(idx)
        per_class[c] = np.array_split(idx, n_folds)
    folds = []
    for f in range(n_folds):
        val = np.concatenate([per_class[c][f] for c in per_class])
        train = np.concatenate([np.concatenate([per_class[c][g] for g in range(n_folds) if g != f]) for c in per_class])
        folds.append((np.sort(train), np.sort(val)))
    return folds


def weighted_f1(y_true: np.ndarray, y_pred: np.ndarray, num_classes: int) -> float:
    """Support-weighted F1 (the reference reports sklearn's weighted F1,
    ``ml_experiments.py:211-216``)."""
    total = len(y_true)
    score = 0.0
    for c in range(num_classes):
        tp = np.sum((y_pred == c) & (y_true == c))
        fp = np.sum((y_pred == c) & (y_true != c))
        fn = np.sum((y_pred != c) & (y_true == c))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        score += f1 * (np.sum(y_true == c) / total)
    return float(score)


class TileClassifierTrainer:
    def __init__(self, cfg: MLConfig, *, model: Optional[ResNet] = None, mesh=None,
                 logger: Optional[MetricsLogger] = None, backbone_variables=None):
        self.cfg = cfg
        # honor cfg.arch (resnet18|34|50|101|152) when no explicit model given
        self.model = model or getattr(resnet_zoo, cfg.arch)(num_classes=cfg.num_classes)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.logger = logger or MetricsLogger()
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        self.keys = KeyStream(cfg.seed)
        self._base_key = self.keys.fold("ml")
        self._backbone_variables = backbone_variables
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    def init_state(self) -> MLTrainState:
        variables = init_resnet(self.model, self.keys.fold("init"), self.cfg.image_size)
        if self._backbone_variables is not None:
            # pretrained path (ResnetSSL / torchvision weights): overlay ported
            # leaves onto the initialized tree
            def overlay(dst, src):
                for k, v in src.items():
                    if isinstance(v, dict) and k in dst:
                        overlay(dst[k], v)
                    else:
                        dst[k] = v
            variables = jax.tree_util.tree_map(np.asarray, variables)
            overlay(variables["params"], self._backbone_variables.get("params", {}))
            overlay(variables["batch_stats"], self._backbone_variables.get("batch_stats", {}))
        params = variables["params"]
        state = MLTrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(params),
        )
        return jax.device_put(state, replicated(self.mesh))

    # ------------------------------------------------------------- transforms
    @staticmethod
    def _normalize(x01: jax.Array) -> jax.Array:
        return (x01 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    @staticmethod
    def _augment(key, x01: jax.Array) -> jax.Array:
        """Per-sample random horizontal + vertical flips (reference
        ``ml_experiments.py:312-320``), branchless via where."""
        kh, kv = jax.random.split(key)
        flip_h = jax.random.bernoulli(kh, 0.5, (x01.shape[0], 1, 1, 1))
        flip_v = jax.random.bernoulli(kv, 0.5, (x01.shape[0], 1, 1, 1))
        x01 = jnp.where(flip_h, x01[:, :, ::-1, :], x01)
        x01 = jnp.where(flip_v, x01[:, ::-1, :, :], x01)
        return x01

    # ------------------------------------------------------------------ steps
    def _train_step_impl(self, state: MLTrainState, images01, labels, mask):
        key = step_key(self._base_key, state.step)
        x = self._normalize(self._augment(key, images01))

        def loss_fn(params):
            logits, upd = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            loss = jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            acc = jnp.sum((jnp.argmax(logits, 1) == labels) * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            return loss, (acc, upd["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            MLTrainState(step=state.step + 1, params=params, batch_stats=new_stats, opt_state=opt_state),
            {"loss": loss, "acc": acc},
        )

    def _eval_step_impl(self, state: MLTrainState, images01):
        logits = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            self._normalize(images01), train=False,
        )
        return jnp.argmax(logits, axis=1), jax.nn.log_softmax(logits.astype(jnp.float32))

    # ------------------------------------------------------------------ loops
    def _batches(self, n, epoch, shuffle):
        from rnagan_tpu.data.batching import batch_indices

        yield from batch_indices(
            n, self.cfg.batch_size, shuffle=shuffle, seed=self.cfg.seed, epoch=epoch,
            pad_to=self.mesh.shape[self.cfg.mesh.data_axis],
        )

    def fit(self, images01: np.ndarray, labels: np.ndarray,
            val_images01: np.ndarray, val_labels: np.ndarray,
            state: Optional[MLTrainState] = None) -> Tuple[MLTrainState, Dict[str, Any]]:
        """Train with best-on-val-accuracy keeping (reference
        ``ml_experiments.py:152-158``)."""
        state = state if state is not None else self.init_state()
        # best_state must never alias the (donated) input state: on a NaN val
        # metric no epoch would replace it and fit would return deleted arrays
        best_acc, best_state = -1.0, None
        history = []
        for epoch in range(self.cfg.num_epochs):
            sums, count, pending = {"loss": 0.0, "acc": 0.0}, 0, []
            for idx, mask in self._batches(len(images01), epoch, True):
                batch = shard_batch(
                    {"x": images01[idx], "y": labels[idx].astype(np.int32), "m": mask}, self.mesh
                )
                state, metrics = self._train_step(state, batch["x"], batch["y"], batch["m"])
                pending.append(metrics)
                count += 1
                if len(pending) >= 512:
                    for m in jax.device_get(pending):
                        for k in sums:
                            sums[k] += float(m[k])
                    pending.clear()
            for m in jax.device_get(pending):
                for k in sums:
                    sums[k] += float(m[k])
            train_means = {k: v / max(count, 1) for k, v in sums.items()}
            val_pred = self.predict(val_images01, state)
            val_acc = float(np.mean(val_pred == val_labels))
            history.append({**train_means, "val_acc": val_acc})
            self.logger.scalars("ml", history[-1], epoch)
            if val_acc > best_acc:
                best_acc = val_acc
                best_state = jax.tree_util.tree_map(jnp.copy, state)
        if best_state is None:
            best_state = state  # degenerate val metrics: final state is live
        return best_state, {"history": history, "best_val_acc": best_acc}

    # ------------------------------------------------- TPU-resident variants
    def fit_resident(self, images_u8, labels, val_images_u8, val_labels,
                     state: Optional[MLTrainState] = None,
                     verbose: bool = False) -> Tuple[MLTrainState, Dict[str, Any]]:
        """Train with the ENTIRE uint8 tile set resident in device HBM: each
        epoch is one scanned jitted program (shuffled full pass via an
        on-device permutation, remainder dropped for static shapes), and the
        only per-epoch host traffic is a 2-float metrics fetch + the val
        accuracy. The host-feed :meth:`fit` moves a float32 batch over the
        host link every step — at reference scale (5k tiles x 224^2, 40
        epochs x 5 folds, ``ml_experiments.py:282-345``) that is the
        bottleneck, not the ResNet. 5k tiles x 224^2 uint8 is ~750 MB: HBM-
        resident easily."""
        from functools import partial

        cfg = self.cfg
        batch = cfg.batch_size
        images_dev = jnp.asarray(images_u8)
        labels_dev = jnp.asarray(labels, jnp.int32)
        n = images_dev.shape[0]
        n_steps = max(n // batch, 1)
        state = state if state is not None else self.init_state()

        @partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
        def run_epoch(st, key, images, labs, steps):
            perm = jax.random.permutation(key, images.shape[0])
            perm = perm[: steps * batch].reshape(steps, batch)
            ones = jnp.ones((batch,), jnp.float32)

            def body(s, idx):
                x01 = images[idx].astype(jnp.float32) / 255.0
                s, m = self._train_step_impl(s, x01, labs[idx], ones)
                return s, jnp.stack([m["loss"].astype(jnp.float32),
                                     m["acc"].astype(jnp.float32)])

            st, ms = jax.lax.scan(body, st, perm)
            return st, jnp.mean(ms, axis=0)

        @jax.jit
        def snapshot(st):
            return jax.tree_util.tree_map(jnp.copy, st)

        val_dev = jnp.asarray(val_images_u8)
        best_acc, best_state, history = -1.0, None, []
        for epoch in range(cfg.num_epochs):
            key = jax.random.fold_in(self._base_key, 10_000 + epoch)
            state, ms = run_epoch(state, key, images_dev, labels_dev, n_steps)
            val_pred = self.predict_resident(val_dev, state)
            val_acc = float(np.mean(val_pred == val_labels))
            ms = np.asarray(ms)
            history.append({"loss": float(ms[0]), "acc": float(ms[1]), "val_acc": val_acc})
            self.logger.scalars("ml", history[-1], epoch)
            if verbose:
                print(f"  [ml epoch {epoch}] loss={ms[0]:.4f} acc={ms[1]:.4f} "
                      f"val_acc={val_acc:.4f}", flush=True)
            if val_acc > best_acc:
                best_acc, best_state = val_acc, snapshot(state)
        if best_state is None:
            best_state = state
        return best_state, {"history": history, "best_val_acc": best_acc}

    def predict_resident(self, images_u8, state: MLTrainState) -> np.ndarray:
        """Batched on-device prediction over a resident uint8 set (index
        clamping pads the tail batch; excess rows dropped on host)."""
        from functools import partial

        batch = self.cfg.batch_size
        images_dev = images_u8 if isinstance(images_u8, jax.Array) else jnp.asarray(images_u8)
        n = int(images_dev.shape[0])
        n_steps = -(-n // batch)

        @partial(jax.jit, static_argnums=(2,))
        def run(st, images, steps):
            idxs = jnp.minimum(jnp.arange(steps * batch), images.shape[0] - 1)

            def body(_, idx):
                x01 = images[idx].astype(jnp.float32) / 255.0
                pred, _ = self._eval_step_impl(st, x01)
                return None, pred

            _, preds = jax.lax.scan(body, None, idxs.reshape(steps, batch))
            return preds.reshape(-1)

        return np.asarray(run(state, images_dev, n_steps))[:n]

    def predict(self, images01: np.ndarray, state: MLTrainState) -> np.ndarray:
        preds = []
        for idx, mask in self._batches(len(images01), 0, False):
            batch = shard_batch({"x": images01[idx]}, self.mesh)
            p, _ = self._eval_step(state, batch["x"])
            preds.append(np.asarray(p)[mask > 0])
        return np.concatenate(preds) if preds else np.zeros(0, np.int64)

    def evaluate(self, images01: np.ndarray, labels: np.ndarray, state: MLTrainState) -> Dict[str, float]:
        pred = self.predict(images01, state)
        return {
            "accuracy": float(np.mean(pred == labels)),
            "weighted_f1": weighted_f1(labels, pred, self.cfg.num_classes),
        }


def run_cv_experiment(
    images01: np.ndarray,
    labels: np.ndarray,
    cfg: Optional[MLConfig] = None,
    *,
    test_images01: Optional[np.ndarray] = None,
    test_labels: Optional[np.ndarray] = None,
    backbone_variables=None,
    model: Optional[ResNet] = None,
) -> Dict[str, Any]:
    """The 5-fold CV protocol (reference ``ml_experiments.py:282-362``):
    per-fold train/val, best-val model evaluated on val (and on a held-out
    test set when given, e.g. real tiles for a synthetic-trained model)."""
    cfg = cfg or MLConfig()
    results = {"folds": []}
    for f, (tr_idx, va_idx) in enumerate(stratified_folds(labels, cfg.folds, cfg.seed)):
        trainer = TileClassifierTrainer(cfg, model=model, backbone_variables=backbone_variables)
        state, fit_res = trainer.fit(images01[tr_idx], labels[tr_idx], images01[va_idx], labels[va_idx])
        fold = {"fold": f, **trainer.evaluate(images01[va_idx], labels[va_idx], state)}
        if test_images01 is not None:
            fold["test"] = trainer.evaluate(test_images01, test_labels, state)
        results["folds"].append(fold)
    results["mean_accuracy"] = float(np.mean([x["accuracy"] for x in results["folds"]]))
    results["mean_weighted_f1"] = float(np.mean([x["weighted_f1"] for x in results["folds"]]))
    return results
