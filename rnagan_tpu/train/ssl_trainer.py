"""Self-supervised (SimCLR) pre-training on histology tiles.

The reference's fusion pipeline imports a never-shipped ``ssl_training``
module (reference ``main.py:17``; SURVEY.md 2.5) and its downstream
experiment consumes a SimCLR-pretrained ResNet50 checkpoint
(``resnet50_simclr_rnagan.pth``, ``ml_experiments.py:286-293``). This module
implements that declared capability TPU-natively:

* two stochastic views per tile — random resized crop, horizontal/vertical
  flips and brightness/contrast jitter — generated **inside the jitted step**
  (branchless, static shapes);
* ResNet backbone -> 2-layer projection head -> NT-Xent contrastive loss
  with the standard 2N-view formulation; the similarity matrix is over the
  **global** batch, so sharding the batch over the mesh data axis gives the
  large-batch negatives SimCLR needs via XLA collectives, for free;
* the pre-trained backbone feeds TileClassifierTrainer / FusionTrainer via
  ``backbone_variables``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn, struct

from rnagan_tpu.core.config import MeshConfig
from rnagan_tpu.core.metrics import MetricsLogger
from rnagan_tpu.core.rng import KeyStream, step_key
from rnagan_tpu.models.resnet import ResNet, resnet50
from rnagan_tpu.parallel.mesh import make_mesh, replicated, shard_batch


@dataclass(frozen=True)
class SSLConfig:
    lr: float = 1e-3
    weight_decay: float = 1e-6
    temperature: float = 0.5
    num_epochs: int = 100
    batch_size: int = 256
    image_size: int = 224
    crop_scale_min: float = 0.6
    projection_dim: int = 128
    projection_hidden: int = 512
    seed: int = 99
    mesh: MeshConfig = field(default_factory=MeshConfig)


class ProjectionHead(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        return nn.Dense(self.out)(x)


class SSLTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def nt_xent_loss(z: jax.Array, temperature: float) -> Tuple[jax.Array, jax.Array]:
    """NT-Xent over 2N stacked views (first N = view A, last N = view B).
    Returns (loss, contrastive accuracy)."""
    n2 = z.shape[0]
    n = n2 // 2
    z = z / (jnp.linalg.norm(z, axis=1, keepdims=True) + 1e-8)
    sim = (z @ z.T) / temperature
    sim = sim - 1e9 * jnp.eye(n2, dtype=z.dtype)  # mask self-similarity
    # positive of i is i+n (mod 2n)
    pos_idx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    logp = jax.nn.log_softmax(sim, axis=1)
    loss = -jnp.mean(jnp.take_along_axis(logp, pos_idx[:, None], axis=1))
    acc = jnp.mean((jnp.argmax(sim, axis=1) == pos_idx).astype(jnp.float32))
    return loss, acc


def _random_resized_crop(key, images01: jax.Array, scale_min: float) -> jax.Array:
    """Per-sample random square crop (scale in [scale_min, 1]) resized back —
    branchless via a per-sample affine resample grid."""
    n, h, w, c = images01.shape
    ks, kx, ky = jax.random.split(key, 3)
    scale = jax.random.uniform(ks, (n, 1, 1), minval=scale_min, maxval=1.0)
    max_off = 1.0 - scale
    off_x = jax.random.uniform(kx, (n, 1, 1)) * max_off
    off_y = jax.random.uniform(ky, (n, 1, 1)) * max_off
    # normalized sample coordinates per output pixel
    ys = jnp.linspace(0.0, 1.0, h)[None, :, None]
    xs = jnp.linspace(0.0, 1.0, w)[None, None, :]
    src_y = (off_y + ys * scale) * (h - 1)  # (n, h, 1)
    src_x = (off_x + xs * scale) * (w - 1)  # (n, 1, w)
    y0 = jnp.clip(jnp.floor(src_y), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(src_x), 0, w - 2).astype(jnp.int32)
    fy = (src_y - y0).astype(images01.dtype)
    fx = (src_x - x0).astype(images01.dtype)

    def gather_rows(img, yi):  # img (h, w, c), yi (h, 1)
        return jnp.take(img, yi[:, 0], axis=0)

    def sample_one(img, y0i, x0i, fyi, fxi):
        r0 = gather_rows(img, y0i)
        r1 = gather_rows(img, y0i + 1)
        rows = r0 * (1 - fyi)[..., None] + r1 * fyi[..., None]  # (h, w, c)
        c0 = jnp.take(rows, x0i[0], axis=1)
        c1 = jnp.take(rows, x0i[0] + 1, axis=1)
        return c0 * (1 - fxi[0])[..., None] + c1 * fxi[0][..., None]

    return jax.vmap(sample_one)(images01, y0, x0, fy, fx)


def augment_views(key, images01: jax.Array, scale_min: float) -> jax.Array:
    """One stochastic view: crop + flips + brightness/contrast jitter."""
    kc, kh, kv, kb, kk = jax.random.split(key, 5)
    x = _random_resized_crop(kc, images01, scale_min)
    n = x.shape[0]
    flip_h = jax.random.bernoulli(kh, 0.5, (n, 1, 1, 1))
    flip_v = jax.random.bernoulli(kv, 0.5, (n, 1, 1, 1))
    x = jnp.where(flip_h, x[:, :, ::-1, :], x)
    x = jnp.where(flip_v, x[:, ::-1, :, :], x)
    brightness = jax.random.uniform(kb, (n, 1, 1, 1), minval=-0.2, maxval=0.2)
    contrast = jax.random.uniform(kk, (n, 1, 1, 1), minval=0.8, maxval=1.2)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return jnp.clip((x - mean) * contrast + mean + brightness, 0.0, 1.0)


class SimCLRTrainer:
    def __init__(self, cfg: SSLConfig, *, backbone: Optional[ResNet] = None, mesh=None,
                 logger: Optional[MetricsLogger] = None):
        self.cfg = cfg
        self.backbone = backbone or resnet50()

        class _Model(nn.Module):
            backbone: ResNet
            hidden: int
            out: int

            @nn.compact
            def __call__(self, x, train: bool = True):
                feats = self.backbone(x, train=train, extract=True)
                return ProjectionHead(self.hidden, self.out, name="projection")(feats)

        self.model = _Model(self.backbone, cfg.projection_hidden, cfg.projection_dim)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.logger = logger or MetricsLogger()
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        self.keys = KeyStream(cfg.seed)
        self._base_key = self.keys.fold("ssl")
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))

    def init_state(self) -> SSLTrainState:
        x = jnp.zeros((2, self.cfg.image_size, self.cfg.image_size, 3), jnp.float32)
        variables = self.model.init(self.keys.fold("init"), x, train=False)
        params = variables["params"]
        return jax.device_put(
            SSLTrainState(
                step=jnp.asarray(0, jnp.int32),
                params=params,
                batch_stats=variables.get("batch_stats", {}),
                opt_state=self.tx.init(params),
            ),
            replicated(self.mesh),
        )

    def _train_step_impl(self, state: SSLTrainState, images01):
        from rnagan_tpu.train.ml_experiment import IMAGENET_MEAN, IMAGENET_STD

        key = step_key(self._base_key, state.step)
        ka, kb = jax.random.split(key)
        va = augment_views(ka, images01, self.cfg.crop_scale_min)
        vb = augment_views(kb, images01, self.cfg.crop_scale_min)
        both = jnp.concatenate([va, vb], axis=0)
        # same input normalization the downstream TileClassifierTrainer
        # applies (ml_experiment.py) — the pretrained backbone must see the
        # SAME input distribution at fine-tune time as at pretrain time
        both = (both - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

        def loss_fn(params):
            z, upd = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                both, train=True, mutable=["batch_stats"],
            )
            loss, acc = nt_xent_loss(z.astype(jnp.float32), self.cfg.temperature)
            return loss, (acc, upd["batch_stats"])

        (loss, (acc, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            SSLTrainState(step=state.step + 1, params=params, batch_stats=stats, opt_state=opt_state),
            {"loss": loss, "contrastive_acc": acc},
        )

    def fit(self, images01: np.ndarray, *, num_epochs: Optional[int] = None,
            state: Optional[SSLTrainState] = None) -> Tuple[SSLTrainState, Dict[str, Any]]:
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        n = len(images01)
        n_dev = self.mesh.devices.size
        # NT-Xent treats every row as a real negative, so batches are never
        # padded: clamp the batch to the corpus size (rounded down to a mesh
        # multiple) instead of silently running zero steps on small corpora
        bs = min(cfg.batch_size, n) // n_dev * n_dev
        if bs == 0:
            raise ValueError(
                f"corpus of {n} images cannot fill one {n_dev}-device batch")
        from rnagan_tpu.data.batching import batch_indices

        history = []
        for epoch in range(num_epochs or cfg.num_epochs):
            sums, count, pending = {"loss": 0.0, "contrastive_acc": 0.0}, 0, []
            for idx, _mask in batch_indices(n, bs, shuffle=True, seed=cfg.seed,
                                            epoch=epoch, drop_remainder=True):
                batch = shard_batch({"x": images01[idx]}, self.mesh)
                state, metrics = self._train_step(state, batch["x"])
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
            history.append({k: v / max(count, 1) for k, v in sums.items()})
            self.logger.scalars("ssl", history[-1], epoch)
        return state, {"history": history}

    def backbone_variables(self, state: SSLTrainState) -> Dict[str, Any]:
        """Extract the pretrained backbone for downstream trainers
        (``TileClassifierTrainer(backbone_variables=...)``)."""
        return {
            "params": state.params["backbone"],
            "batch_stats": state.batch_stats.get("backbone", {}),
        }
