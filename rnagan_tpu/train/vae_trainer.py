"""beta-VAE trainer.

The torch reference trains with a hand-rolled epoch loop over train/val phases
with best-on-val checkpointing (reference ``betaVAE.py:165-284``). Here the
whole optimization step — encode -> reparametrize -> decode -> MSE + beta*KL ->
grad -> Adam update -> BatchNorm stat update — is ONE jitted XLA program, with
the batch dimension sharded over the mesh data axis (gradients and batch-mean
losses become global automatically through XLA collectives). A second jitted
program serves eval.

Differences from the reference (intentional):
* explicit PRNG keys per step (the reference's ``--seed`` is dead code,
  SURVEY.md section 5.2);
* the normalization scaler is bundled into every checkpoint (the reference
  re-fits it by re-splitting CSVs per script, ``betaVAE_sample.py:66-96``);
* short final batches are wrap-padded + masked instead of ragged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rnagan_tpu.core.checkpoint import BestKeeper
from rnagan_tpu.core.config import VAEConfig
from rnagan_tpu.core.metrics import MetricsLogger
from rnagan_tpu.core.profiling import StepTimer
from rnagan_tpu.core.rng import KeyStream, step_key
from rnagan_tpu.data.rna import Scaler, batch_iterator
from rnagan_tpu.models.betavae import BetaVAE, init_betavae
from rnagan_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from rnagan_tpu.train.schedules import gradual_warmup_cosine


class VAETrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def _masked_losses(x, out, z_mean, z_logvar, mask, beta, training):
    """beta_vae_loss semantics (losses/vae.py) restricted to valid rows."""
    mask = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    x = x.astype(jnp.float32)
    out = out.astype(jnp.float32)
    per_row_mse = jnp.mean(jnp.square(out - x), axis=1)
    recons = jnp.sum(per_row_mse * mask) / denom
    per_row_kl = -0.5 * jnp.sum(1.0 + z_logvar - jnp.square(z_mean) - jnp.exp(z_logvar), axis=1)
    kl = jnp.sum(per_row_kl * mask) / denom
    total = recons + beta * kl if training else recons
    return {"total_loss": total, "reconstruction_loss": recons, "kl_loss": kl}


def make_optimizer(cfg: VAEConfig) -> optax.GradientTransformation:
    """Adam / SGD / RAdam selection (reference ``betaVAE_training.py:157-162``)
    with the warmup+cosine schedule stepped per batch."""
    schedule = gradual_warmup_cosine(cfg.lr, cfg.warmup_steps, cfg.cosine_steps)
    name = cfg.optimizer.lower()
    if name == "sgd":
        tx = optax.sgd(schedule)
    elif name == "radam" and hasattr(optax, "radam"):
        tx = optax.radam(schedule)
    else:
        tx = optax.adam(schedule)
    if cfg.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx


class VAETrainer:
    def __init__(
        self,
        cfg: VAEConfig,
        *,
        mesh=None,
        logger: Optional[MetricsLogger] = None,
    ):
        self.cfg = cfg
        self.model = BetaVAE(cfg.model)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.logger = logger or MetricsLogger()
        self.tx = make_optimizer(cfg)
        self.keys = KeyStream(cfg.seed)
        self._base_key = self.keys.fold("vae")
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ---------------------------------------------------------------- init
    def init_state(self) -> VAETrainState:
        variables = init_betavae(self.cfg.model, self.keys.fold("init"))
        params = variables["params"]
        stats = variables["batch_stats"]
        model_axis = self.mesh.axis_names[1]
        if self.mesh.shape[model_axis] > 1:
            # 2-D mesh: column-shard the Dense kernels over the model axis
            # (tensor parallelism); optimizer moments inherit the layout via
            # jit sharding propagation
            from rnagan_tpu.parallel.mesh import shard_dense_params

            params = shard_dense_params(params, self.mesh)
            stats = shard_dense_params(stats, self.mesh)
            opt_state = jax.jit(self.tx.init)(params)
            step = jax.device_put(jnp.asarray(0, jnp.int32), replicated(self.mesh))
            return VAETrainState(step=step, params=params, batch_stats=stats, opt_state=opt_state)
        state = VAETrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=stats,
            opt_state=self.tx.init(params),
        )
        # replicate once; batches get sharded per step
        return jax.device_put(state, replicated(self.mesh))

    # ---------------------------------------------------------------- steps
    def _train_step_impl(self, state: VAETrainState, batch, mask):
        beta = self.cfg.model.beta
        rng = step_key(self._base_key, state.step)
        k_drop, k_rep = jax.random.split(rng)

        def loss_fn(params):
            (out, z_mean, z_logvar), updates = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"dropout": k_drop, "reparam": k_rep},
                mutable=["batch_stats"],
            )
            losses = _masked_losses(batch, out, z_mean, z_logvar, mask, beta, True)
            return losses["total_loss"], (losses, updates["batch_stats"])

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = VAETrainState(
            step=state.step + 1, params=new_params, batch_stats=new_stats, opt_state=new_opt
        )
        return new_state, losses

    def _eval_step_impl(self, state: VAETrainState, batch, mask, key):
        out, z_mean, z_logvar = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
            rngs={"reparam": key},
        )
        losses = _masked_losses(batch, out, z_mean, z_logvar, mask, self.cfg.model.beta, False)
        # report the train-style total too so best-on-val tracks the same
        # quantity the reference tracks (val total == recons, betaVAE.py:151-155)
        return losses, out

    # ---------------------------------------------------------------- loops
    def _run_epoch(self, state, data: np.ndarray, *, train: bool, epoch: int):
        n_data = self.mesh.shape[self.cfg.mesh.data_axis]
        # per-step metrics stay on device, fetched in bounded chunks (per-step
        # syncs stall dispatch; holding a whole epoch of tiny buffers does not
        # scale to reference-size corpora)
        pending = []
        count = 0
        sums: Dict[str, float] = {}

        def _drain():
            for losses in jax.device_get(pending):
                for k, v in losses.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
            pending.clear()

        for batch, mask in batch_iterator(
            data,
            self.cfg.batch_size,
            shuffle=train,
            seed=self.cfg.seed,
            epoch=epoch,
            pad_to=n_data,
        ):
            sharded = shard_batch({"x": batch, "m": mask}, self.mesh)
            if train:
                state, losses = self._train_step(state, sharded["x"], sharded["m"])
            else:
                key = self.keys.fold("eval", epoch * 100003 + count)
                losses, _ = self._eval_step(state, sharded["x"], sharded["m"], key)
            pending.append(losses)
            count += 1
            if len(pending) >= 512:
                _drain()
        _drain()
        means = {k: v / max(count, 1) for k, v in sums.items()}
        return state, means

    def fit(
        self,
        train_data: np.ndarray,
        val_data: np.ndarray,
        *,
        save_dir: Optional[str] = None,
        scaler: Optional[Scaler] = None,
        state: Optional[VAETrainState] = None,
    ) -> Tuple[VAETrainState, Dict[str, Any]]:
        """Train/val epoch loop with best-on-val checkpointing (the
        ``train_betaVAE`` equivalent, reference ``betaVAE.py:165-284``)."""
        state = state if state is not None else self.init_state()
        keeper = BestKeeper(save_dir) if save_dir else None
        timer = StepTimer()
        history = {"train": [], "val": []}
        best_loss = float("inf")
        best_epoch = -1
        # never alias the (donated) input state: on all-NaN val losses no
        # epoch would replace it and fit would return deleted arrays
        best_state = None
        extra = {"scaler": scaler.state_dict()} if scaler is not None else {}

        for epoch in range(self.cfg.num_epochs):
            timer.start()
            state, train_losses = self._run_epoch(state, train_data, train=True, epoch=epoch)
            timer.stop(state.params["z_mu"]["kernel"])
            _, val_losses = self._run_epoch(state, val_data, train=False, epoch=epoch)
            history["train"].append(train_losses)
            history["val"].append(val_losses)
            self.logger.scalars("train", train_losses, epoch)
            self.logger.scalars("val", val_losses, epoch)
            self.logger.console(
                f"epoch {epoch}: train total {train_losses['total_loss']:.4f} "
                f"recons {train_losses['reconstruction_loss']:.4f} kl {train_losses['kl_loss']:.4f} | "
                f"val total {val_losses['total_loss']:.4f}"
            )
            if val_losses["total_loss"] < best_loss:
                best_loss = val_losses["total_loss"]
                best_epoch = epoch
                # deep-copy: the train step donates its input state, so a
                # bare alias would be invalidated on the next epoch
                best_state = jax.tree_util.tree_map(jnp.copy, state)
                if keeper:
                    keeper.update(
                        epoch,
                        best_loss,
                        {"params": state.params, "batch_stats": state.batch_stats, **extra},
                        {"config": "betavae"},
                    )
        if keeper:
            keeper.save_last({"params": state.params, "batch_stats": state.batch_stats, **extra})
        if best_state is None:
            best_state = state  # degenerate (NaN) val losses: final state is live
        results = {
            "best_epoch": best_epoch,
            "best_loss": {"total_loss": best_loss},
            "history": history,
            "timing": timer.stats(),
        }
        # reference reloads best before returning (betaVAE.py:278)
        return best_state, results

    def evaluate(self, data: np.ndarray, state: VAETrainState):
        """Test-set eval returning mean losses + reconstructions (the
        ``evaluate_betaVAE`` equivalent, reference ``betaVAE.py:286-331``)."""
        n_data = self.mesh.shape[self.cfg.mesh.data_axis]
        sums: Dict[str, float] = {}
        preds = []
        count = 0
        for batch, mask in batch_iterator(data, self.cfg.batch_size, pad_to=n_data):
            sharded = shard_batch({"x": batch, "m": mask}, self.mesh)
            losses, out = self._eval_step(
                state, sharded["x"], sharded["m"], self.keys.fold("test", count)
            )
            losses = jax.device_get(losses)
            out = np.asarray(jax.device_get(out))
            valid = np.asarray(mask) > 0
            preds.append(out[valid])
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        means = {k: v / max(count, 1) for k, v in sums.items()}
        return means, np.concatenate(preds, axis=0) if preds else np.zeros((0,))
