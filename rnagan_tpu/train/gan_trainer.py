"""GAN trainer — the TPU-native replacement for ``torchgan.trainer.Trainer``.

The reference hands models + losses to torchgan's Trainer, which loops over
batches and calls each loss's ``train_ops`` (own forward/backward/optimizer
step) in sequence — per batch: D critic step, gradient-penalty step, G step
(reference ``histopathology_gan.py:298-314``; custom train_ops in
``wgan_loss.py:82-129,181-263,314-389``; call stack SURVEY.md section 3.2).

Here the entire per-batch sequence compiles into ONE jitted, donated XLA
program over the device mesh:

* the frozen beta-VAE encoder (wganvae family) runs inside the step in eval
  mode — the infusion ``U(-0.3,0.3) + z_mean`` + global-batch standardization
  (losses/rna_infusion.py) fuses with G's first matmul;
* the gradient penalty's double backward is plain grad-of-grad under jit;
* fresh noise per stage matches the reference (each ``train_ops`` draws its
  own, ``wgan_loss.py:100,227,357``), via per-stage fold_in keys;
* BatchNorm running stats thread through the stage forwards in the same order
  torch mutates them;
* with the batch sharded over the data axis, gradient all-reduce and the
  global-batch noise statistics come from XLA collectives — exact
  single-device semantics at any mesh size.

Two D-update modes:
* default: one fused critic update  ``L_D = wasserstein + lambda * GP``
  (standard WGAN-GP; per-sample interpolation eps and per-sample grad norm);
* ``compat_reference_gp=True``: two separate Adam steps (critic loss, then
  GP-only) with scalar eps and global grad norm, reproducing the reference's
  exact training dynamics (``wgan_loss.py:376,43`` and torchgan's
  loss-by-loss stepping).

Per-epoch artifacts mirror the reference surface: a sample grid PNG
(``sample_size=64``) into ``image_dir`` and a bundled ``gan_last.model``
checkpoint (G+D params+stats+optimizer states+step) into ``model_dir``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rnagan_tpu.core.checkpoint import AsyncSaver, load_bundle, save_bundle
from rnagan_tpu.core.config import GANConfig
from rnagan_tpu.core.metrics import MetricsLogger
from rnagan_tpu.core.profiling import StepTimer
from rnagan_tpu.core.rng import KeyStream, step_key
from rnagan_tpu.losses import gan as gan_losses
from rnagan_tpu.losses.rna_infusion import (
    encode_z_mean,
    infused_noise,
    infused_noise_population,
    standardize_batch,
)
from rnagan_tpu.models.betavae import BetaVAE, params_from_torch_state_dict
from rnagan_tpu.models.dcgan import make_discriminator, make_generator, init_gan
from rnagan_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from rnagan_tpu.utils.images import save_image_grid


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_stats: Any
    g_opt: Any
    d_params: Any
    d_stats: Any
    d_opt: Any
    #: EMA of g_params (GANConfig.g_ema_decay); None when disabled — None is
    #: an empty pytree, so the donated step's structure is unchanged
    g_ema: Any = None


def load_frozen_vae(path: str, vae_cfg) -> Dict[str, Any]:
    """Load beta-VAE variables for the wganvae loss family from either our
    bundle format or a reference torch ``state_dict`` (.pt) file
    (reference hardcodes the path at ``histopathology_gan.py:275-278``)."""
    if path.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        return params_from_torch_state_dict(vae_cfg, sd)
    trees, _ = load_bundle(path)
    return {"params": trees["params"], "batch_stats": trees["batch_stats"]}


class GANTrainer:
    def __init__(
        self,
        cfg: GANConfig,
        *,
        vae_variables: Optional[Dict[str, Any]] = None,
        mesh=None,
        logger: Optional[MetricsLogger] = None,
        image_dir: Optional[str] = None,
        model_dir: Optional[str] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.logger = logger or MetricsLogger()
        self.image_dir = image_dir
        self.model_dir = model_dir
        self.generator = make_generator(cfg.model)
        self.discriminator = make_discriminator(cfg.model)
        self.keys = KeyStream(cfg.seed)
        self._base_key = self.keys.fold("gan")

        if cfg.model.critic == "projection":
            if cfg.loss_type != "wganvae":
                raise ValueError("critic='projection' conditions on the frozen "
                                 "VAE embedding; it requires loss_type=wganvae")
            if cfg.model.arch not in ("dcgan", "dcgan_up"):
                raise ValueError("critic='projection' is implemented on the "
                                 "DCGAN discriminator trunk only")
        if cfg.loss_type == "wganvae":
            if vae_variables is None:
                if not cfg.vae_checkpoint:
                    raise ValueError("loss_type=wganvae requires vae_variables or cfg.vae_checkpoint")
                vae_variables = load_frozen_vae(cfg.vae_checkpoint, cfg.vae)
            self.vae = BetaVAE(cfg.vae)
            self.vae_variables = jax.device_put(vae_variables, replicated(self.mesh))
        else:
            self.vae = None
            self.vae_variables = None
        #: optional z-population statistics (mean, std) for the
        #: conditioning-preserving generation mode; bundled into checkpoints
        self.z_pop: Optional[Tuple[np.ndarray, np.ndarray]] = None

        # TTUR Adam (reference histopathology_gan.py:248-259). mu_dtype
        # optionally drops the first moment to bf16 — see GANConfig.adam_mu_dtype
        # for why nu must stay f32.
        if cfg.fused_critic_batch and cfg.model.arch in ("sagan", "biggan"):
            # the closed-form running-stats recomposition in d_loss_fn is a
            # BatchNorm identity; these archs keep spectral-norm power-
            # iteration state (u/sigma) in the same collection and it would
            # be corrupted by the blend
            raise ValueError("fused_critic_batch is unsupported for "
                             "spectral-norm architectures (sagan/biggan)")
        mu_dtype = jnp.dtype(cfg.adam_mu_dtype) if cfg.adam_mu_dtype else None
        self.g_tx = optax.adam(cfg.g_lr, b1=cfg.adam_b1, b2=cfg.adam_b2, mu_dtype=mu_dtype)
        self.d_tx = optax.adam(cfg.d_lr, b1=cfg.adam_b1, b2=cfg.adam_b2, mu_dtype=mu_dtype)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._sample = jax.jit(self._sample_impl, static_argnums=(2, 6))
        self._saver = AsyncSaver()

    # ------------------------------------------------------------------ state
    def init_state(self) -> GANTrainState:
        gv, dv = init_gan(self.cfg.model, self.keys.fold("init"))
        state = GANTrainState(
            step=jnp.asarray(0, jnp.int32),
            g_params=gv["params"],
            g_stats=gv.get("batch_stats", {}),
            g_opt=self.g_tx.init(gv["params"]),
            d_params=dv["params"],
            d_stats=dv.get("batch_stats", {}),
            d_opt=self.d_tx.init(dv["params"]),
            # jnp.copy, NOT asarray: aliasing g_params' buffers would make the
            # donated train step donate the same buffer twice
            g_ema=(jax.tree_util.tree_map(jnp.copy, gv["params"])
                   if self.cfg.g_ema_decay is not None else None),
        )
        return jax.device_put(state, replicated(self.mesh))

    # ------------------------------------------------------------------ noise
    def _noise(self, key, batch: Dict[str, jax.Array], vae_variables) -> jax.Array:
        """Per-stage noise prior: VAE-infused for wganvae (reference
        ``wgan_loss.py:97-106``), standard normal otherwise (torchgan
        sampler). ``vae_variables`` is threaded as a runtime argument — a
        closure would inline ~0.5 GB of frozen VAE weights into the HLO as
        constants (breaks remote compilers and bloats every executable)."""
        n = batch["image"].shape[0]
        dims = self.cfg.model.encoding_dims
        if self.cfg.loss_type == "wganvae":
            z_mean = encode_z_mean(self.vae, vae_variables, batch["rna_data"])
            return infused_noise(key, z_mean, self.cfg.noise_range)
        return jax.random.normal(key, (n, dims), jnp.float32)

    def _labels(self, batch):
        # condgan requires labels; biggan consumes them when conditional
        # (num_classes > 0) and degrades to its unconditional form otherwise
        if self.cfg.model.arch in ("condgan", "biggan"):
            return batch.get("labels")
        return None

    # ------------------------------------------------------------- train step
    def _g_apply(self, params, stats, z, labels, train=True):
        out, upd = self.generator.apply(
            {"params": params, "batch_stats": stats}, z, labels=labels, train=train,
            mutable=["batch_stats"],
        )
        return out, upd["batch_stats"]

    def _d_apply(self, params, stats, x, labels, train=True, cond=None):
        kw = {} if cond is None else {"cond": cond}
        out, upd = self.discriminator.apply(
            {"params": params, "batch_stats": stats}, x, labels=labels, train=train,
            mutable=["batch_stats"], **kw,
        )
        return out, upd["batch_stats"]

    def _train_step_impl(self, state: GANTrainState, batch: Dict[str, jax.Array], vae_variables=None):
        cfg = self.cfg
        loss_type = cfg.loss_type
        labels = self._labels(batch)
        real = batch["image"]
        if real.dtype == jnp.uint8:
            # uint8 ingest: the host pipeline ships raw tile bytes and the
            # [-1,1] normalization happens on device — 4x less host->device
            # traffic than float32 batches (dtype is static under jit, so
            # this branch costs nothing when batches arrive as float)
            real = real.astype(jnp.float32) / 127.5 - 1.0
        # per-step RNG: derived from cfg.seed + step by default; a batch may
        # carry an explicit "rng" key instead, which keeps the seed OUT of
        # the compiled program (a closed-over base key becomes an HLO
        # constant, so multi-seed studies would cache-miss the ~20-min
        # remote compile per seed — tools/quality_run.py threads it)
        if isinstance(batch, dict) and "rng" in batch:
            base = batch["rng"]
        else:
            base = step_key(self._base_key, state.step)
        k_d, k_gp, k_g, k_eps = (jax.random.fold_in(base, i) for i in range(4))
        metrics: Dict[str, jax.Array] = {}

        # projection critic: every D call this step conditions on the frozen
        # VAE embedding of the batch's patients (real, fake, and GP
        # interpolates share the same patients, hence the same cond)
        cond = None
        if cfg.model.critic == "projection":
            cond = jax.lax.stop_gradient(
                encode_z_mean(self.vae, vae_variables, batch["rna_data"]))

        d_params, d_stats, d_opt = state.d_params, state.d_stats, state.d_opt
        g_params, g_stats = state.g_params, state.g_stats

        wgan_family = loss_type in ("wgan", "wganvae")
        use_gp = wgan_family
        fused_gp = use_gp and not cfg.compat_reference_gp

        # weight clipping: the reference clamps at the START of the critic's
        # train_ops, BEFORE its forward (wgan_loss.py:213-215, verified) — so
        # within one iteration the GP and G stages see UNclipped post-step
        # weights, and the clamp lands at the next iteration's critic stage.
        # Applied only for the plain wgan loss (constructed with clip at
        # histopathology_gan.py:270; wganvae without).
        if loss_type == "wgan" and cfg.clip is not None:
            d_params = gan_losses.clip_params(d_params, cfg.clip[0], cfg.clip[1])

        # ---------------- D stage (critic loss, optionally fused with GP)
        noise_d = self._noise(k_d, batch, vae_variables)
        fake_d, g_stats = self._g_apply(g_params, g_stats, noise_d, labels)
        fake_d = jax.lax.stop_gradient(fake_d)
        if fused_gp:
            eps = jax.random.uniform(k_eps, (real.shape[0], 1, 1, 1))
            interp = eps * real + (1.0 - eps) * fake_d

        def d_loss_fn(p):
            if cfg.fused_critic_batch:
                # ONE 2B-batch D dispatch instead of two B-batch passes (vmap
                # over a [real; fake] group axis merges into the conv batch
                # dim): fewer kernel launches, better MXU utilization. EXACT
                # equivalence incl. batchnorm: train-mode BN normalizes each
                # group by its own batch stats (what the two passes do), and
                # the sequential running-stats update recomposes in closed
                # form — with ra_g = m*s0 + (1-m)*sigma_g per group, the
                # two-pass result  s2 = m*(m*s0 + (1-m)*sigma_r) +
                # (1-m)*sigma_f  equals  ra_f + m*(ra_r - s0).
                both = jnp.stack([real, fake_d])
                lab2 = None if labels is None else jnp.stack([labels, labels])
                out, sg = jax.vmap(
                    lambda x, lab: self._d_apply(p, d_stats, x, lab, cond=cond),
                    in_axes=(0, None if labels is None else 0),
                )(both, lab2)
                dx, dgz = out[0], out[1]
                m = 0.9  # BN momentum (models/dcgan._BN)
                s2 = jax.tree_util.tree_map(
                    lambda g, s0: g[1] + m * (g[0] - s0), sg, d_stats)
            else:
                dx, s1 = self._d_apply(p, d_stats, real, labels, cond=cond)
                dgz, s2 = self._d_apply(p, s1, fake_d, labels, cond=cond)
            if loss_type in ("wgan", "wganvae"):
                loss = gan_losses.wasserstein_discriminator_loss(dx, dgz)
            elif loss_type == "minimax":
                loss = gan_losses.minimax_discriminator_loss(dx, dgz)
            elif loss_type == "lsgan":
                loss = gan_losses.least_squares_discriminator_loss(dx, dgz)
            else:
                raise ValueError(f"unknown loss_type {loss_type}")
            aux = {"d_loss": loss, "dx": jnp.mean(dx), "dgz": jnp.mean(dgz)}
            if fused_gp:
                def critic(x):
                    out, _ = self._d_apply(p, s2, x, labels, cond=cond)
                    return out

                gp = gan_losses.gradient_penalty(critic, interp, per_sample=True)
                aux["gp"] = gp
                loss = loss + cfg.gp_lambda * gp
            return loss, (aux, s2)

        grads, (aux, d_stats) = jax.grad(d_loss_fn, has_aux=True)(d_params)
        updates, d_opt = self.d_tx.update(grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, updates)
        metrics.update(aux)

        # ---------------- GP stage (separate Adam step — reference dynamics)
        if use_gp and not fused_gp:
            noise_gp = self._noise(k_gp, batch, vae_variables)
            fake_gp, g_stats = self._g_apply(g_params, g_stats, noise_gp, labels)
            fake_gp = jax.lax.stop_gradient(fake_gp)
            # reference quirk: ONE scalar eps for the whole batch (wgan_loss.py:376)
            eps = jax.random.uniform(k_eps, ())
            interp = eps * real + (1.0 - eps) * fake_gp

            def gp_loss_fn(p):
                def critic(x):
                    out, _ = self._d_apply(p, d_stats, x, labels, cond=cond)
                    return out

                # reference quirk: global (not per-sample) gradient norm (:43)
                gp = gan_losses.gradient_penalty(critic, interp, per_sample=False)
                return cfg.gp_lambda * gp, gp

            grads, gp_val = jax.grad(gp_loss_fn, has_aux=True)(d_params)
            # the reference's GP forward runs D in train mode, so it ALSO
            # updates BatchNorm running stats (wgan_loss.py:381) — replay the
            # interpolate forward for the stats update with pre-GP-step
            # weights, as torch saw them
            _, d_stats = self._d_apply(d_params, d_stats, interp, labels, cond=cond)
            updates, d_opt = self.d_tx.update(grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, updates)
            metrics["gp"] = gp_val

        # ---------------- G stage
        noise_g = self._noise(k_g, batch, vae_variables)

        def g_loss_fn(p):
            fake, gs = self._g_apply(p, g_stats, noise_g, labels)
            dgz, ds = self._d_apply(d_params, d_stats, fake, labels, cond=cond)
            if loss_type in ("wgan", "wganvae"):
                loss = gan_losses.wasserstein_generator_loss(dgz)
            elif loss_type == "minimax":
                loss = gan_losses.minimax_generator_loss(dgz)
            elif loss_type == "lsgan":
                loss = gan_losses.least_squares_generator_loss(dgz)
            return loss, (gs, ds)

        def g_update(_):
            (g_loss, (gs, ds)), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
            updates, g_opt = self.g_tx.update(grads, state.g_opt, state.g_params)
            return (optax.apply_updates(state.g_params, updates), gs, ds, g_opt,
                    g_loss.astype(jnp.float32))

        if cfg.n_critic > 1:
            # WGAN critic schedule (arXiv:1701.07875 alg. 1): D (+GP) updated
            # every step on fresh data above; G only every n_critic-th step.
            # lax.cond keeps the whole step one compiled program.
            def g_skip(_):
                return state.g_params, g_stats, d_stats, state.g_opt, jnp.float32(0.0)

            do_g = (state.step % cfg.n_critic) == (cfg.n_critic - 1)
            g_params, g_stats, d_stats, g_opt, g_loss = jax.lax.cond(do_g, g_update, g_skip, None)
        else:
            do_g = None
            g_params, g_stats, d_stats, g_opt, g_loss = g_update(None)
        metrics["g_loss"] = g_loss

        g_ema = state.g_ema
        if cfg.g_ema_decay is not None:
            # blend only on steps where G actually updated: the EMA is over
            # the G-update sequence, invariant to the critic schedule
            blend = cfg.g_ema_decay if do_g is None else jnp.where(do_g, cfg.g_ema_decay, 1.0)
            g_ema = jax.tree_util.tree_map(
                lambda e, p: e * blend + (1.0 - blend) * p, state.g_ema, g_params)

        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params, g_stats=g_stats, g_opt=g_opt,
            d_params=d_params, d_stats=d_stats, d_opt=d_opt,
            g_ema=g_ema,
        )
        return new_state, metrics

    # -------------------------------------------------------------- sampling
    def _sample_impl(self, state: GANTrainState, key, n: int, gene: Optional[jax.Array] = None,
                     z_pop: Optional[Tuple[jax.Array, jax.Array]] = None, vae_variables=None,
                     use_ema: bool = False):
        """Generate n images in eval mode. With ``gene`` (wganvae), noise is
        the infusion prior broadcast from a patient's z_mean (reference
        ``gan_utils.py:211-216``). NOTE (discovered reference property): with a
        single patient, the reference's per-batch standardization cancels the
        broadcast z exactly — pass ``z_pop=(mean, std)`` (from
        ``losses.rna_infusion.z_population_stats``) for the
        conditioning-preserving variant."""
        dims = self.cfg.model.encoding_dims
        if gene is not None:
            z_mean = encode_z_mean(self.vae, vae_variables, gene)
            if z_pop is not None:
                noise = infused_noise_population(
                    key, z_mean, z_pop[0], z_pop[1], n, self.cfg.noise_range
                )
            else:
                u = jax.random.uniform(key, (n, dims), jnp.float32, -self.cfg.noise_range, self.cfg.noise_range)
                noise = standardize_batch(u + z_mean)
        else:
            noise = jax.random.normal(key, (n, dims), jnp.float32)
        labels = None
        if self.cfg.model.arch in ("condgan", "biggan") and self.cfg.model.num_classes > 0:
            labels = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, self.cfg.model.num_classes)
        # EMA sampling keeps the raw weights' running BN stats: batch_stats
        # are already exponential averages, and the EMA tree tracks params only
        params = state.g_ema if use_ema else state.g_params
        imgs = self.generator.apply(
            {"params": params, "batch_stats": state.g_stats},
            noise, labels=labels, train=False,
        )
        return imgs

    def sample(self, state: GANTrainState, key, n: int, gene=None, z_pop=None,
               use_ema: Optional[bool] = None) -> np.ndarray:
        """Generate ``n`` images. ``use_ema=None`` (default) auto-selects the
        EMA generator whenever the state carries one (GANConfig.g_ema_decay);
        pass False to force the raw training weights."""
        if z_pop is not None:
            z_pop = (jnp.asarray(z_pop[0], jnp.float32), jnp.asarray(z_pop[1], jnp.float32))
        if use_ema is None:
            use_ema = state.g_ema is not None
        elif use_ema and state.g_ema is None:
            raise ValueError("use_ema=True but the state carries no EMA tree "
                             "(set GANConfig.g_ema_decay)")
        return np.asarray(jax.device_get(
            self._sample(state, key, n, gene, z_pop, self.vae_variables, bool(use_ema))))

    def set_z_population(self, rna_matrix: np.ndarray) -> None:
        """Compute and retain z-population statistics over the (normalized)
        training expression matrix (losses/rna_infusion.z_population_stats);
        saved into every checkpoint so generation can preserve conditioning."""
        from rnagan_tpu.losses.rna_infusion import z_population_stats

        assert self.vae is not None, "z population stats need the wganvae loss family"
        self.z_pop = z_population_stats(self.vae, self.vae_variables, rna_matrix)

    # ------------------------------------------------------------ checkpoints
    def save_model(self, state: GANTrainState, path: str, metadata=None, async_: bool = False) -> None:
        """Bundled checkpoint — the ``.model`` equivalent (G+D+optimizers+step,
        reference torchgan checkpoints, SURVEY.md section 5.4). ``async_``
        fetches+writes on a worker thread (slow host links)."""
        trees = {
            "g_params": state.g_params, "g_stats": state.g_stats, "g_opt": state.g_opt,
            "d_params": state.d_params, "d_stats": state.d_stats, "d_opt": state.d_opt,
            "step": state.step,
        }
        if state.g_ema is not None:
            trees["g_ema"] = state.g_ema
        if self.z_pop is not None:
            trees["z_pop"] = {"mean": np.asarray(self.z_pop[0]), "std": np.asarray(self.z_pop[1])}
        if async_:
            self._saver.save_bundle(path, trees, metadata or {})
        else:
            save_bundle(path, trees, metadata or {})

    def load_model(self, path: str) -> GANTrainState:
        """Resume from a bundle (the ``trainer.load_model`` equivalent,
        reference ``histopathology_gan.py:311-312``). Accepts both our native
        msgpack bundles and the reference's torch-saved torchgan ``.model``
        bundles (format sniffed from the file magic), so reference-trained
        checkpoints drive this framework directly."""
        with open(path, "rb") as f:
            magic = f.read(4)
        # torch.save: zipfile ("PK\x03\x04") or legacy pickle (\x80 protocol)
        if magic[:2] == b"PK" or magic[:1] == b"\x80":
            from rnagan_tpu.models.dcgan_torch import import_torchgan_bundle

            template = self.init_state()
            state, _epoch = import_torchgan_bundle(path, self.cfg, jax.device_get(template))
            if template.g_ema is not None:
                # torchgan bundles carry no EMA (our extension): seed it from
                # the imported weights, as a fresh EMA run would
                state = state.replace(
                    g_ema=jax.tree_util.tree_map(np.array, state.g_params))
            return jax.device_put(state, replicated(self.mesh))
        template = self.init_state()
        targets = {
            "g_params": template.g_params, "g_stats": template.g_stats, "g_opt": template.g_opt,
            "d_params": template.d_params, "d_stats": template.d_stats, "d_opt": template.d_opt,
            "step": template.step,
        }
        if template.g_ema is not None:
            targets["g_ema"] = template.g_ema
        trees, _ = load_bundle(path, targets)
        if "z_pop" in trees:
            self.z_pop = (np.asarray(trees["z_pop"]["mean"]), np.asarray(trees["z_pop"]["std"]))
        g_ema = None
        if template.g_ema is not None:
            # EMA-less bundle into an EMA-enabled trainer: seed from the
            # loaded weights (an EMA-carrying bundle into an EMA-off trainer
            # simply drops the tree)
            g_ema = trees.get("g_ema", jax.tree_util.tree_map(np.array, trees["g_params"]))
        state = GANTrainState(
            step=jnp.asarray(trees["step"], jnp.int32),
            g_params=trees["g_params"], g_stats=trees["g_stats"], g_opt=trees["g_opt"],
            d_params=trees["d_params"], d_stats=trees["d_stats"], d_opt=trees["d_opt"],
            g_ema=g_ema,
        )
        return jax.device_put(state, replicated(self.mesh))

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        batches_per_epoch_fn,
        *,
        num_epochs: Optional[int] = None,
        state: Optional[GANTrainState] = None,
        sample_every: int = 1,
        save_every: int = 1,
        auto_resume: bool = False,
        eval_fn=None,
        eval_every: int = 0,
        keep_best_metric: Optional[str] = None,
    ) -> Tuple[GANTrainState, Dict[str, Any]]:
        """Epoch loop. ``batches_per_epoch_fn(epoch) -> iterable of batch
        dicts`` (numpy NHWC images in [-1,1], plus rna_data/labels as needed).
        Writes sample grids and checkpoints like the reference Trainer.
        ``auto_resume`` restarts from ``model_dir/gan_last.model`` when present
        — preemption recovery the reference only offers manually via
        ``--checkpoint`` (SURVEY.md 5.3). ``eval_fn(epoch, state, trainer) ->
        dict of scalars`` runs every ``eval_every`` epochs (e.g. an in-training
        FID probe — the reference only evaluates post-hoc) and is merged into
        the epoch's logged metrics. ``keep_best_metric`` names one of
        ``eval_fn``'s scalars (lower = better, e.g. ``"fid"``): the state at
        its best observed value is retained as a device-side snapshot and
        written to ``model_dir/gan_best.model`` — the GAN-side analogue of the
        reference VAE's best-on-val checkpoint (betaVAE.py:270-273)."""
        cfg = self.cfg
        if state is None and auto_resume and self.model_dir:
            last = os.path.join(self.model_dir, "gan_last.model")
            if os.path.exists(last):
                self.logger.console(f"auto-resuming from {last}")
                state = self.load_model(last)
        state = state if state is not None else self.init_state()
        num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
        timer = StepTimer()
        history = []
        best_val, best_state, best_epoch = float("inf"), None, -1
        snapshot = jax.jit(lambda s: jax.tree_util.tree_map(jnp.copy, s))
        # per-step metrics stay on device and are fetched in chunks: a host
        # sync every step stalls the dispatch pipeline (~0.5 s RPC per step on
        # tunneled backends), while holding a whole reference-scale epoch
        # (tens of thousands of tiny buffers) risks exhausting device arrays
        fetch_chunk = 512
        for epoch in range(num_epochs):
            pending = []
            count = 0
            sums: Dict[str, float] = {}

            def _drain(pending):
                for metrics in jax.device_get(pending):
                    for k, v in metrics.items():
                        sums[k] = sums.get(k, 0.0) + float(v)
                pending.clear()

            # time the whole epoch with ONE device sync at the end — a
            # per-step block_until_ready would stall the dispatch pipeline
            # this chunked fetch exists to keep full
            timer.start()
            for batch in batches_per_epoch_fn(epoch):
                sharded = shard_batch(batch, self.mesh)
                state, metrics = self._train_step(state, sharded, self.vae_variables)
                pending.append(metrics)
                count += 1
                if len(pending) >= fetch_chunk:
                    _drain(pending)
            _drain(pending)
            epoch_s = timer.stop(state.step)
            means = {k: v / max(count, 1) for k, v in sums.items()}
            means["steps_per_sec"] = count / max(epoch_s, 1e-9)
            means["step_ms_mean"] = 1e3 * epoch_s / max(count, 1)
            if eval_fn is not None and eval_every and (epoch + 1) % eval_every == 0:
                means.update(eval_fn(epoch, state, self))
                if keep_best_metric and means.get(keep_best_metric, float("inf")) < best_val:
                    best_val = means[keep_best_metric]
                    best_state, best_epoch = snapshot(state), epoch
            history.append(means)
            self.logger.scalars("gan", means, epoch)
            self.logger.console(
                f"epoch {epoch}: " + " ".join(f"{k} {v:.4f}" for k, v in means.items() if not k.startswith("step_"))
            )
            if self.image_dir and (epoch + 1) % sample_every == 0:
                imgs = self.sample(state, self.keys.fold("grid", epoch), cfg.sample_size)
                save_image_grid(imgs, os.path.join(self.image_dir, f"epoch_{epoch}.png"), nrow=8)
            if self.model_dir and (epoch + 1) % save_every == 0:
                self.save_model(state, os.path.join(self.model_dir, "gan_last.model"),
                                {"epoch": epoch}, async_=True)
        if best_state is not None and self.model_dir:
            self.save_model(best_state, os.path.join(self.model_dir, "gan_best.model"),
                            {"epoch": best_epoch, keep_best_metric: best_val}, async_=True)
        self._saver.wait()
        # the timer now measures whole epochs (one sync each), not steps
        timing = {k.replace("step_", "epoch_"): v for k, v in timer.stats().items()}
        out: Dict[str, Any] = {"history": history, "timing": timing}
        if best_state is not None:
            out["best"] = {"state": best_state, "epoch": best_epoch,
                           keep_best_metric: best_val}
        return state, out
