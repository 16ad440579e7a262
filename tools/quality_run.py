"""Quality-validation run: FID-vs-epoch for RNA-GAN (wganvae) vs GAN (wgan).

The reference's headline claim is an *epoch budget to quality*: RNA-GAN
reaches visual quality in 24 epochs on brain where the plain GAN needs 39
(reference ``README.md:62-81``), trained on GTEx tiles (246-562 slides x
<=600 tiles) with per-patient RNA-seq. GTEx data is not downloadable in this
environment, so this runs the same experiment on the procedural corpus
(``rnagan_tpu/data/synthetic.py``): slide latents drive BOTH tile morphology
and a 19,198-gene expression profile, giving RNA-infusion the same
information channel the reference exploits.

TPU-native design: one epoch = ONE dispatched XLA program — ``lax.scan`` over
steps, each step rendering its batch on device and running the full wganvae
train step (frozen VAE encode + D + fused GP + G). Zero host I/O inside the
epoch; the only per-epoch host traffic is a 3-float metrics fetch and the FID
probe. (The reference's equivalent loop decodes LMDB tiles on 4 CPU workers
at batch 8 and round-trips the host every step.)

FID probe: fixed-seed InceptionV3 features (the weight-conversion path is
golden-tested against real keras/TF in tests/test_inception_keras_parity.py;
actual trained weights are an external artifact this image cannot download —
random-feature FID is monotone in the same image statistics and is used here
for *relative* curves, not absolute parity).

Usage:
  python tools/quality_run.py --loss_type wganvae --epochs 24 --out runs/quality/wganvae.json
  python tools/quality_run.py --loss_type wgan    --epochs 39 --out runs/quality/wgan.json
  python tools/quality_run.py --smoke             # tiny CPU-able sanity run
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:  # noqa: E402 — cache config must precede first compile
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def build_corpus(args):
    from rnagan_tpu.data.synthetic import SyntheticCorpus

    return SyntheticCorpus(
        n_slides=args.slides,
        tiles_per_slide=args.tiles_per_slide,
        n_genes=args.genes,
        size=args.size,
        seed=args.corpus_seed,
    )


def normalized_expression(corpus):
    """Host-side log + standardize, exactly the training-data path
    (reference ``read_data.py:467-495``); scaler retained for inversion."""
    from rnagan_tpu.data.rna import Scaler, log_transform

    expr = np.asarray(corpus.expression, np.float32)
    logged = log_transform(expr)
    scaler = Scaler.fit(logged, "standard")
    return scaler.transform(logged).astype(np.float32), scaler


def train_vae(args, expr_norm):
    """Pre-train the beta-VAE on the corpus expression.

    The whole expression matrix is tiny (n_slides x 19,198 floats ~ 15 MB),
    so the ENTIRE pretrain lives on device: ``lax.scan`` over steps with
    random-index batch gathers from the resident matrix — one dispatched
    program per chunk of epochs instead of one RPC + 5 MB host transfer per
    step (which on this tunneled backend costs more than the compute).

    No host round-trips anywhere: best-on-val state is kept as a DEVICE copy
    (this backend moves device->host at ~7 MB/s — one fetch of the 1.2 GB
    parameter tree costs more than the whole retrain), and no disk cache:
    the pretrain is deterministic in (corpus seed, key), so a resumed run
    rebuilds the identical VAE faster than it could load one."""
    from rnagan_tpu.core.config import VAEConfig, VAEModelConfig
    from rnagan_tpu.train.vae_trainer import VAETrainer

    model_cfg = VAEModelConfig(rna_features=expr_norm.shape[1], compute_dtype="bfloat16")
    cfg = VAEConfig(model=model_cfg, num_epochs=args.vae_epochs, batch_size=64)
    trainer = VAETrainer(cfg)
    n = len(expr_norm)
    n_val = max(n // 5, 1)
    train_dev = jnp.asarray(expr_norm[n_val:])
    val_dev = jnp.asarray(expr_norm[:n_val])
    batch = min(cfg.batch_size, n - n_val)
    steps_per_epoch = max((n - n_val) // batch, 1)
    ones = jnp.ones((batch,), jnp.float32)

    @partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def run_epochs(state, key, n_steps):
        def body(st, i):
            idx = jax.random.randint(jax.random.fold_in(key, i), (batch,), 0, train_dev.shape[0])
            st, losses = trainer._train_step_impl(st, train_dev[idx], ones)
            return st, losses["total_loss"]

        state, tl = jax.lax.scan(body, state, jnp.arange(n_steps))
        # full-set val loss (no dropout/KL, reference betaVAE.py:151-155)
        out, _, _ = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            val_dev, train=False, rngs={"reparam": key})
        val = jnp.mean(jnp.square(out.astype(jnp.float32) - val_dev))
        return state, jnp.mean(tl), val

    @jax.jit
    def snapshot(state):  # device-side copy; no host traffic
        return jax.tree_util.tree_map(
            jnp.copy, {"params": state.params, "batch_stats": state.batch_stats})

    state = trainer.init_state()
    t0 = time.time()
    chunk_epochs = 25
    best_val, best_vars = float("inf"), None
    for start in range(0, args.vae_epochs, chunk_epochs):
        n_ep = min(chunk_epochs, args.vae_epochs - start)
        key = jax.random.fold_in(jax.random.key(7), start)
        state, tl, val = run_epochs(state, key, n_ep * steps_per_epoch)
        tl, val = float(tl), float(val)  # 2-float fetch; ends the chunk
        print(f"[vae] epoch {start + n_ep}/{args.vae_epochs} train {tl:.4f} "
              f"val_recons {val:.4f} ({time.time() - t0:.0f}s)", flush=True)
        if val < best_val:
            best_val = val
            best_vars = snapshot(state)
    print(f"[vae] done in {time.time() - t0:.0f}s best val_recons {best_val:.4f}", flush=True)
    return best_vars, model_cfg


def make_epoch_program(trainer, corpus, expr_norm, batch):
    """One whole training epoch as a single jitted program: scan over steps,
    rendering each batch on device (static shapes, no host I/O)."""
    from rnagan_tpu.data.synthetic import render_batch

    n_slides, tps, size = corpus.n_slides, corpus.tiles_per_slide, corpus.size
    stride = corpus.id_stride  # held-out-safe per-slide tile-id stride
    render_key = corpus._render_key
    slide_s = corpus.slides.s
    expr_dev = jnp.asarray(expr_norm) if trainer.cfg.loss_type == "wganvae" else None

    @partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def run_epoch(state, key, n_steps, vae_vars):
        def body(st, i):
            k = jax.random.fold_in(key, i)
            ksl, kti = jax.random.split(k)
            sl = jax.random.randint(ksl, (batch,), 0, n_slides)
            ti = jax.random.randint(kti, (batch,), 0, tps)
            imgs = render_batch(render_key, slide_s[sl], ti + sl * stride, size)
            # explicit per-step rng: keeps cfg.seed out of the compiled HLO
            # so every seed's epoch program hits the compilation cache
            bd = {"image": imgs, "rng": jax.random.fold_in(k, 2)}
            if expr_dev is not None:
                bd["rna_data"] = expr_dev[sl]
            st, m = trainer._train_step_impl(st, bd, vae_vars)
            out = jnp.stack([m["d_loss"], m["g_loss"], m.get("gp", jnp.float32(0))])
            return st, out

        state, ms = jax.lax.scan(body, state, jnp.arange(n_steps))
        return state, jnp.mean(ms.astype(jnp.float32), axis=0)

    return run_epoch


def make_fid_probe(trainer, corpus, expr_norm, args):
    """Per-epoch FID: held-out real tiles vs freshly generated fakes.

    Features: fixed-seed random-init InceptionV3 (trained weights are an
    external artifact, see module docstring), *whitened with the real set's
    per-dimension mean/std*. Random-init activations come out at ~1e-4 scale
    after 94 conv/BN layers; the whitening is one fixed affine map applied to
    both sides — still a Frechet distance in a fixed feature space, just
    well-conditioned. The split-half real-vs-real FID is recorded as the
    noise floor for reading the curves."""
    from rnagan_tpu.data.synthetic import render_batch
    from rnagan_tpu.eval.fid import InceptionExtractor, calculate_frechet_distance
    from rnagan_tpu.losses.rna_infusion import encode_z_mean, infused_noise

    weights = os.environ.get("INCEPTION_WEIGHTS")
    if weights:  # trained-weights parity path (docs/FID_WEIGHTS_RUNBOOK.md)
        from rnagan_tpu.cli.common import load_inception_extractor

        extractor = load_inception_extractor(weights)
        print(f"[fid] trained InceptionV3 features from {weights}", flush=True)
    else:
        extractor = InceptionExtractor(seed=0, dtype=jnp.float32)
    chunk = min(args.fid_batch, args.fid_n)
    expr_dev = jnp.asarray(expr_norm) if trainer.cfg.loss_type == "wganvae" else None
    dims = trainer.cfg.model.encoding_dims
    tps = corpus.tiles_per_slide
    stride = corpus.id_stride
    span = corpus.HELDOUT_SPAN

    # everything stays on device; only (chunk, 2048) activations cross the
    # tunnel (a full image fetch would be ~400 MB per probe on this backend)
    @jax.jit
    def real_acts_chunk(key, i0):
        sl = jax.random.randint(key, (chunk,), 0, corpus.n_slides)
        ti = tps + ((i0 + jnp.arange(chunk)) % span)  # held-out tile indices
        imgs = render_batch(corpus._render_key, corpus.slides.s[sl],
                            ti + sl * stride, corpus.size)
        return extractor._features(extractor.variables, (imgs + 1.0) * 0.5)

    def fake_images(state, key, vae_vars, train_mode=False):
        # eval-mode probing scores the EMA generator when the run tracks one
        # (--g_ema_decay) — same auto-selection as GANTrainer.sample; the
        # train_mode diagnostic always uses the raw weights
        g_params = state.g_params
        if not train_mode and state.g_ema is not None:
            g_params = state.g_ema
        if expr_dev is not None:
            sl = jax.random.randint(jax.random.fold_in(key, 1), (chunk,), 0, corpus.n_slides)
            z_mean = encode_z_mean(trainer.vae, vae_vars, expr_dev[sl])
            noise = infused_noise(jax.random.fold_in(key, 2), z_mean, trainer.cfg.noise_range)
        else:
            noise = jax.random.normal(key, (chunk, dims), jnp.float32)
        if train_mode:
            # batch-stat BN (diagnostic): separates "G is broken" from "G's
            # running stats are broken" when eval-mode samples look off
            imgs, _ = trainer.generator.apply(
                {"params": g_params, "batch_stats": state.g_stats},
                noise, labels=None, train=True, mutable=["batch_stats"])
        else:
            imgs = trainer.generator.apply(
                {"params": g_params, "batch_stats": state.g_stats},
                noise, labels=None, train=False)
        return jnp.clip((imgs.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)

    @partial(jax.jit, static_argnums=(3,))
    def fake_acts_chunk(state, key, vae_vars, train_mode=False):
        return extractor._features(
            extractor.variables, fake_images(state, key, vae_vars, train_mode))

    @jax.jit
    def fake_grid_chunk(state, key, vae_vars):  # uint8 on device: 4x smaller fetch
        return (fake_images(state, key, vae_vars) * 255.0 + 0.5).astype(jnp.uint8)

    acts_r = np.concatenate([
        np.asarray(real_acts_chunk(jax.random.fold_in(jax.random.key(7117), i), i))
        for i in range(0, args.fid_n, chunk)
    ])[: args.fid_n]
    # random-init features are ~1e-4 scale: whiten with the real set's
    # per-dimension stats (one fixed affine map, applied to both sides)
    w_mu = acts_r.mean(axis=0)
    w_sd = acts_r.std(axis=0) + 1e-8

    def stats(acts):
        white = (acts - w_mu) / w_sd
        return white.mean(axis=0), np.cov(white, rowvar=False)

    mu_r, s_r = stats(acts_r)
    half = len(acts_r) // 2
    mu_a, s_a = stats(acts_r[:half])
    mu_b, s_b = stats(acts_r[half:])
    floor = calculate_frechet_distance(mu_a, s_a, mu_b, s_b)
    del acts_r

    def probe(state, epoch, train_mode=False):
        acts = np.concatenate([
            np.asarray(fake_acts_chunk(
                state, jax.random.fold_in(jax.random.key(4242 + epoch), i),
                trainer.vae_variables, train_mode))
            for i in range(0, args.fid_n, chunk)
        ])[: args.fid_n]
        mu_f, s_f = stats(acts)
        return calculate_frechet_distance(mu_r, s_r, mu_f, s_f)

    def compile_all(state):
        """AOT-compile the probe's jitted programs (no execution beyond what
        setup already ran) — used by --compile_only to warm the persistent
        cache while another job owns the chip."""
        k = jax.random.key(0)
        fake_acts_chunk.lower(state, k, trainer.vae_variables, False).compile()
        if args.probe_train:
            fake_acts_chunk.lower(state, k, trainer.vae_variables, True).compile()
        fake_grid_chunk.lower(state, k, trainer.vae_variables).compile()

    def sample_grid(state, path, epoch):
        imgs = np.asarray(fake_grid_chunk(
            state, jax.random.fold_in(jax.random.key(31337), epoch), trainer.vae_variables))
        from rnagan_tpu.utils.images import save_image_grid
        save_image_grid(imgs[:64], path, nrow=8)

    probe.floor = floor
    probe.sample_grid = sample_grid
    probe.compile_all = compile_all
    return probe


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--loss_type", default="wganvae", choices=["wganvae", "wgan"])
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--slides", type=int, default=200)
    p.add_argument("--tiles_per_slide", type=int, default=600)
    p.add_argument("--genes", type=int, default=19198)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--corpus_seed", type=int, default=0)
    p.add_argument("--seed", type=int, default=None,
                   help="GAN seed (init + per-step noise/data order); the "
                        "corpus and VAE pretrain stay fixed so multi-seed "
                        "runs vary only the training stochasticity")
    p.add_argument("--vae_epochs", type=int, default=200)
    p.add_argument("--fid_n", type=int, default=512)
    p.add_argument("--fid_batch", type=int, default=64)
    p.add_argument("--fid_every", type=int, default=1)
    p.add_argument("--steps_per_dispatch", type=int, default=500,
                   help="max scanned steps per device execution (tunnel deadline)")
    p.add_argument("--save_every", type=int, default=5)
    p.add_argument("--compile_only", action="store_true",
                   help="build the full setup and AOT-compile every jitted "
                        "program (lower().compile()), then exit without "
                        "training. Warms the persistent compilation cache "
                        "(.jax_cache) for an upcoming run WHILE another job "
                        "owns the chip — remote compilation is a separate "
                        "service, so this overlaps cleanly. VAE pretrain is "
                        "skipped (weights are runtime args: same HLO).")
    p.add_argument("--no_ckpt", action="store_true",
                   help="skip all .model checkpoint saves (curve-only runs: "
                        "each bundle is ~2.7 GB and this tunnel fetches at "
                        "~7 MB/s, so saves dominate short runs); sample grids "
                        "are still written")
    p.add_argument("--workdir", default="runs/quality")
    p.add_argument("--out", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--smoke", action="store_true", help="tiny shapes, CPU-able")
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    # --- ablation knobs (wgan-baseline root-cause work; defaults = shipped cfg)
    p.add_argument("--tag", default=None, help="run name (output files suffix)")
    p.add_argument("--compat_gp", action="store_true",
                   help="reference dynamics: separate GP Adam step, scalar eps, global norm")
    p.add_argument("--no_clip", action="store_true", help="disable the wgan +-0.01 weight clip")
    p.add_argument("--n_critic", type=int, default=1,
                   help="critic steps per G update (WGAN schedule; 1 = reference parity)")
    p.add_argument("--g_lr", type=float, default=None)
    p.add_argument("--d_lr", type=float, default=None)
    p.add_argument("--arch", default="dcgan",
                   choices=["dcgan", "dcgan_up", "sagan", "biggan"],
                   help="generator/discriminator family (reference registry "
                        "histopathology_gan.py:175-246; sagan/biggan are its "
                        "declared-but-missing archs, built in models/)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize biggan residual blocks (jax.checkpoint)"
                        " — without it the b32 GP double-backward peaks at"
                        " ~11.9 GiB and killed the TPU worker twice"
                        " (docs/perf/biggan_rootcause.json)")
    p.add_argument("--critic", default="unconditional",
                   choices=["unconditional", "projection"],
                   help="projection = condition the critic on the frozen VAE "
                        "embedding (Miyato-Koyama); wganvae only")
    p.add_argument("--g_ema_decay", type=float, default=None,
                   help="generator weight EMA (e.g. 0.999); the FID probe and "
                        "grids then evaluate the averaged generator")
    p.add_argument("--probe_train", action="store_true",
                   help="also record FID with train-mode (batch-stat) BN in G")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.smoke:
        args.slides, args.tiles_per_slide, args.genes = 6, 12, 64
        args.size, args.batch, args.vae_epochs = 32, 4, 3
        args.epochs, args.fid_n, args.fid_batch = 2, 8, 8
    run_name = args.tag or args.loss_type
    out_path = args.out or os.path.join(args.workdir, f"{run_name}.json")
    os.makedirs(args.workdir, exist_ok=True)

    from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
    from rnagan_tpu.train.gan_trainer import GANTrainer

    print(f"[setup] backend init: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    corpus = build_corpus(args)
    expr_norm, _scaler = normalized_expression(corpus)
    print(f"[setup] corpus + normalization {time.time() - t0:.0f}s", flush=True)

    vae_vars = None
    vae_cfg = VAEModelConfig(rna_features=args.genes, compute_dtype="bfloat16")
    if args.loss_type == "wganvae":
        if args.smoke:
            from rnagan_tpu.models.betavae import init_betavae
            vae_cfg = VAEModelConfig(rna_features=args.genes, z_dim=32,
                                     encoder_dims=(48, 32), decoder_dims=(48,),
                                     compute_dtype="bfloat16")
            vae_vars = init_betavae(vae_cfg, jax.random.key(0))
        elif args.compile_only:
            # weights ride as runtime arguments, so init weights produce the
            # exact HLO the trained weights will; skip the pretrain
            from rnagan_tpu.models.betavae import init_betavae

            vae_vars = init_betavae(vae_cfg, jax.random.key(0))
        else:
            vae_vars, vae_cfg = train_vae(args, expr_norm)

    model_cfg = GANModelConfig(out_size=args.size, arch=args.arch,
                               encoding_dims=vae_cfg.z_dim if args.loss_type == "wganvae" else 2048,
                               critic=args.critic, remat=args.remat)
    cfg_kw = dict(model=model_cfg, loss_type=args.loss_type, batch_size=args.batch,
                  vae=vae_cfg, compat_reference_gp=args.compat_gp, n_critic=args.n_critic,
                  g_ema_decay=args.g_ema_decay)
    if args.no_clip:
        cfg_kw["clip"] = None
    if args.seed is not None:
        cfg_kw["seed"] = args.seed
    if args.g_lr is not None:
        cfg_kw["g_lr"] = args.g_lr
    if args.d_lr is not None:
        cfg_kw["d_lr"] = args.d_lr
    cfg = GANConfig(**cfg_kw)
    trainer = GANTrainer(cfg, vae_variables=vae_vars)
    if vae_vars is not None and not args.smoke and not args.compile_only:
        # persist the pretrained VAE for downstream tools (representation
        # analysis, data-plane runs) — async: the ~GB fetch rides the tunnel
        # while the GAN warms up, same as checkpoint saves
        trainer._saver.save_bundle(
            os.path.join(args.workdir, "vae_pretrain.msgpack"),
            {"vae": vae_vars}, {"vae_epochs": args.vae_epochs, "genes": args.genes,
                                "corpus_seed": args.corpus_seed})

    steps_per_epoch = max((args.slides * args.tiles_per_slide) // args.batch, 1)
    run_epoch = make_epoch_program(trainer, corpus, expr_norm, args.batch)
    t0 = time.time()
    probe = make_fid_probe(trainer, corpus, expr_norm, args)
    print(f"[setup] FID probe (incl. real-set activations) {time.time() - t0:.0f}s", flush=True)

    if args.compile_only:
        state = trainer.init_state()
        key = jax.random.key(0)
        tail = steps_per_epoch % args.steps_per_dispatch
        for n in sorted({min(args.steps_per_dispatch, steps_per_epoch)} |
                        ({tail} if tail else set())):
            t0 = time.time()
            run_epoch.lower(state, key, int(n), trainer.vae_variables).compile()
            print(f"[compile_only] epoch program n={n}: {time.time() - t0:.0f}s",
                  flush=True)
        t0 = time.time()
        probe.compile_all(state)

        @jax.jit
        def snapshot(state):
            return jax.tree_util.tree_map(jnp.copy, state)

        snapshot.lower(state).compile()
        print(f"[compile_only] probe + snapshot: {time.time() - t0:.0f}s; cache warm",
              flush=True)
        return

    ckpt = os.path.join(args.workdir, f"{run_name}_last.model")
    ckpt_best = os.path.join(args.workdir, f"{run_name}_best.model")
    history, start_epoch = [], 0
    if args.resume and os.path.exists(ckpt) and os.path.exists(out_path):
        state = trainer.load_model(ckpt)
        with open(out_path) as f:
            prev = json.load(f)
        # the checkpoint may lag the history (saves every save_every epochs):
        # resume from the checkpointed step, discarding newer history rows
        epochs_done = int(jax.device_get(state.step)) // steps_per_epoch
        history = prev["history"][:epochs_done]
        start_epoch = epochs_done
        print(f"[resume] epoch {start_epoch} from {ckpt}", flush=True)
    else:
        state = trainer.init_state()

    if start_epoch == 0:  # one-time reference grid of held-out real tiles
        from rnagan_tpu.utils.images import save_image_grid
        n_grid = min(64, args.slides)
        sl = jnp.arange(n_grid, dtype=jnp.int32) % args.slides
        ti = jnp.full((n_grid,), args.tiles_per_slide, jnp.int32)  # held-out index
        real_imgs = np.asarray(corpus.render(sl, ti))
        save_image_grid(real_imgs, os.path.join(args.workdir, "grids", "real.png"), nrow=8)

    meta = {"loss_type": args.loss_type, "slides": args.slides,
            "tiles_per_slide": args.tiles_per_slide, "batch": args.batch,
            "steps_per_epoch": steps_per_epoch, "size": args.size,
            "fid_n": args.fid_n, "fid_floor_real_vs_real": round(probe.floor, 4),
            "compat_reference_gp": cfg.compat_reference_gp,
            # effective clip: the trainer applies the weight clamp only for
            # the plain wgan loss (gan_trainer.py; reference wires clip at
            # histopathology_gan.py:267-271 for "wgan" only)
            "clip": cfg.clip if cfg.loss_type == "wgan" else None,
            "seed": cfg.seed, "arch": cfg.model.arch, "critic": cfg.model.critic,
            "n_critic": cfg.n_critic, "g_lr": cfg.g_lr, "d_lr": cfg.d_lr,
            "g_ema_decay": cfg.g_ema_decay, "remat": cfg.model.remat,
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0])}
    print(f"[run] {meta}", flush=True)

    # one epoch = several scanned dispatches: a single execution covering the
    # whole epoch (~3 min) crashes the tunneled TPU worker (per-execution
    # deadline); chunks of <=steps_per_dispatch keep each execute ~30 s while
    # the dispatches still pipeline back-to-back on device
    @jax.jit
    def snapshot(state):  # device-side full-state copy (no host traffic)
        return jax.tree_util.tree_map(jnp.copy, state)

    # best-FID retention (VERDICT r2 item 4): the best generator observed must
    # not be thrown away — reference keeps best-on-val for the VAE
    # (betaVAE.py:270-273); we do the same against the FID probe.
    best_fid, best_state, best_epoch = float("inf"), None, -1
    for r in history:
        if "fid" in r and r["fid"] < best_fid:
            best_fid, best_epoch = r["fid"], r["epoch"]
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        key = jax.random.fold_in(jax.random.key(cfg.seed), 1000 + epoch)
        chunk_losses, chunk_steps = [], []
        done = 0
        ci = 0
        while done < steps_per_epoch:
            n = min(args.steps_per_dispatch, steps_per_epoch - done)
            state, losses = run_epoch(state, jax.random.fold_in(key, ci),
                                      n, trainer.vae_variables)
            chunk_losses.append(losses)
            chunk_steps.append(n)
            done += n
            ci += 1
        fetched = np.stack(jax.device_get(chunk_losses))  # blocking fetch
        losses = (fetched * np.asarray(chunk_steps)[:, None]).sum(0) / steps_per_epoch
        train_s = time.time() - t0
        rec = {"epoch": epoch, "d_loss": float(losses[0]), "g_loss": float(losses[1]),
               "gp": float(losses[2]), "train_s": round(train_s, 2),
               "step_ms": round(1000.0 * train_s / steps_per_epoch, 3)}
        if args.fid_every and (epoch + 1) % args.fid_every == 0:
            t1 = time.time()
            rec["fid"] = round(probe(state, epoch), 4)
            if args.probe_train:
                rec["fid_train_mode"] = round(probe(state, epoch, train_mode=True), 4)
            rec["fid_s"] = round(time.time() - t1, 2)
            if rec["fid"] < best_fid:
                best_fid, best_state, best_epoch = rec["fid"], snapshot(state), epoch
        history.append(rec)
        print(f"[epoch {epoch}] " + " ".join(f"{k}={v}" for k, v in rec.items() if k != "epoch"),
              flush=True)
        with open(out_path, "w") as f:
            json.dump({"meta": meta, "history": history,
                       "best": {"fid": best_fid, "epoch": best_epoch}}, f, indent=1)
        if (epoch + 1) % args.save_every == 0 or epoch == args.epochs - 1:
            if not args.no_ckpt:
                # async: the ~2.7 GB G+D+optimizer fetch (~7 MB/s on this
                # tunnel) overlaps the next epochs' training
                trainer.save_model(state, ckpt, {"epoch": epoch}, async_=True)
            probe.sample_grid(state, os.path.join(
                args.workdir, "grids", f"{run_name}_epoch{epoch:03d}.png"), epoch)
    if best_state is not None:
        if not args.no_ckpt:
            trainer.save_model(best_state, ckpt_best,
                               {"epoch": best_epoch, "fid": best_fid}, async_=True)
            print(f"[best] fid {best_fid} at epoch {best_epoch} -> {ckpt_best}", flush=True)
        probe.sample_grid(best_state, os.path.join(
            args.workdir, "grids", f"{run_name}_best_epoch{best_epoch:03d}.png"), best_epoch)
    trainer._saver.wait()
    print(f"[done] {out_path}", flush=True)


if __name__ == "__main__":
    main()
