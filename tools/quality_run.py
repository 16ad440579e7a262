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

try:
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


def train_or_load_vae(args, expr_norm, workdir):
    """Pre-train the beta-VAE on the corpus expression (cached across runs)."""
    from rnagan_tpu.core.checkpoint import load_bundle, save_bundle
    from rnagan_tpu.core.config import VAEConfig, VAEModelConfig
    from rnagan_tpu.train.vae_trainer import VAETrainer

    path = os.path.join(workdir, "vae_synth.model")
    model_cfg = VAEModelConfig(rna_features=expr_norm.shape[1], compute_dtype="bfloat16")
    if os.path.exists(path):
        trees, _ = load_bundle(path)
        print(f"[vae] loaded cached {path}", flush=True)
        return {"params": trees["params"], "batch_stats": trees["batch_stats"]}, model_cfg

    cfg = VAEConfig(model=model_cfg, num_epochs=args.vae_epochs, batch_size=64)
    trainer = VAETrainer(cfg)
    n = len(expr_norm)
    n_val = max(n // 5, 1)
    t0 = time.time()
    state, results = trainer.fit(expr_norm[n_val:], expr_norm[:n_val])
    print(f"[vae] {args.vae_epochs} epochs in {time.time() - t0:.0f}s "
          f"best val {results['best_loss']['total_loss']:.4f} @ {results['best_epoch']}",
          flush=True)
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    save_bundle(path, variables, {"epochs": args.vae_epochs})
    return variables, model_cfg


def make_epoch_program(trainer, corpus, expr_norm, batch):
    """One whole training epoch as a single jitted program: scan over steps,
    rendering each batch on device (static shapes, no host I/O)."""
    from rnagan_tpu.data.synthetic import render_batch

    n_slides, tps, size = corpus.n_slides, corpus.tiles_per_slide, corpus.size
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
            imgs = render_batch(render_key, slide_s[sl], ti + sl * tps, size)
            bd = {"image": imgs}
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
    import jax.numpy as _jnp

    from rnagan_tpu.eval.fid import InceptionExtractor, calculate_frechet_distance
    from rnagan_tpu.losses.rna_infusion import encode_z_mean, infused_noise

    extractor = InceptionExtractor(seed=0, dtype=_jnp.float32)
    real = corpus.real_tiles(args.fid_n)
    acts_r = extractor(real, args.fid_batch)
    w_mu = acts_r.mean(axis=0)
    w_sd = acts_r.std(axis=0) + 1e-8
    del real

    def stats(acts):
        white = (acts - w_mu) / w_sd
        return white.mean(axis=0), np.cov(white, rowvar=False)

    mu_r, s_r = stats(acts_r)
    half = len(acts_r) // 2
    mu_a, s_a = stats(acts_r[:half])
    mu_b, s_b = stats(acts_r[half:])
    floor = calculate_frechet_distance(mu_a, s_a, mu_b, s_b)
    del acts_r
    gen_batch = min(64, args.fid_n)
    expr_dev = jnp.asarray(expr_norm) if trainer.cfg.loss_type == "wganvae" else None
    dims = trainer.cfg.model.encoding_dims

    @jax.jit
    def gen_chunk(state, key, vae_vars):
        if expr_dev is not None:
            sl = jax.random.randint(jax.random.fold_in(key, 1), (gen_batch,), 0, corpus.n_slides)
            z_mean = encode_z_mean(trainer.vae, vae_vars, expr_dev[sl])
            noise = infused_noise(jax.random.fold_in(key, 2), z_mean, trainer.cfg.noise_range)
        else:
            noise = jax.random.normal(key, (gen_batch, dims), jnp.float32)
        imgs = trainer.generator.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            noise, labels=None, train=False)
        return jnp.clip((imgs.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)

    def probe(state, epoch):
        fakes = []
        for i in range(0, args.fid_n, gen_batch):
            k = jax.random.fold_in(jax.random.key(4242 + epoch), i)
            fakes.append(np.asarray(gen_chunk(state, k, trainer.vae_variables)))
        fake = np.concatenate(fakes)[: args.fid_n]
        mu_f, s_f = stats(extractor(fake, args.fid_batch))
        return calculate_frechet_distance(mu_r, s_r, mu_f, s_f)

    probe.floor = floor
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
    p.add_argument("--vae_epochs", type=int, default=200)
    p.add_argument("--fid_n", type=int, default=512)
    p.add_argument("--fid_batch", type=int, default=64)
    p.add_argument("--fid_every", type=int, default=1)
    p.add_argument("--save_every", type=int, default=5)
    p.add_argument("--workdir", default="runs/quality")
    p.add_argument("--out", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--smoke", action="store_true", help="tiny shapes, CPU-able")
    args = p.parse_args()
    if args.smoke:
        args.slides, args.tiles_per_slide, args.genes = 6, 12, 64
        args.size, args.batch, args.vae_epochs = 32, 4, 3
        args.epochs, args.fid_n, args.fid_batch = 2, 8, 8
    out_path = args.out or os.path.join(args.workdir, f"{args.loss_type}.json")
    os.makedirs(args.workdir, exist_ok=True)

    from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
    from rnagan_tpu.train.gan_trainer import GANTrainer

    corpus = build_corpus(args)
    expr_norm, _scaler = normalized_expression(corpus)

    vae_vars = None
    vae_cfg = VAEModelConfig(rna_features=args.genes, compute_dtype="bfloat16")
    if args.loss_type == "wganvae":
        if args.smoke:
            from rnagan_tpu.models.betavae import init_betavae
            vae_cfg = VAEModelConfig(rna_features=args.genes, z_dim=32,
                                     encoder_dims=(48, 32), decoder_dims=(48,),
                                     compute_dtype="bfloat16")
            vae_vars = init_betavae(vae_cfg, jax.random.key(0))
        else:
            vae_vars, vae_cfg = train_or_load_vae(args, expr_norm, args.workdir)

    model_cfg = GANModelConfig(out_size=args.size,
                               encoding_dims=vae_cfg.z_dim if args.loss_type == "wganvae" else 2048)
    cfg = GANConfig(model=model_cfg, loss_type=args.loss_type, batch_size=args.batch,
                    vae=vae_cfg)
    trainer = GANTrainer(cfg, vae_variables=vae_vars)

    steps_per_epoch = max((args.slides * args.tiles_per_slide) // args.batch, 1)
    run_epoch = make_epoch_program(trainer, corpus, expr_norm, args.batch)
    probe = make_fid_probe(trainer, corpus, expr_norm, args)

    ckpt = os.path.join(args.workdir, f"{args.loss_type}_last.model")
    history, start_epoch = [], 0
    if args.resume and os.path.exists(ckpt) and os.path.exists(out_path):
        state = trainer.load_model(ckpt)
        with open(out_path) as f:
            prev = json.load(f)
        history = prev["history"]
        start_epoch = len(history)
        print(f"[resume] epoch {start_epoch} from {ckpt}", flush=True)
    else:
        state = trainer.init_state()

    meta = {"loss_type": args.loss_type, "slides": args.slides,
            "tiles_per_slide": args.tiles_per_slide, "batch": args.batch,
            "steps_per_epoch": steps_per_epoch, "size": args.size,
            "fid_n": args.fid_n, "fid_floor_real_vs_real": round(probe.floor, 4),
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0])}
    print(f"[run] {meta}", flush=True)

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        key = jax.random.fold_in(jax.random.key(cfg.seed), 1000 + epoch)
        state, losses = run_epoch(state, key, steps_per_epoch, trainer.vae_variables)
        losses = np.asarray(losses)  # blocking fetch ends the epoch's pipeline
        train_s = time.time() - t0
        rec = {"epoch": epoch, "d_loss": float(losses[0]), "g_loss": float(losses[1]),
               "gp": float(losses[2]), "train_s": round(train_s, 2),
               "step_ms": round(1000.0 * train_s / steps_per_epoch, 3)}
        if args.fid_every and (epoch + 1) % args.fid_every == 0:
            t1 = time.time()
            rec["fid"] = round(probe(state, epoch), 4)
            rec["fid_s"] = round(time.time() - t1, 2)
        history.append(rec)
        print(f"[epoch {epoch}] " + " ".join(f"{k}={v}" for k, v in rec.items() if k != "epoch"),
              flush=True)
        with open(out_path, "w") as f:
            json.dump({"meta": meta, "history": history}, f, indent=1)
        if (epoch + 1) % args.save_every == 0 or epoch == args.epochs - 1:
            trainer.save_model(state, ckpt, {"epoch": epoch})
    print(f"[done] {out_path}", flush=True)


if __name__ == "__main__":
    main()
