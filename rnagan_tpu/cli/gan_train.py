"""GAN / RNA-GAN training CLI — flag surface of reference
``src/histopathology_gan.py:54-72``.

Usage (mirrors README.md:55-81 of the reference):
    python -m rnagan_tpu.cli.gan_train --config configs/gan_run.json \
        --image_dir images --model_dir checkpoints/gan \
        --num_epochs 24 --num_patches 600 --gan_type dcgan --loss_type wganvae
"""

from __future__ import annotations

import argparse

from rnagan_tpu.cli.common import load_gan_dataframe, setup_jax


def build_parser():
    p = argparse.ArgumentParser(description="GANs training on histology data")
    p.add_argument("--config", type=str, required=True, help="JSON config file")
    p.add_argument("--checkpoint", type=str, default=None, help="checkpoint to resume from")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--image_dir", type=str, default="images")
    p.add_argument("--model_dir", type=str, default="./model/gan")
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--num_patches", type=int, default=250, help="tiles per slide")
    p.add_argument("--gan_type", type=str, default="dcgan",
                   help="dcgan | dcgan_up | condgan | sagan | biggan (the reference "
                        "registers sagan/biggan but imports missing modules — "
                        "histopathology_gan.py:211-244; built here as the intended "
                        "attention families)")
    p.add_argument("--loss_type", type=str, default="wganvae",
                   help="minimax | wgan | wganvae | lsgan")
    p.add_argument("--vae_checkpoint", type=str, default=None,
                   help="beta-VAE checkpoint for wganvae (the reference hardcodes this path)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--critic", type=str, default="unconditional",
                   choices=["unconditional", "projection"],
                   help="projection = condition the critic on the frozen VAE "
                        "embedding (Miyato-Koyama, arXiv:1802.05637); "
                        "wganvae + dcgan-family only. Our extension — the "
                        "reference critic is unconditional (wgan_loss.py:131-263)")
    p.add_argument("--n_critic", type=int, default=1,
                   help="critic steps per G update (WGAN schedule; 1 = reference parity)")
    p.add_argument("--no_clip", action="store_true",
                   help="disable the wgan +-0.01 weight clip (pure WGAN-GP dynamics)")
    p.add_argument("--compat_reference_gp", action="store_true",
                   help="reproduce the reference's two-step GP dynamics exactly")
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from model_dir/gan_last.model when present")
    p.add_argument("--fid_every", type=int, default=0,
                   help="compute an in-training FID probe every N epochs (the reference "
                        "only evaluates post-hoc); logged into the epoch metrics")
    p.add_argument("--fid_images", type=int, default=128)
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--g_ema_decay", type=float, default=None,
                   help="EMA decay for generator weights (e.g. 0.999); sampling "
                        "and the FID probe then use the averaged generator")
    p.add_argument("--adam_mu_dtype", type=str, default=None,
                   choices=("bfloat16", "float32"),
                   help="dtype for Adam's first moment (bfloat16 halves that "
                        "slice of optimizer HBM traffic; default keeps f32)")
    p.add_argument("--platform", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_jax(args.platform)

    from rnagan_tpu.core.config import (
        GANConfig,
        GANModelConfig,
        VAEModelConfig,
        load_reference_json,
    )
    from rnagan_tpu.data.patches import PatchBatches, load_patch_data
    from rnagan_tpu.data.rna import log_transform, rna_columns, Scaler
    from rnagan_tpu.train.gan_trainer import GANTrainer

    config = load_reference_json(args.config)
    print("-" * 10)
    print("Config for this experiment\n")
    print(config)
    print("-" * 10)

    df = load_gan_dataframe(config)
    with_rna = args.loss_type == "wganvae"
    if with_rna:
        # log + standardize the rna_ columns (reference histopathology_gan.py:131-151)
        cols = rna_columns(df)
        vals = log_transform(df[cols].values)
        scaler = Scaler.fit(vals, "standard")
        df[cols] = scaler.transform(vals)

    data = load_patch_data(df, max_patches_total=args.num_patches, seed=args.seed,
                           quick=bool(config.get("quick", False)), with_rna=with_rna)
    print(f"Loaded {len(data)} tiles from {len(data.slides)} slides")

    # condgan/biggan are class-conditional over the tissue CSVs (the reference
    # biggan wiring's n_classes=2 at histopathology_gan.py:224 is its 2 CSVs);
    # sagan is unconditional with step_channels=32 (:235-244)
    conditional = args.gan_type in ("condgan", "biggan")
    num_classes = len(config["path_csv"]) if conditional else 0
    model_cfg = GANModelConfig(
        arch=args.gan_type,
        out_size=int(config.get("img_size", 256)),
        encoding_dims=int(config.get("encoding_dims", 2048)),
        step_channels=int(config.get("step_channels",
                                     32 if args.gan_type in ("condgan", "sagan") else 64)),
        num_classes=num_classes,
        attn_size=int(config.get("attn_size", 32)),
        critic=args.critic,
        compute_dtype=str(config.get("compute_dtype", "bfloat16")),
    )
    vae_model = VAEModelConfig(
        rna_features=int(config.get("rna_features", 19198)),
        z_dim=int(config.get("z_dim", 2048)),
        encoder_dims=tuple(config.get("encoder_dims", (6000, 4000, 2048))),
        decoder_dims=tuple(config.get("decoder_dims", (4000, 6000))),
    )
    cfg = GANConfig(
        model=model_cfg,
        loss_type=args.loss_type,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs or int(config.get("num_epochs", 900)),
        vae=vae_model,
        vae_checkpoint=args.vae_checkpoint or config.get("encoder_checkpoint"),
        compat_reference_gp=args.compat_reference_gp,
        n_critic=args.n_critic,
        adam_mu_dtype=args.adam_mu_dtype,
        g_ema_decay=args.g_ema_decay,
        **({"clip": None} if args.no_clip else {}),
        seed=args.seed,
    )
    trainer = GANTrainer(cfg, image_dir=args.image_dir, model_dir=args.model_dir)
    if with_rna and data.rna is not None and len(data.rna):
        trainer.set_z_population(data.rna)  # bundled for conditioning-preserving generation
    state = trainer.load_model(args.checkpoint) if args.checkpoint else None

    eval_fn = None
    if args.fid_every:
        import jax

        from rnagan_tpu.cli.common import load_inception_extractor
        from rnagan_tpu.eval.fid import calculate_fid
        from rnagan_tpu.eval.generate import generate_images

        extractor = load_inception_extractor(args.inception_weights)
        import numpy as np

        pick = np.random.RandomState(args.seed).choice(
            len(data.images), min(args.fid_images, len(data.images)), replace=False
        )  # images are concatenated per-slide; a head slice would be one slide
        real01 = data.images[pick].astype("float32") / 255.0

        def eval_fn(epoch, st, tr):
            fake = generate_images(tr, st, args.fid_images, jax.random.key(epoch))
            return {"fid": calculate_fid(real01, fake, batch_size=32, extractor=extractor)}

    n_dev = trainer.mesh.devices.size
    batches = PatchBatches(data, batch_size=cfg.batch_size, with_rna=with_rna,
                           with_labels=conditional, seed=args.seed, pad_to=n_dev)
    state, results = trainer.fit(lambda e: batches.epoch(e), state=state,
                                 auto_resume=args.auto_resume,
                                 eval_fn=eval_fn, eval_every=args.fid_every,
                                 keep_best_metric="fid" if eval_fn else None)
    print("Final epoch:", results["history"][-1] if results["history"] else {})
    return results


if __name__ == "__main__":
    main()
