"""Conditional tile synthesis CLI — the reference
``src/generate_tissue_images.py`` surface, with its broken two-checkpoint
branch implemented as intended (undefined args at reference ``:108,124-126``).

Usage:
    python -m rnagan_tpu.cli.generate --config CFG --checkpoint GAN.model \
        --vae VAE.ckpt --rna_file expr.csv --random_patient --sample_size 64 \
        --save_path out.png
    # or per-patient comparison:
    ... --checkpoint RNA_GAN.model --checkpoint2 GAN.model --patient GTEX-XXX --save_dir out/
"""

from __future__ import annotations

import argparse

import numpy as np

from rnagan_tpu.cli.common import setup_jax


def build_parser():
    p = argparse.ArgumentParser(description="Generate tissue tiles from a trained GAN / RNA-GAN")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True, help="RNA-GAN .model bundle")
    p.add_argument("--checkpoint2", type=str, default=None, help="unconditional GAN bundle for comparison")
    p.add_argument("--vae", type=str, default=None,
                   help="beta-VAE checkpoint (required for RNA-GAN/wganvae bundles; "
                        "omit to sample a plain-GAN checkpoint unconditionally)")
    p.add_argument("--rna_file", type=str, default=None, help="CSV with rna_ columns (e.g. GEO data)")
    p.add_argument("--random_patient", action="store_true", help="sample one row from --rna_file")
    p.add_argument("--patient", type=str, default=None, help="wsi_file_name to condition on")
    p.add_argument("--gan_type", type=str, default=None,
                   help="architecture of the checkpoint (dcgan | dcgan_up | condgan | "
                        "sagan | biggan); defaults to the config's gan_type key or dcgan")
    p.add_argument("--sample_size", type=int, default=64)
    p.add_argument("--save_path", type=str, default="generated.png")
    p.add_argument("--save_dir", type=str, default="generated")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--condition_mode", choices=["reference", "population"], default="reference",
                   help="reference = exact parity (batch standardization cancels a single "
                        "patient's z, see losses/rna_infusion.py); population = conditioning-preserving")
    p.add_argument("--platform", type=str, default=None)
    return p


def _load_trainer(cfg_json, ckpt, vae_path, args):
    from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
    from rnagan_tpu.train.gan_trainer import GANTrainer

    arch = getattr(args, "gan_type", None) or cfg_json.get("gan_type", "dcgan")
    num_classes = len(cfg_json.get("path_csv", ())) if arch in ("condgan", "biggan") else 0
    model_cfg = GANModelConfig(
        arch=arch,
        out_size=int(cfg_json.get("img_size", 256)),
        encoding_dims=int(cfg_json.get("encoding_dims", 2048)),
        step_channels=int(cfg_json.get("step_channels",
                                       32 if arch in ("condgan", "sagan") else 64)),
        num_classes=num_classes,
        attn_size=int(cfg_json.get("attn_size", 32)),
        compute_dtype=str(cfg_json.get("compute_dtype", "bfloat16")),
    )
    cfg = GANConfig(
        model=model_cfg,
        loss_type="wganvae" if vae_path else "wgan",
        vae=VAEModelConfig(
            rna_features=int(cfg_json.get("rna_features", 19198)),
            z_dim=int(cfg_json.get("z_dim", 2048)),
            encoder_dims=tuple(cfg_json.get("encoder_dims", (6000, 4000, 2048))),
            decoder_dims=tuple(cfg_json.get("decoder_dims", (4000, 6000))),
        ),
        vae_checkpoint=vae_path,
        seed=args.seed,
    )
    trainer = GANTrainer(cfg)
    return trainer, trainer.load_model(ckpt)


def main(argv=None):
    args = build_parser().parse_args(argv)
    jax = setup_jax(args.platform)
    import pandas as pd

    from rnagan_tpu.core.config import load_reference_json
    from rnagan_tpu.data.rna import log_transform, rna_columns, Scaler
    from rnagan_tpu.eval.generate import generate_patient_grid
    from rnagan_tpu.losses.rna_infusion import z_population_stats

    cfg_json = load_reference_json(args.config)
    trainer, state = _load_trainer(cfg_json, args.checkpoint, args.vae, args)

    rna_df = pd.read_csv(args.rna_file) if args.rna_file else None
    gene = None
    z_pop = None
    if rna_df is not None:
        cols = rna_columns(rna_df)
        vals = log_transform(rna_df[cols].values)
        scaler = Scaler.fit(vals, "standard")
        normed = scaler.transform(vals)
        if args.random_patient:
            row = np.random.RandomState(args.seed).randint(len(normed))
        elif args.patient is not None:
            row = int(np.flatnonzero(rna_df["wsi_file_name"].values == args.patient)[0])
        else:
            row = 0
        gene = normed[row : row + 1]
        if args.condition_mode == "population":
            # prefer stats bundled at training time; else compute from the CSV
            z_pop = trainer.z_pop or z_population_stats(trainer.vae, trainer.vae_variables, normed)

    key = jax.random.key(args.seed)
    if z_pop is not None:
        imgs = trainer.sample(state, key, args.sample_size,
                              gene=jax.numpy.asarray(gene), z_pop=z_pop) * 0.5 + 0.5
        from rnagan_tpu.utils.images import save_image_grid

        save_image_grid(imgs * 2 - 1, args.save_path, nrow=8)
    else:
        imgs = generate_patient_grid(trainer, state, gene, key, args.save_path,
                                     sample_size=args.sample_size)
    print(f"wrote {args.save_path} ({imgs.shape[0]} tiles)")

    if args.checkpoint2:
        from rnagan_tpu.eval.generate import compare_real_vs_synthetic

        gan_trainer, gan_state = _load_trainer(cfg_json, args.checkpoint2, None, args)
        # real tiles unavailable in this CLI mode -> compare synthetic pair only
        real = np.zeros((args.sample_size,) + imgs.shape[1:], np.float32)
        compare_real_vs_synthetic(trainer, state, gan_trainer, gan_state, real, gene,
                                  jax.random.fold_in(key, 1), args.save_dir,
                                  sample_size=args.sample_size)
        print(f"wrote comparison grids to {args.save_dir}")
    return imgs


if __name__ == "__main__":
    main()
