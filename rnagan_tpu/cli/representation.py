"""Per-patient representation CLI — reference ``src/compute_representation.py``:
mean inception activations of real / RNA-GAN / GAN tiles per patient, saved
as .npy matrices.

Usage:
    python -m rnagan_tpu.cli.representation --config CFG \
        --checkpoint RNA_GAN.model --checkpoint2 GAN.model --vae VAE.ckpt \
        --save_dir representations/
"""

from __future__ import annotations

import argparse

import numpy as np

from rnagan_tpu.cli.common import load_gan_dataframe, setup_jax


def build_parser():
    p = argparse.ArgumentParser(description="Per-patient representation analysis")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True, help="RNA-GAN bundle")
    p.add_argument("--checkpoint2", type=str, required=True, help="unconditional GAN bundle")
    p.add_argument("--vae", type=str, required=True)
    p.add_argument("--tiles_per_patient", type=int, default=64)
    p.add_argument("--max_patients", type=int, default=None)
    p.add_argument("--num_patches", type=int, default=64)
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--condition_mode", choices=["reference", "population"], default="reference",
                   help="RNA-GAN generation infusion: reference = the reference's per-batch "
                        "standardization (cancels a single patient's z — discovered property); "
                        "population = conditioning-preserving (z-population statistics)")
    p.add_argument("--save_dir", type=str, default="representations")
    p.add_argument("--gan_type", type=str, default=None,
                   help="architecture of the checkpoint(s); defaults to the config key or dcgan")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--platform", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    jax = setup_jax(args.platform)

    from rnagan_tpu.cli.generate import _load_trainer
    from rnagan_tpu.core.config import load_reference_json
    from rnagan_tpu.data.patches import load_patch_data
    from rnagan_tpu.data.rna import Scaler, log_transform, rna_columns
    from rnagan_tpu.eval.fid import InceptionExtractor
    from rnagan_tpu.eval.representation import compute_representations

    cfg_json = load_reference_json(args.config)
    rna_trainer, rna_state = _load_trainer(cfg_json, args.checkpoint, args.vae, args)
    gan_trainer, gan_state = _load_trainer(cfg_json, args.checkpoint2, None, args)

    df = load_gan_dataframe(cfg_json)
    cols = rna_columns(df)
    vals = log_transform(df[cols].values)
    df[cols] = Scaler.fit(vals, "standard").transform(vals)

    data = load_patch_data(df, max_patches_total=args.num_patches, seed=args.seed, with_rna=True)
    patients = data.slides[: args.max_patients] if args.max_patients else data.slides

    def real_tiles(patient):
        sid = data.slides.index(patient)
        tiles = data.images[data.slide_idx == sid][: args.tiles_per_patient]
        return tiles.astype(np.float32) / 255.0

    def gene(patient):
        return data.rna[data.slides.index(patient)][None, :]

    from rnagan_tpu.cli.common import load_inception_extractor

    if args.condition_mode == "population" and rna_trainer.z_pop is None:
        # checkpoint didn't bundle z-population stats: derive them from the
        # run's own (normalized) expression matrix
        rna_trainer.set_z_population(data.rna)

    reps = compute_representations(
        patients, real_tiles, gene, rna_trainer, rna_state, gan_trainer, gan_state,
        key=jax.random.key(args.seed), tiles_per_patient=args.tiles_per_patient,
        extractor=load_inception_extractor(args.inception_weights), save_dir=args.save_dir,
        condition_mode=args.condition_mode,
    )
    print(f"wrote {args.save_dir}/representations_{{real,rnagan,gan}}.npy "
          f"({len(patients)} patients x 2048)")
    return reps


if __name__ == "__main__":
    main()
