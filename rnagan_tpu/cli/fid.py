"""FID evaluation CLI — the reference ``src/fid.py:235-330`` surface:
real-vs-fake (default), with the 5-repetition mean +/- std protocol.

Usage:
    python -m rnagan_tpu.cli.fid --config CFG --checkpoint GAN.model \
        [--vae VAE.ckpt --patient1 GTEX-XXX] [--inception_weights pth]
"""

from __future__ import annotations

import argparse

import numpy as np

from rnagan_tpu.cli.common import load_gan_dataframe, setup_jax


def build_parser():
    p = argparse.ArgumentParser(description="FID between real tiles and GAN samples")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--vae", type=str, default=None)
    p.add_argument("--patient1", type=str, default=None, help="condition on this patient")
    p.add_argument("--num_images", type=int, default=600)
    p.add_argument("--repetitions", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_patches", type=int, default=200)
    p.add_argument("--inception_weights", type=str, default=None,
                   help="torchvision inception_v3 state_dict (.pt) for metric parity; "
                        "without it features come from a fixed random init (pipeline-"
                        "valid, NOT comparable to published FID numbers)")
    p.add_argument("--gan_type", type=str, default=None,
                   help="architecture of the checkpoint(s); defaults to the config key or dcgan")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--platform", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    jax = setup_jax(args.platform)

    from rnagan_tpu.core.config import load_reference_json
    from rnagan_tpu.data.patches import load_patch_data
    from rnagan_tpu.data.rna import Scaler, log_transform, rna_columns
    from rnagan_tpu.eval.fid import InceptionExtractor, fid_repetitions
    from rnagan_tpu.eval.generate import generate_images
    from rnagan_tpu.cli.generate import _load_trainer

    cfg_json = load_reference_json(args.config)
    trainer, state = _load_trainer(cfg_json, args.checkpoint, args.vae, args)

    df = load_gan_dataframe(cfg_json)
    gene = None
    if args.vae:
        cols = rna_columns(df)
        vals = log_transform(df[cols].values)
        df[cols] = Scaler.fit(vals, "standard").transform(vals)

    if args.patient1:
        # per-patient protocol: real side = that patient's own tiles
        # (reference load_images_from_patient, gan_utils.py:120-195)
        from rnagan_tpu.data.patches import patient_tiles

        tiles, rna = patient_tiles(df, args.patient1, args.num_images, seed=args.seed)
        real01 = tiles.astype(np.float32) / 255.0
        gene = rna if args.vae else None
    else:
        data = load_patch_data(df, max_patches_total=args.num_patches, seed=args.seed)
        real01 = data.images[: args.num_images].astype(np.float32) / 255.0
    print(f"real set: {len(real01)} tiles")

    from rnagan_tpu.cli.common import load_inception_extractor

    extractor = load_inception_extractor(args.inception_weights)

    def gen(rep):
        key = jax.random.fold_in(jax.random.key(args.seed), rep)
        return generate_images(trainer, state, args.num_images, key,
                               gene=None if gene is None else jax.numpy.asarray(gene))

    mean, std, fids = fid_repetitions(real01, gen, n_reps=args.repetitions,
                                      batch_size=args.batch_size, extractor=extractor)
    print(f"FID: {mean:.4f} +/- {std:.4f}  (reps: {[round(f, 4) for f in fids]})")
    return mean, std


if __name__ == "__main__":
    main()
