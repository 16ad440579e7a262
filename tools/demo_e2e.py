"""End-to-end demo of the whole framework on synthetic data (no downloads).

Covers the full reference workflow (docs/WORKFLOWS.md) in miniature:
  1. synthesize H&E-like slides + GTEx-layout expression CSVs
  2. tile slides into reference-format LMDB databases (native store)
  3. train the beta-VAE (CLI), bundle scaler
  4. train RNA-GAN (wganvae) on the tiles conditioned on the VAE (CLI)
  5. generate patient-conditioned tiles (both condition modes)
  6. FID repetitions real-vs-synthetic
  7. latent interpolation + expression sampling
  8. downstream tile classification (CV)

Runs on CPU in a few minutes:  python tools/demo_e2e.py [workdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(workdir: str = "/tmp/rnagan_demo"):
    import jax

    if jax.devices()[0].platform not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")
    import pandas as pd
    from PIL import Image

    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    rng = np.random.RandomState(0)
    genes = 24

    # -- 1. synthetic slides + expression CSVs ------------------------------
    print("== 1. synthesizing slides + expression CSVs")
    os.makedirs("wsi", exist_ok=True)
    csvs = []
    yy, xx = np.mgrid[0:384, 0:512]
    for t in range(2):
        rows = []
        for i in range(4):
            name = f"GTEX-T{t}-{i:04d}"
            img = np.full((384, 512, 3), 245, np.uint8)
            for _ in range(6):
                cx, cy, r = rng.randint(0, 512), rng.randint(0, 384), rng.randint(60, 120)
                blob = (xx - cx) ** 2 + (yy - cy) ** 2 < r**2
                img[blob] = np.stack(
                    [rng.randint(150, 220, blob.sum()), rng.randint(60, 120, blob.sum()),
                     rng.randint(140, 200, blob.sum())], -1).astype(np.uint8)
            Image.fromarray(img).save(f"wsi/{name}.png")
            expr = rng.gamma(2.0, 30.0, genes)
            expr[rng.rand(genes) < 0.2] = 0
            rows.append({"wsi_file_name": name, **{f"rna_ENSG{g:04d}": expr[g] for g in range(genes)}})
        p = f"tissue{t}.csv"
        pd.DataFrame(rows).to_csv(p, index=False)
        csvs.append(p)

    # -- 2. tile into reference-format LMDB databases ------------------------
    print("== 2. tiling slides (native LMDB/LZ4 store)")
    from rnagan_tpu.cli import tile as tile_cli

    tile_cli.main(["--wsi_path", "wsi", "--patch_path", "tiles", "--mask_path", "masks",
                   "--patch_size", "32", "--max_patches_per_slide", "24"])

    # -- 3. beta-VAE ----------------------------------------------------------
    print("== 3. training the beta-VAE")
    json.dump({"path_csv": csvs, "rna_features": genes, "z_dim": 16,
               "encoder_dims": [24, 16], "decoder_dims": [24], "lr": 1e-3,
               "weights_decay": 0, "num_epochs": 3, "batch_size": 8, "beta": 5e-4,
               "optimizer": "Adam", "log_interval": 10, "save_dir": "vae_ckpt",
               "summary_path": "sums"}, open("vae.json", "w"))
    from rnagan_tpu.cli import betavae_train

    vae_results = betavae_train.main(["--config", "vae.json"])
    print(f"   best epoch {vae_results['best_epoch']}")

    # -- 4. RNA-GAN -----------------------------------------------------------
    print("== 4. training RNA-GAN (wganvae)")
    json.dump({"path_csv": csvs, "patch_data_path": ["tiles", "tiles"], "img_size": 32,
               "encoding_dims": 16, "step_channels": 8, "compute_dtype": "float32",
               "rna_features": genes, "z_dim": 16, "encoder_dims": [24, 16],
               "decoder_dims": [24], "max_patch_per_wsi": 24, "num_epochs": 2},
              open("gan.json", "w"))
    from rnagan_tpu.cli import gan_train

    gan_results = gan_train.main([
        "--config", "gan.json", "--image_dir", "images", "--model_dir", "gan_ckpt",
        "--num_epochs", "2", "--num_patches", "24", "--gan_type", "dcgan",
        "--loss_type", "wganvae", "--vae_checkpoint", "vae_ckpt/model_best.ckpt",
        "--batch_size", "16",
    ])
    print(f"   last epoch: " + " ".join(f"{k}={v:.3f}" for k, v in gan_results["history"][-1].items()
                                        if k in ("d_loss", "g_loss", "gp")))

    # -- 5. conditional generation -------------------------------------------
    print("== 5. generating patient-conditioned tiles")
    from rnagan_tpu.cli import generate as generate_cli

    for mode in ("reference", "population"):
        generate_cli.main([
            "--config", "gan.json", "--checkpoint", "gan_ckpt/gan_last.model",
            "--vae", "vae_ckpt/model_best.ckpt", "--rna_file", csvs[0],
            "--random_patient", "--sample_size", "16", "--condition_mode", mode,
            "--save_path", f"generated_{mode}.png",
        ])
    print("   wrote generated_reference.png / generated_population.png")

    # -- 6. FID ----------------------------------------------------------------
    print("== 6. FID (real vs synthetic, 2 repetitions)")
    from rnagan_tpu.cli import fid as fid_cli

    mean, std = fid_cli.main([
        "--config", "gan.json", "--checkpoint", "gan_ckpt/gan_last.model",
        "--vae", "vae_ckpt/model_best.ckpt", "--num_images", "16",
        "--repetitions", "2", "--batch_size", "8", "--num_patches", "16",
    ])

    # -- 7. interpolation + sampling -------------------------------------------
    print("== 7. latent interpolation + expression sampling")
    from rnagan_tpu.cli import interpolate as interp_cli, sample as sample_cli

    interp_cli.main(["--config", "vae.json", "--checkpoint", "vae_ckpt/model_best.ckpt",
                     "--save_path", "interp.pkl"])
    sample_cli.main(["--config", "vae.json", "--checkpoint", "vae_ckpt/model_best.ckpt",
                     "--num_samples", "5", "--interpolation", "interp.pkl",
                     "--save_path", "expr.pkl"])

    # -- 8. downstream classification ------------------------------------------
    print("== 8. downstream tile classification (2-fold CV)")
    from rnagan_tpu.data.patches import load_patch_data
    from rnagan_tpu.models.resnet import BasicBlock, ResNet
    from rnagan_tpu.train.ml_experiment import MLConfig, run_cv_experiment

    df = pd.concat([pd.read_csv(c).assign(patch_data_path="tiles", labels=i) for i, c in enumerate(csvs)],
                   ignore_index=True)
    data = load_patch_data(df, max_patches_total=12)
    cfg = MLConfig(num_epochs=1, folds=2, batch_size=16, image_size=32)
    tiny = ResNet(BasicBlock, (1, 1, 1, 1), num_classes=2, compute_dtype="float32")
    trainer_results = run_cv_experiment(
        data.images.astype(np.float32) / 255.0, data.labels.astype(np.int64), cfg, model=tiny
    )
    print(f"   CV accuracy {trainer_results['mean_accuracy']:.3f}")

    print("\nDEMO COMPLETE —", workdir)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/rnagan_demo"]))
