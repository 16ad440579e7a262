"""Downstream classification CLI — reference ``src/ml_experiments.py``
(GBM vs LUAD tiles, 5-fold CV), made runnable (the reference script has a
syntax error and missing imports; SURVEY.md 2.5).

Usage:
    python -m rnagan_tpu.cli.ml_experiment --csv ref_files/wsi_tiles_real.csv \
        [--synthetic_dir gen_tiles/] [--backbone_weights resnet50.pt] \
        --save_path experiment.pkl
"""

from __future__ import annotations

import argparse

import numpy as np

from rnagan_tpu.cli.common import dump_pickle, setup_jax


def build_parser():
    p = argparse.ArgumentParser(description="GBM vs LUAD tile classification, 5-fold CV")
    p.add_argument("--csv", type=str, required=True,
                   help="CSV of tile paths + labels (wsi_tiles_real.csv format)")
    p.add_argument("--path_column", type=str, default="wsi_file_name")
    p.add_argument("--label_column", type=str, default="label")
    p.add_argument("--test_csv", type=str, default=None, help="held-out test tiles")
    p.add_argument("--num_epochs", type=int, default=40)
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--arch", type=str, default="resnet50",
                   help="resnet18|34|50|101|152")
    p.add_argument("--backbone_weights", type=str, default=None,
                   help="torch state_dict (.pt) for the pretrained path "
                        "(ResnetSSL / --use_pretrain, reference ml_experiments.py:286-295)")
    p.add_argument("--max_tiles", type=int, default=None)
    p.add_argument("--save_path", type=str, default="gbmvsluad_experiment_test.pkl")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--platform", type=str, default=None)
    return p


def _load_tiles_csv(csv_path, path_col, label_col, image_size, max_tiles, seed):
    import pandas as pd
    from PIL import Image

    df = pd.read_csv(csv_path)
    if max_tiles:
        df = df.sample(min(len(df), max_tiles), random_state=seed)
    labels, classes = pd.factorize(df[label_col])
    images = np.zeros((len(df), image_size, image_size, 3), np.float32)
    for i, p in enumerate(df[path_col].values):
        img = Image.open(p).convert("RGB").resize((image_size, image_size))
        images[i] = np.asarray(img, np.float32) / 255.0
    return images, labels.astype(np.int64), list(classes)


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_jax(args.platform)

    from rnagan_tpu.models import resnet as resnet_mod
    from rnagan_tpu.train.ml_experiment import MLConfig, run_cv_experiment

    images, labels, classes = _load_tiles_csv(
        args.csv, args.path_column, args.label_column, args.image_size, args.max_tiles, args.seed
    )
    print(f"{len(images)} tiles, classes: {classes}")

    test_images = test_labels = None
    if args.test_csv:
        test_images, test_labels, _ = _load_tiles_csv(
            args.test_csv, args.path_column, args.label_column, args.image_size, args.max_tiles, args.seed
        )

    backbone_variables = None
    if args.backbone_weights:
        import torch

        model = getattr(resnet_mod, args.arch)(num_classes=len(classes))
        sd = torch.load(args.backbone_weights, map_location="cpu", weights_only=True)
        backbone_variables = resnet_mod.params_from_torch_state_dict(
            model, {k: v.numpy() for k, v in sd.items()}
        )

    cfg = MLConfig(num_classes=len(classes), num_epochs=args.num_epochs, folds=args.folds,
                   batch_size=args.batch_size, image_size=args.image_size, lr=args.lr, seed=args.seed)
    results = run_cv_experiment(images, labels, cfg, test_images01=test_images,
                                test_labels=test_labels, backbone_variables=backbone_variables)
    print(f"mean accuracy {results['mean_accuracy']:.4f} | mean weighted F1 {results['mean_weighted_f1']:.4f}")
    dump_pickle(args.save_path, {**results, "classes": classes})
    return results


if __name__ == "__main__":
    main()
