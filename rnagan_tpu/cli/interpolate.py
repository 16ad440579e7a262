"""Latent interpolation CLI — reference ``src/betaVAE_interpolation.py``:
class-centroid latent difference vectors (tissue-vs-tissue by default, or any
label column such as GTEx sex) + shifted reconstructions, pickled.

Usage:
    python -m rnagan_tpu.cli.interpolate --config CFG --checkpoint VAE.ckpt \
        [--label_column sex --phenotype_csv pheno.csv] --save_path interp.pkl
"""

from __future__ import annotations

import argparse

import numpy as np

from rnagan_tpu.cli.common import dump_pickle, setup_jax


def build_parser():
    p = argparse.ArgumentParser(description="Latent-space interpolation analysis")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--label_column", type=str, default=None,
                   help="column in --phenotype_csv to group by (default: tissue id per CSV)")
    p.add_argument("--phenotype_csv", type=str, default=None,
                   help="joins on wsi_file_name (the GTEx male/female path, "
                        "reference betaVAE_interpolation.py:156-209)")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--save_path", type=str, default="interpolation.pkl")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--platform", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_jax(args.platform)
    import pandas as pd

    from rnagan_tpu.core.checkpoint import load_bundle
    from rnagan_tpu.core.config import load_reference_json, vae_config_from_json
    from rnagan_tpu.data.rna import normalize_dfs, rna_matrix
    from rnagan_tpu.eval.interpolate import interpolation_report
    from rnagan_tpu.models.betavae import BetaVAE

    config = load_reference_json(args.config)
    cfg = vae_config_from_json(config)
    trees, _ = load_bundle(args.checkpoint)
    variables = {"params": trees["params"], "batch_stats": trees["batch_stats"]}

    frames, labels = [], []
    for tissue_id, csv_path in enumerate(config["path_csv"]):
        df = pd.read_csv(csv_path)
        frames.append(df)
        labels += [tissue_id] * len(df)
    data_df = pd.concat(frames, ignore_index=True)
    labels = np.asarray(labels)

    if args.label_column and args.phenotype_csv:
        pheno = pd.read_csv(args.phenotype_csv)
        merged = data_df.merge(pheno[["wsi_file_name", args.label_column]], on="wsi_file_name")
        labels = pd.factorize(merged[args.label_column])[0]
        data_df = merged

    data_df, _, _, _ = normalize_dfs(data_df)
    model = BetaVAE(cfg.model)
    report = interpolation_report(model, variables, rna_matrix(data_df), labels, alpha=args.alpha)
    dump_pickle(args.save_path, report)
    print(f"wrote {args.save_path}: {len(report['difference_vectors'])} difference vectors")
    return report


if __name__ == "__main__":
    main()
