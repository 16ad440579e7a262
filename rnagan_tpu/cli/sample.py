"""Synthetic expression sampling CLI — reference ``src/betaVAE_sample.py``.

Usage:
    python -m rnagan_tpu.cli.sample --config CFG --checkpoint VAE.ckpt \
        --num_samples 100 [--interpolation vectors.pkl --pair 0,1 --alpha 1.0] \
        --save_path samples.pkl
"""

from __future__ import annotations

import argparse
import pickle

from rnagan_tpu.cli.common import dump_pickle, setup_jax


def build_parser():
    p = argparse.ArgumentParser(description="Sample synthetic gene expression from a trained beta-VAE")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--interpolation", type=str, default=None, help="pickle from the interpolate CLI")
    p.add_argument("--pair", type=str, default=None, help="class pair 'a,b' inside the interpolation file")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--save_path", type=str, default="sampled_expression.pkl")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--platform", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    jax = setup_jax(args.platform)

    from rnagan_tpu.core.checkpoint import load_bundle
    from rnagan_tpu.core.config import load_reference_json, vae_config_from_json
    from rnagan_tpu.data.rna import Scaler, load_tissue_splits, normalize_dfs
    from rnagan_tpu.eval.sample import sample_expression
    from rnagan_tpu.models.betavae import BetaVAE

    config = load_reference_json(args.config)
    cfg = vae_config_from_json(config)
    trees, meta = load_bundle(args.checkpoint)
    variables = {"params": trees["params"], "batch_stats": trees["batch_stats"]}

    if "scaler" in trees:
        # the framework's fix: scaler travels with the checkpoint
        scaler = Scaler.from_state_dict(trees["scaler"])
    else:
        # reference fallback: re-fit by re-splitting the CSVs (betaVAE_sample.py:66-96)
        train_df, val_df, test_df, _ = load_tissue_splits(config["path_csv"], seed=args.seed)
        _, _, _, scaler = normalize_dfs(train_df, val_df, test_df)

    direction = None
    if args.interpolation:
        with open(args.interpolation, "rb") as f:
            report = pickle.load(f)
        pair = tuple(int(x) for x in args.pair.split(",")) if args.pair else next(iter(report["difference_vectors"]))
        direction = report["difference_vectors"][pair]

    model = BetaVAE(cfg.model)
    expr = sample_expression(model, variables, scaler, args.num_samples,
                             jax.random.key(args.seed), interpolation=direction, alpha=args.alpha)
    dump_pickle(args.save_path, {"expression": expr, "meta": meta})
    print(f"wrote {args.save_path}: {expr.shape}")
    return expr


if __name__ == "__main__":
    main()
