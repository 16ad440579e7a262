"""beta-VAE training CLI — flag surface of reference ``src/betaVAE_training.py``.

Usage (mirrors README.md:41-50 of the reference):
    python -m rnagan_tpu.cli.betavae_train --config configs/betavae_tissues.json [--checkpoint CKPT] [--log]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from rnagan_tpu.cli.common import dump_pickle, setup_jax


def build_parser():
    p = argparse.ArgumentParser(description="betaVAE training on RNA-seq data")
    p.add_argument("--config", type=str, required=True, help="JSON config file")
    p.add_argument("--checkpoint", type=str, default=None, help="checkpoint to resume from")
    p.add_argument("--log", action="store_true", help="enable tensorboard logging")
    p.add_argument("--parallel", action="store_true",
                   help="accepted for reference-CLI parity; the mesh always uses every visible device")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--platform", type=str, default=None, help="force jax platform (e.g. cpu)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_jax(args.platform)

    from rnagan_tpu.core.checkpoint import load_bundle
    from rnagan_tpu.core.config import load_reference_json, vae_config_from_json
    from rnagan_tpu.core.metrics import MetricsLogger
    from rnagan_tpu.data.rna import load_tissue_splits, normalize_dfs, rna_matrix
    from rnagan_tpu.train.vae_trainer import VAETrainer, VAETrainState

    config = load_reference_json(args.config)
    print("-" * 10)
    print("Config for this experiment\n")
    print(config)
    print("-" * 10)

    cfg = vae_config_from_json(config)
    import dataclasses as _dc

    cfg = _dc.replace(cfg, seed=args.seed)
    save_dir = config.get("save_dir", "checkpoints/betavae")

    # per-tissue 64/16/20 split + concat + fit-on-train normalization
    train_df, val_df, test_df, test_labels = load_tissue_splits(
        config["path_csv"], seed=args.seed, quick=bool(config.get("quick", False))
    )
    print(f"Train shape {train_df.shape}\nVal shape {val_df.shape}\nTest shape {test_df.shape}")
    train_df, val_df, test_df, scaler = normalize_dfs(train_df, val_df, test_df, "standard")

    logger = MetricsLogger(
        log_dir=config.get("summary_path") if args.log else None,
        use_tensorboard=args.log,
        run_name=config.get("flag", "betavae"),
    )
    trainer = VAETrainer(cfg, logger=logger)

    state = None
    if args.checkpoint:
        trees, _ = load_bundle(args.checkpoint)
        base = trainer.init_state()
        state = VAETrainState(step=base.step, params=trees["params"],
                              batch_stats=trees["batch_stats"], opt_state=base.opt_state)

    state, results = trainer.fit(
        rna_matrix(train_df), rna_matrix(val_df), save_dir=save_dir, scaler=scaler, state=state
    )
    print(f"Best epoch {results['best_epoch']} best val loss {results['best_loss']}")

    # test eval + inverse-scaler reconstruction dump (reference
    # betaVAE_training.py:190-202)
    test_losses, predictions = trainer.evaluate(rna_matrix(test_df), state)
    print("Test:", test_losses)
    test_results = {
        "predictions": scaler.inverse_transform(predictions),
        "real": scaler.inverse_transform(rna_matrix(test_df)),
        "test_ids": test_df["wsi_file_name"].values if "wsi_file_name" in test_df else np.arange(len(test_df)),
        "test_labels": np.asarray(test_labels),
    }
    dump_pickle(os.path.join(save_dir, "test_results.pkl"), test_results)
    return results


if __name__ == "__main__":
    main()
