"""``rnagan`` dispatcher: one entry point over the per-task CLIs, each of
which mirrors a reference script's flag surface (SURVEY.md section 3)."""

from __future__ import annotations

import sys

COMMANDS = {
    "betavae-train": ("rnagan_tpu.cli.betavae_train", "betaVAE training (betaVAE_training.py)"),
    "gan-train": ("rnagan_tpu.cli.gan_train", "GAN / RNA-GAN training (histopathology_gan.py)"),
    "generate": ("rnagan_tpu.cli.generate", "tile synthesis (generate_tissue_images.py)"),
    "fid": ("rnagan_tpu.cli.fid", "FID evaluation (fid.py)"),
    "sample": ("rnagan_tpu.cli.sample", "expression sampling (betaVAE_sample.py)"),
    "interpolate": ("rnagan_tpu.cli.interpolate", "latent interpolation (betaVAE_interpolation.py)"),
    "representation": ("rnagan_tpu.cli.representation", "per-patient representations (compute_representation.py)"),
    "ml-experiment": ("rnagan_tpu.cli.ml_experiment", "downstream classification (ml_experiments.py)"),
    "tile": ("rnagan_tpu.cli.tile", "WSI preprocessing (patch_gen_grid.py)"),
    "export-torch": ("rnagan_tpu.cli.export_torch", "GAN checkpoint <-> torchgan .model conversion"),
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: rnagan <command> [args]\n\ncommands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:16s} {desc}")
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}")
        return 2
    import importlib

    module = importlib.import_module(COMMANDS[cmd][0])
    # command mains return their results for programmatic use; the process
    # exit code must stay 0/!=0, so don't propagate them to sys.exit
    module.main(argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
