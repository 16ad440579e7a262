"""Export a native GAN bundle to the reference's torchgan ``.model`` format
(and back): checkpoint-format parity so artifacts flow both ways between this
framework and the PyTorch reference (reference ``histopathology_gan.py:298-312``,
``gan_utils.py:246-297``).

Usage:
    python -m rnagan_tpu.cli.export_torch --config CFG \
        --checkpoint gan_last.model --out rna-gan_brain.model [--epoch N]
"""

from __future__ import annotations

import argparse

from rnagan_tpu.cli.common import setup_jax


def build_parser():
    p = argparse.ArgumentParser(description="Convert GAN checkpoints to/from torchgan .model format")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True,
                   help="source checkpoint (native msgpack bundle or torch .model)")
    p.add_argument("--out", type=str, required=True,
                   help="destination path; .model torch export unless --to_native")
    p.add_argument("--to_native", action="store_true", default=False,
                   help="convert a torch .model INTO a native bundle instead")
    p.add_argument("--epoch", type=int, default=0, help="epoch stamp for the torch bundle")
    p.add_argument("--gan_type", type=str, default=None)
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--platform", type=str, default="cpu")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    jax = setup_jax(args.platform)

    from rnagan_tpu.cli.generate import _load_trainer
    from rnagan_tpu.core.config import load_reference_json
    from rnagan_tpu.models.dcgan_torch import export_torchgan_bundle

    cfg_json = load_reference_json(args.config)
    # _load_trainer's GANTrainer.load_model sniffs both formats
    trainer, state = _load_trainer(cfg_json, args.checkpoint, None, args)

    if args.to_native:
        trainer.save_model(state, args.out, {"converted_from": args.checkpoint})
        print(f"native bundle written: {args.out}")
    else:
        export_torchgan_bundle(args.out, trainer.cfg, jax.device_get(state), epoch=args.epoch)
        print(f"torchgan .model written: {args.out}")
    return args.out


if __name__ == "__main__":
    main()
