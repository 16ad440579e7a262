"""Visual conditioning evidence: a patients x noise panel per checkpoint.

The round-5 headline (docs/quality/REPRESENTATION.md) is numeric: the
projection-critic RNA-GAN moves from chance to 6x-chance own-patient
identity and 0.94 same-tissue transfer. This renders the *visible* version
of the same experiment, the panel the reference's qualitative figures imply
(reference ``generate_tissue_images.py:106-127`` compares real vs RNA-GAN
vs GAN per patient):

  rows    = patients (first column: that patient's real held-out tile),
  columns = SHARED noise draws (same key for every row, so within a column
            the ONLY varying input is the patient's expression z).

With a conditioning generator, rows differ (patient morphology dominates);
with an unconditional-critic generator, columns dominate (noise decides the
tile, patient rows look alike). Runs entirely on CPU from the committed
q_ab checkpoints — no TPU needed.

Usage:
  python tools/conditioning_panel.py --workdir runs/q_ab \
      --out docs/quality/grids
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="runs/q_ab")
    p.add_argument("--slides", type=int, default=100)
    p.add_argument("--tiles_per_slide", type=int, default=300)
    p.add_argument("--genes", type=int, default=19198)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--corpus_seed", type=int, default=0)
    p.add_argument("--patients", type=int, default=6)
    p.add_argument("--noise_cols", type=int, default=5)
    p.add_argument("--platform", default="cpu")
    p.add_argument("--arms", default="wganvae_proj:projection,wganvae:unconditional",
                   help="comma list of <ckpt_basename>:<critic> panels to render")
    p.add_argument("--out", default="docs/quality/grids")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from quality_run import build_corpus, normalized_expression
    from representation_run import pick_ckpt

    from rnagan_tpu.core.checkpoint import load_bundle
    from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
    from rnagan_tpu.eval.generate import generate_images
    from rnagan_tpu.train.gan_trainer import GANTrainer
    from rnagan_tpu.utils.images import save_image_grid

    corpus = build_corpus(args)
    expr_norm, _ = normalized_expression(corpus)
    trees, _ = load_bundle(os.path.join(args.workdir, "vae_pretrain.msgpack"))
    vae_cfg = VAEModelConfig(rna_features=args.genes, compute_dtype="bfloat16")

    import jax.numpy as jnp

    def real_tile(i: int) -> np.ndarray:  # one held-out tile, uint8
        sl = jnp.full((1,), i, jnp.int32)
        ti = jnp.full((1,), corpus.tiles_per_slide, jnp.int32)  # first held-out index
        img = np.asarray(corpus.render(sl, ti))  # [-1, 1]
        return np.clip(np.round((img * 0.5 + 0.5) * 255.0), 0, 255).astype(np.uint8)[0]

    zkey = jax.random.key(77)  # same key as the z-sensitivity diagnostic
    for arm in args.arms.split(","):
        name, critic = arm.split(":")
        cfg = GANConfig(model=GANModelConfig(out_size=args.size, encoding_dims=vae_cfg.z_dim,
                                             critic=critic),
                        loss_type="wganvae", vae=vae_cfg)
        trainer = GANTrainer(cfg, vae_variables=trees["vae"])
        state = trainer.load_model(pick_ckpt(args.workdir, name))
        trainer.set_z_population(expr_norm)
        rows = []
        for i in range(args.patients):
            fakes = generate_images(trainer, state, args.noise_cols, zkey,
                                    gene=expr_norm[i], condition_mode="population")
            fakes = np.clip(np.round(fakes * 255.0), 0, 255).astype(np.uint8)  # [0,1] -> uint8
            rows.append(np.concatenate([real_tile(i)[None], fakes], axis=0))
        panel = np.concatenate(rows, axis=0)
        path = os.path.join(args.out, f"{name}_patient_panel.jpg")
        save_image_grid(panel, path, nrow=args.noise_cols + 1)
        print(f"[panel] {path}: {args.patients} patients x (1 real + "
              f"{args.noise_cols} shared-noise fakes), critic={critic}", flush=True)


if __name__ == "__main__":
    main()
