"""Tile generation utilities (reference ``src/gan_utils.py:197-244`` and
``src/generate_tissue_images.py``).

The reference decodes in chunks of 10 through a rebuilt torchgan trainer
(``gan_utils.py:217-224``); here generation is one jitted program at any batch
size (GANTrainer.sample), and this module handles the surrounding protocol:
[0,1] un-normalization (``gan_utils.py:236-240``), per-patient comparison
grids, and the --random_patient GEO-generalization path
(``generate_tissue_images.py:100-105``) — implementing the *intent* of the
reference's broken two-checkpoint branch (undefined args.vae/args.save_dir,
``generate_tissue_images.py:108,124-126``; SURVEY.md section 2.5).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from rnagan_tpu.utils.images import save_image_grid


def unnormalize(images: np.ndarray) -> np.ndarray:
    """[-1,1] -> [0,1] (mean/std 0.5 inverse, reference ``gan_utils.py:236-240``)."""
    return np.clip(np.asarray(images, np.float32) * 0.5 + 0.5, 0.0, 1.0)


def to_unit_range(images: np.ndarray) -> np.ndarray:
    """Coerce tiles to [0,1] floats by DTYPE, not value heuristics: uint8 ->
    /255; float with negatives -> un-normalize from [-1,1]; else already
    [0,1]. (A min()>=0 uint8 array previously slipped through as 0..255
    floats, saturating grids and inception inputs.)"""
    arr = np.asarray(images)
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    return unnormalize(arr) if arr.min() < 0 else arr


def generate_images(trainer, state, num_images: int, key, gene: Optional[np.ndarray] = None,
                    condition_mode: str = "reference") -> np.ndarray:
    """Generate tiles in [0,1] NHWC. With ``gene`` (one patient's normalized
    expression row), uses the RNA-infused prior (reference ``gan_utils.py:211-224``).

    ``condition_mode``: 'reference' reproduces the reference's per-batch
    standardization — which CANCELS a single patient's broadcast z exactly
    (discovered property, see losses/rna_infusion.infused_noise_population);
    'population' standardizes with training-population z statistics instead,
    preserving the patient signal (needs ``trainer.z_pop``, set via
    ``set_z_population`` or restored from a checkpoint that bundles it)."""
    gene_j = None if gene is None else jax.numpy.asarray(np.atleast_2d(gene))
    z_pop = None
    if gene_j is not None and condition_mode == "population":
        if trainer.z_pop is None:
            raise ValueError(
                "condition_mode='population' needs trainer.z_pop — call "
                "trainer.set_z_population(rna_matrix) or load a checkpoint that bundles it")
        z_pop = trainer.z_pop
    imgs = trainer.sample(state, key, num_images, gene=gene_j, z_pop=z_pop)
    return unnormalize(imgs)


def generate_patient_grid(
    trainer, state, gene: np.ndarray, key, save_path: str, sample_size: int = 64
) -> np.ndarray:
    """The --random_patient path: sample a patient's expression, synthesize,
    save an 8x8 grid (reference ``generate_tissue_images.py:100-105``)."""
    imgs = generate_images(trainer, state, sample_size, key, gene=gene)
    save_image_grid(imgs * 2.0 - 1.0, save_path, nrow=8)
    return imgs


def compare_real_vs_synthetic(
    rna_trainer, rna_state, gan_trainer, gan_state,
    real_tiles: np.ndarray, gene: np.ndarray, key, save_dir: str,
    sample_size: int = 64, prefix: str = "patient",
):
    """Per-patient comparison: real tiles vs RNA-GAN (conditioned) vs
    unconditional GAN (the intent of ``generate_tissue_images.py:106-127``).
    Writes three grids; returns the three [0,1] arrays."""
    os.makedirs(save_dir, exist_ok=True)
    k1, k2 = jax.random.split(key)
    rna_imgs = generate_images(rna_trainer, rna_state, sample_size, k1, gene=gene)
    gan_imgs = generate_images(gan_trainer, gan_state, sample_size, k2)
    real = to_unit_range(real_tiles)
    save_image_grid(real * 2 - 1, os.path.join(save_dir, f"{prefix}_real.png"), nrow=8)
    save_image_grid(rna_imgs * 2 - 1, os.path.join(save_dir, f"{prefix}_rnagan.png"), nrow=8)
    save_image_grid(gan_imgs * 2 - 1, os.path.join(save_dir, f"{prefix}_gan.png"), nrow=8)
    return real, rna_imgs, gan_imgs
