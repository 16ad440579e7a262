"""Per-patient representation analysis (reference ``src/compute_representation.py``).

For every patient: inception activations of (a) real tiles, (b) RNA-GAN tiles
conditioned on that patient's expression, (c) unconditional GAN tiles; each
set reduced to its mean activation vector; stacked per-source matrices saved
as ``.npy`` (reference ``compute_representation.py:29-101,149-170``)."""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import jax
import numpy as np

from rnagan_tpu.eval.fid import InceptionExtractor
from rnagan_tpu.eval.generate import generate_images, to_unit_range


def mean_activation(images01: np.ndarray, extractor: InceptionExtractor, batch_size: int = 64) -> np.ndarray:
    """Mean 2048-d inception activation of an image set ([0,1] NHWC)."""
    return extractor(images01, batch_size).mean(axis=0)


def compute_representations(
    patients: Sequence[str],
    real_tiles_fn: Callable[[str], np.ndarray],
    gene_fn: Callable[[str], np.ndarray],
    rna_trainer, rna_state,
    gan_trainer, gan_state,
    *,
    key,
    tiles_per_patient: int = 64,
    extractor: Optional[InceptionExtractor] = None,
    save_dir: Optional[str] = None,
    condition_mode: str = "reference",
) -> Dict[str, np.ndarray]:
    """Returns {'real': (P,2048), 'rnagan': (P,2048), 'gan': (P,2048)} and
    optionally writes the three ``.npy`` files the reference produces
    (``compute_representation.py:168-170``). ``condition_mode`` selects the
    RNA-GAN generation-time infusion: 'population' preserves per-patient
    conditioning; 'reference' reproduces the reference's batch
    standardization, which cancels it (see eval/generate.generate_images)."""
    extractor = extractor or InceptionExtractor()
    reps = {"real": [], "rnagan": [], "gan": []}
    for i, patient in enumerate(patients):
        k = jax.random.fold_in(key, i)
        k1, k2 = jax.random.split(k)
        real = real_tiles_fn(patient)
        real01 = to_unit_range(real)
        gene = gene_fn(patient)
        rna_imgs = generate_images(rna_trainer, rna_state, tiles_per_patient, k1, gene=gene,
                                   condition_mode=condition_mode)
        gan_imgs = generate_images(gan_trainer, gan_state, tiles_per_patient, k2)
        reps["real"].append(mean_activation(real01, extractor))
        reps["rnagan"].append(mean_activation(rna_imgs, extractor))
        reps["gan"].append(mean_activation(gan_imgs, extractor))
    out = {k: np.stack(v) for k, v in reps.items()}
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        for name, arr in out.items():
            np.save(os.path.join(save_dir, f"representations_{name}.npy"), arr)
    return out


def distance_statistics(real_reps: np.ndarray, fake_reps: np.ndarray,
                        labels: Optional[np.ndarray] = None) -> Dict[str, float]:
    """Patient-identity statistics between per-patient mean-activation
    matrices (both (P, D), row i = patient i).

    The reference's conditioning claim (``compute_representation.py:149-170``)
    is that RNA-GAN tiles generated from patient i's expression should sit
    closer to patient i's REAL tiles than to other patients' in inception
    feature space. Distances are whitened by the real set's per-dimension
    mean/std — one affine map applied to every source, so ranks within a
    source are unchanged but scales stay comparable across feature seeds.

    Returns:
      frac_own_patient_closest — P(argmin_j ||fake_i - real_j|| == i);
        chance level is 1/P (an unconditional generator lands there).
      mean_margin_vs_median_other — mean over i of
        (median_j!=i D_ij - D_ii) / median_j!=i D_ij; positive = own-patient
        distances are systematically below the field.
      frac_nearest_same_label — with ``labels`` (e.g. tissue class), P(the
        nearest real patient has the same label) — the coarser signal that
        survives even when patient identity does not.
    """
    mu, sd = real_reps.mean(0), real_reps.std(0) + 1e-12
    real_w = (real_reps - mu) / sd
    fake_w = (fake_reps - mu) / sd
    D = np.linalg.norm(fake_w[:, None, :] - real_w[None, :, :], axis=-1)
    own = np.diag(D)
    # mask the own-patient column with NaN and use NaN-aware reductions
    # (an eye()*inf mask puts 0*inf = NaN in every OFF-diagonal entry)
    others = np.where(np.eye(len(D), dtype=bool), np.nan, D)
    median_other = np.nanmedian(others, axis=1)
    out = {
        "frac_own_patient_closest": round(float(
            np.mean(np.argmin(D, axis=1) == np.arange(len(D)))), 4),
        "chance_level": round(1.0 / len(D), 4),
        "mean_margin_vs_median_other": round(float(
            np.mean((median_other - own) / median_other)), 4),
        "mean_own_distance": round(float(own.mean()), 4),
        "mean_other_distance": round(float(np.nanmean(median_other)), 4),
    }
    if labels is not None:
        labels = np.asarray(labels)
        nn = np.argmin(D, axis=1)
        out["frac_nearest_same_label"] = round(float(np.mean(labels[nn] == labels)), 4)
    return out
