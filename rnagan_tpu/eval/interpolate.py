"""Latent-space interpolation analysis (reference ``src/betaVAE_interpolation.py``).

Computes class-centroid latent means and their difference vectors (tissue vs
tissue, ``betaVAE_interpolation.py:116-154``, or any labeling such as GTEx
male/female, ``:156-209``), and decodes latents shifted along those
directions. One jitted encode pass over the whole split replaces the
reference's per-row loop."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnagan_tpu.models.betavae import BetaVAE


def encode_means(model: BetaVAE, variables, data: np.ndarray, batch_size: int = 256) -> np.ndarray:
    """z_mu for every row (eval mode)."""

    @jax.jit
    def enc(x):
        mu, _, _ = model.apply(variables, x, train=False, method=BetaVAE.encode)
        return mu

    outs = []
    n = len(data)
    for s in range(0, n, batch_size):
        chunk = np.asarray(data[s : s + batch_size], np.float32)
        pad = batch_size - len(chunk)
        if pad > 0:
            chunk = np.concatenate([chunk, np.zeros((pad, chunk.shape[1]), np.float32)])
        z = np.asarray(enc(jnp.asarray(chunk)))
        outs.append(z[: batch_size - pad] if pad else z)
    return np.concatenate(outs, axis=0)


def class_difference_vectors(z_mu: np.ndarray, labels: np.ndarray) -> Dict[Tuple[int, int], np.ndarray]:
    """Centroid differences for every ordered class pair
    (reference ``betaVAE_interpolation.py:140-154``)."""
    classes = np.unique(labels)
    centroids = {int(c): z_mu[labels == c].mean(axis=0) for c in classes}
    return {
        (int(a), int(b)): centroids[int(a)] - centroids[int(b)]
        for a in classes
        for b in classes
        if a != b
    }


def decode_shifted(model: BetaVAE, variables, z: np.ndarray, direction: np.ndarray, alpha: float = 1.0) -> np.ndarray:
    """Decode ``z + alpha * direction`` (reference ``betaVAE.py:131-139``)."""
    shifted = jnp.asarray(z, jnp.float32) + alpha * jnp.asarray(direction, jnp.float32)
    return np.asarray(model.apply(variables, shifted, train=False, method=BetaVAE.decode))


def interpolation_report(model: BetaVAE, variables, data: np.ndarray, labels: np.ndarray, alpha: float = 1.0):
    """The full analysis artifact (the reference pickles
    ``{z_mu*, difference vectors, recons}``, ``betaVAE_interpolation.py:214-232``)."""
    z_mu = encode_means(model, variables, data)
    diffs = class_difference_vectors(z_mu, labels)
    recons = {
        pair: decode_shifted(model, variables, z_mu[labels == pair[1]], d, alpha)
        for pair, d in diffs.items()
    }
    return {"z_mu": z_mu, "labels": labels, "difference_vectors": diffs, "recons": recons}
