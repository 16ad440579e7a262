"""Frechet Inception Distance, TPU-native.

Reference protocol (reference ``src/fid.py``): InceptionV3 Mixed_7c -> avgpool
2048-d activations on 299x299 inputs in [0,1] (``fid.py:49-63``), mean +
covariance per set (``:98-111``), Frechet distance with scipy ``sqrtm``,
eps-jitter on singular products and imaginary-guard (``:115-163``), 5
repetitions reported mean +/- std (``:312-330``).

TPU re-design:
* preprocessing (resize to 299) + activation extraction is ONE jitted program
  per batch — no host round-trip per image (the reference preprocesses with an
  optional multiprocessing pool and runs inception at batch size 2,
  ``fid.py:198-207,321``);
* the matrix square root runs on-device via symmetric eigendecomposition:
  tr sqrtm(S1 S2) == tr sqrtm(sqrtm(S1) S2 sqrtm(S1)) with the inner matrix
  symmetric PSD — no complex arithmetic, no LAPACK;
* ``method="scipy"`` reproduces the reference's numerics exactly for
  cross-checks.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnagan_tpu.models.inception import InceptionV3Features


class InceptionExtractor:
    """Batched activation extraction (the PartialInceptionNetwork equivalent,
    reference ``fid.py:33-94``)."""

    def __init__(self, variables=None, *, transform_input: bool = True, dtype=jnp.bfloat16,
                 seed: int = 0, torch_pool: bool = False):
        self.model = InceptionV3Features(transform_input=transform_input, dtype=dtype,
                                         torch_pool=torch_pool)
        if variables is None:
            self.variables = self.model.init(jax.random.key(seed),
                                             jnp.zeros((1, 299, 299, 3), jnp.float32))
        else:
            self.variables = variables

        @jax.jit
        def _features(variables, images):
            n, h, w, c = images.shape
            if (h, w) != (299, 299):
                images = jax.image.resize(images, (n, 299, 299, c), method="bilinear")
            return self.model.apply(variables, images)

        self._features = _features

    def __call__(self, images: np.ndarray, batch_size: int = 64) -> np.ndarray:
        """images: NHWC float in [0,1] (any HxW; resized on device).
        Returns (N, 2048) float32."""
        n = len(images)
        out = np.zeros((n, 2048), np.float32)
        for start in range(0, n, batch_size):
            chunk = np.asarray(images[start : start + batch_size], np.float32)
            pad = 0
            if len(chunk) < batch_size:  # keep shapes static for one compile
                pad = batch_size - len(chunk)
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            acts = np.asarray(self._features(self.variables, jnp.asarray(chunk)))
            out[start : start + batch_size - pad] = acts[: batch_size - pad]
        return out


def get_activations(images: np.ndarray, batch_size: int = 64, extractor: Optional[InceptionExtractor] = None) -> np.ndarray:
    extractor = extractor or InceptionExtractor()
    return extractor(images, batch_size)


def calculate_activation_statistics(
    images: np.ndarray, batch_size: int = 64, extractor: Optional[InceptionExtractor] = None
) -> Tuple[np.ndarray, np.ndarray]:
    act = get_activations(images, batch_size, extractor)
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


@jax.jit
def _sqrtm_psd(mat: jax.Array) -> jax.Array:
    """Symmetric PSD matrix square root via eigh (clipping tiny negatives)."""
    vals, vecs = jnp.linalg.eigh(mat)
    vals = jnp.clip(vals, 0.0, None)
    return (vecs * jnp.sqrt(vals)[None, :]) @ vecs.T


@jax.jit
def _trace_sqrtm_product(sigma1: jax.Array, sigma2: jax.Array) -> jax.Array:
    """tr sqrtm(S1 @ S2) for symmetric PSD S1, S2 — via the symmetric
    similarity sqrtm(S1) S2 sqrtm(S1), which has the same eigenvalues."""
    a = _sqrtm_psd(sigma1)
    m = a @ sigma2 @ a
    m = 0.5 * (m + m.T)
    vals = jnp.linalg.eigh(m)[0]
    return jnp.sum(jnp.sqrt(jnp.clip(vals, 0.0, None)))


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6, method: str = "eigh") -> float:
    """d^2 = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))
    (reference ``fid.py:115-163``). ``method='eigh'`` runs on-device;
    ``method='scipy'`` matches the reference's scipy.sqrtm numerics."""
    mu1, mu2 = np.atleast_1d(np.asarray(mu1, np.float64)), np.atleast_1d(np.asarray(mu2, np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    diff = mu1 - mu2

    if method == "scipy":
        from scipy import linalg

        covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
        if not np.isfinite(covmean).all():
            # eps-jitter path for singular products (reference fid.py:147-152)
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
        if np.iscomplexobj(covmean):
            if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
                raise ValueError(f"Imaginary component {np.max(np.abs(covmean.imag))}")
            covmean = covmean.real
        tr_covmean = np.trace(covmean)
    else:
        tr_covmean = float(_trace_sqrtm_product(jnp.asarray(sigma1), jnp.asarray(sigma2)))
        if not math.isfinite(tr_covmean):
            offset = np.eye(sigma1.shape[0]) * eps
            tr_covmean = float(
                _trace_sqrtm_product(jnp.asarray(sigma1 + offset), jnp.asarray(sigma2 + offset))
            )

    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_covmean)


def calculate_fid(
    images1: np.ndarray,
    images2: np.ndarray,
    batch_size: int = 64,
    extractor: Optional[InceptionExtractor] = None,
    method: str = "eigh",
) -> float:
    """FID between two image sets (NHWC float [0,1]) — the ``calculate_fid``
    equivalent (reference ``fid.py:217-232``)."""
    extractor = extractor or InceptionExtractor()
    mu1, s1 = calculate_activation_statistics(images1, batch_size, extractor)
    mu2, s2 = calculate_activation_statistics(images2, batch_size, extractor)
    return calculate_frechet_distance(mu1, s1, mu2, s2, method=method)


def fid_repetitions(
    real_images: np.ndarray,
    generate_fn,
    n_reps: int = 5,
    batch_size: int = 64,
    extractor: Optional[InceptionExtractor] = None,
) -> Tuple[float, float, list]:
    """The reference's statistical protocol: N generation+FID repetitions,
    mean +/- std (reference ``fid.py:312-330``). ``generate_fn(rep) -> images``."""
    extractor = extractor or InceptionExtractor()
    mu_r, s_r = calculate_activation_statistics(real_images, batch_size, extractor)
    fids = []
    for rep in range(n_reps):
        fake = generate_fn(rep)
        mu_f, s_f = calculate_activation_statistics(fake, batch_size, extractor)
        fids.append(calculate_frechet_distance(mu_r, s_r, mu_f, s_f))
    return float(np.mean(fids)), float(np.std(fids)), fids
