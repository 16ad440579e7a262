"""Synthetic gene-expression sampling (reference ``src/betaVAE_sample.py``).

Draw N standard-normal latents, optionally offset along a saved interpolation
direction (``betaVAE_sample.py:119-125``), decode, and inverse-transform back
to expression space with the *checkpointed* scaler (the reference re-fits its
scaler by re-splitting CSVs each run — ``betaVAE_sample.py:66-96`` — which this
framework fixes by bundling scaler state into checkpoints)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rnagan_tpu.data.rna import Scaler
from rnagan_tpu.models.betavae import BetaVAE


def sample_expression(
    model: BetaVAE,
    variables,
    scaler: Scaler,
    num_samples: int,
    key,
    interpolation: Optional[np.ndarray] = None,
    alpha: float = 1.0,
) -> np.ndarray:
    """Returns (num_samples, rna_features) expression values in the original
    (pre-log, pre-scaling) units... of the normalized space inverse — i.e. the
    scaler inverse is applied exactly as the reference does
    (``betaVAE_sample.py:127-135``: inverse_transform of decoded outputs)."""
    z = jax.random.normal(key, (num_samples, model.cfg.z_dim), jnp.float32)
    interp = None if interpolation is None else jnp.asarray(interpolation, jnp.float32)
    decoded = model.apply(variables, z, interpolation=interp, alpha=alpha, method=BetaVAE.sample)
    return scaler.inverse_transform(np.asarray(decoded))
