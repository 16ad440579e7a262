"""beta-VAE ELBO loss (reference ``src/betaVAE.py:145-162``).

* reconstruction = mean squared error over every element (torch
  ``F.mse_loss`` default mean reduction, ``betaVAE.py:146``)
* KL = batch mean of ``-0.5 * sum(1 + logvar - mu^2 - exp(logvar), axis=1)``
  (``betaVAE.py:148``)
* training total = recons + beta * KL; validation total drops the KL term
  (``betaVAE.py:151-155``). The reference's ``kld_weight`` parameter is unused
  there and intentionally not reproduced.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def beta_vae_loss(
    x: jax.Array,
    x_recons: jax.Array,
    z_mean: jax.Array,
    z_logvar: jax.Array,
    beta: float,
    training: bool = True,
) -> Dict[str, jax.Array]:
    x = x.astype(jnp.float32)
    x_recons = x_recons.astype(jnp.float32)
    recons_loss = jnp.mean(jnp.square(x_recons - x))
    kld_loss = jnp.mean(
        -0.5 * jnp.sum(1.0 + z_logvar - jnp.square(z_mean) - jnp.exp(z_logvar), axis=1)
    )
    total = recons_loss + beta * kld_loss if training else recons_loss
    return {
        "total_loss": total,
        "reconstruction_loss": recons_loss,
        "kl_loss": kld_loss,
    }
