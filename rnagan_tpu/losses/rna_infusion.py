"""RNA infusion: the "RNA-GAN" mechanism.

The generator's noise prior is infused with the frozen beta-VAE encoding of
the patient's gene expression (reference ``wgan_loss.py:97-106``):

    z      = betavae.encode(gene).z_mean          (VAE in eval mode)
    noise  = U(-0.3, 0.3)  +  z
    noise  = (noise - mean(noise, axis=0)) / std(noise, axis=0)

Notes for exactness:
* torch ``std`` defaults to the *unbiased* estimator (ddof=1) — matched here.
* the per-batch standardization is over the **global** batch: under pjit with
  the batch sharded on the data axis, ``jnp.mean``/``var`` over axis 0 are
  computed globally by XLA-inserted collectives, so multi-chip training
  reproduces single-device semantics exactly.
* the VAE encoder runs inside the same jitted program as G/D (eval mode:
  running BN stats, no dropout — reference ``wgan_loss.py:69``), so the whole
  noise path fuses into the training step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from rnagan_tpu.models.betavae import BetaVAE


def encode_z_mean(vae: BetaVAE, vae_variables: Dict[str, Any], gene: jax.Array) -> jax.Array:
    """Frozen-VAE latent mean for a batch of (normalized) expression vectors."""
    z_mean, _, _ = vae.apply(vae_variables, gene, train=False, method=BetaVAE.encode)
    return z_mean


def standardize_batch(noise: jax.Array) -> jax.Array:
    mean = jnp.mean(noise, axis=0)
    # torch.std(dim=0) is unbiased (ddof=1)
    n = noise.shape[0]
    var = jnp.sum(jnp.square(noise - mean), axis=0) / jnp.maximum(n - 1, 1)
    return (noise - mean) / jnp.sqrt(var + 1e-12)


def infused_noise(key: jax.Array, z_mean: jax.Array, noise_range: float = 0.3) -> jax.Array:
    u = jax.random.uniform(key, z_mean.shape, jnp.float32, -noise_range, noise_range)
    return standardize_batch(u + z_mean)


def infused_noise_population(
    key: jax.Array,
    z_mean: jax.Array,
    pop_mean: jax.Array,
    pop_std: jax.Array,
    num_samples: int,
    noise_range: float = 0.3,
) -> jax.Array:
    """Conditioning-preserving generation-time infusion.

    Discovered reference property: at generation the reference broadcasts ONE
    patient's z_mean over the batch and then standardizes per column over the
    batch (``gan_utils.py:211-216``) — which cancels the constant z offset
    exactly, making "conditional" generation effectively unconditional. For
    FID-parity runs we reproduce that (see ``standardize_batch``); this
    variant instead standardizes with *training-population* statistics of
    z_mean, reproducing the training-time noise distribution while keeping
    the patient signal:

        noise = (U + z - E_pop[z]) / sqrt(Var_pop[z] + Var[U])
    """
    dims = z_mean.shape[-1]
    u = jax.random.uniform(key, (num_samples, dims), jnp.float32, -noise_range, noise_range)
    var_u = (2.0 * noise_range) ** 2 / 12.0
    return (u + z_mean - pop_mean) / jnp.sqrt(jnp.square(pop_std) + var_u)


def z_population_stats(vae: BetaVAE, vae_variables, rna_matrix, batch_size: int = 256):
    """Mean/std of z_mean over a (normalized) training expression matrix —
    computed once and bundled with GAN checkpoints so generation can use the
    conditioning-preserving mode.

    ``vae_variables`` is a jit ARGUMENT (a closure would inline the ~0.5 GB
    frozen VAE weights into the HLO as constants — see GANTrainer._noise);
    the final short chunk is wrap-padded so one program serves every call."""
    import numpy as np

    enc = jax.jit(lambda v, x: vae.apply(v, x, train=False, method=BetaVAE.encode)[0])
    n = len(rna_matrix)
    outs = []
    for s in range(0, n, batch_size):
        chunk = np.asarray(rna_matrix[s : s + batch_size], np.float32)
        k = len(chunk)
        if k < batch_size and n >= batch_size:  # pad to the one compiled shape
            pad = np.asarray(rna_matrix[: batch_size - k], np.float32)
            chunk = np.concatenate([chunk, pad])
        outs.append(np.asarray(enc(vae_variables, jnp.asarray(chunk)))[:k])
    z = np.concatenate(outs, axis=0)
    return z.mean(axis=0), z.std(axis=0, ddof=1)
