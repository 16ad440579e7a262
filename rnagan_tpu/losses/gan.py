"""GAN loss registry: minimax | wgan (clip + GP) | lsgan (+ the VAE-infused
wganvae family assembled in train/gan_trainer.py).

Functional equivalents of the torchgan losses the reference selects at
``histopathology_gan.py:265-284`` and of the custom VAE losses
(``wgan_loss.py:24-44``). Pure functions of critic outputs; the optimization
step ownership that torchgan puts inside each loss's ``train_ops`` lives in
the jitted trainer programs instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------- wasserstein
def wasserstein_generator_loss(dgz: jax.Array) -> jax.Array:
    """-mean f(G(z)) (reference ``wgan_loss.py:24-25``)."""
    return -jnp.mean(dgz)


def wasserstein_discriminator_loss(dx: jax.Array, dgz: jax.Array) -> jax.Array:
    """mean(f(G(z)) - f(x)) (reference ``wgan_loss.py:28-29``)."""
    return jnp.mean(dgz - dx)


def gradient_penalty(d_apply, interpolate: jax.Array, *, per_sample: bool = True) -> jax.Array:
    """WGAN-GP penalty ``(||grad D(x_hat)|| - 1)^2``.

    ``per_sample=True`` is the standard Gulrajani formulation (norm per
    interpolate, then mean). ``per_sample=False`` reproduces the reference's
    quirk of a single *global* 2-norm over the whole batch's gradient tensor
    (reference ``wgan_loss.py:43``).

    ``d_apply``: interpolate -> critic scores (N,). The double backward the
    torch code needs ``create_graph=True`` for (``wgan_loss.py:34-41``) is
    just grad-of-grad here and XLA compiles it into the same program.
    """

    def critic_sum(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(critic_sum)(interpolate)  # (N, H, W, C)
    grads = grads.astype(jnp.float32)
    if per_sample:
        norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)), axis=1) + 1e-12)
        return jnp.mean(jnp.square(norms - 1.0))
    norm = jnp.sqrt(jnp.sum(jnp.square(grads)) + 1e-12)
    return jnp.square(norm - 1.0)


# -------------------------------------------------------------------- minimax
def minimax_generator_loss(dgz: jax.Array, nonsaturating: bool = True) -> jax.Array:
    """Non-saturating by default (torchgan MinimaxGeneratorLoss default)."""
    if nonsaturating:
        return jnp.mean(jax.nn.softplus(-dgz))
    return -jnp.mean(jax.nn.softplus(dgz))


def minimax_discriminator_loss(dx: jax.Array, dgz: jax.Array) -> jax.Array:
    return jnp.mean(jax.nn.softplus(-dx)) + jnp.mean(jax.nn.softplus(dgz))


# ---------------------------------------------------------------------- lsgan
def least_squares_generator_loss(dgz: jax.Array, c: float = 1.0) -> jax.Array:
    return 0.5 * jnp.mean(jnp.square(dgz - c))


def least_squares_discriminator_loss(dx: jax.Array, dgz: jax.Array, a: float = 0.0, b: float = 1.0) -> jax.Array:
    return 0.5 * (jnp.mean(jnp.square(dx - b)) + jnp.mean(jnp.square(dgz - a)))


def clip_params(params, lo: float, hi: float):
    """Weight clipping for vanilla WGAN (reference
    ``histopathology_gan.py:270``, applied in ``wgan_loss.py:213-215``)."""
    return jax.tree_util.tree_map(lambda p: jnp.clip(p, lo, hi), params)
