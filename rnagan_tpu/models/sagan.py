"""SAGAN — self-attention GAN family, NHWC / TPU-native.

The reference registers ``--gan_type sagan`` with ``encoding_dims=2048,
step_channels=32`` (``histopathology_gan.py:235-244``) but imports a module
that does not exist in the repo (SURVEY.md section 2.5), so the capability
never shipped. This is an original implementation of that intended surface:
the DCGAN topology of :mod:`rnagan_tpu.models.dcgan` with

* **spectral normalization** on every conv (flax ``nn.SpectralNorm`` power
  iteration; ``u``/``sigma`` live in the ``batch_stats`` collection, so the
  trainer's existing mutable-collection threading applies unchanged), and
* **self-attention** over HW tokens at one feature resolution
  (``GANModelConfig.attn_size``) in both G and D — attention is two batched
  matmuls (einsum), which is exactly what the MXU wants.

Attention follows the SAGAN formulation (arXiv:1805.08318 eqs. 1-3) with the
production channel plan used by BigGAN (theta/phi C/8, g C/2, output conv
back to C) and 2x2 max-pooled keys/values: the N x HW x HW/4 attention matrix
is 4x smaller than the naive one at identical quality, which matters at
256**2 where HW=4096 tokens. The softmax runs in float32 (bf16 logits
overflow long before 4096-token rows do); everything else stays in
``compute_dtype``. The learned output gate ``gamma`` initializes to 0 so the
network starts as the plain DCGAN and eases attention in — the paper's
stabilization trick.

The discriminator uses spectral norm INSTEAD of batchnorm (the SAGAN paper's
D has no BN; ``GANModelConfig.batchnorm`` only shapes G here). This also
means the whole D stats tree is spectral-norm state, which is why
``GANConfig.fused_critic_batch`` is rejected for this family — its
closed-form running-stats recomposition is a BatchNorm identity and would
corrupt power-iteration vectors (see ``train/gan_trainer.py``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rnagan_tpu.core.config import GANModelConfig
from rnagan_tpu.models.dcgan import _BN, _dtype, _num_repeats, conv_init


def spectral_norm(layer: nn.Module, name: Optional[str] = None) -> nn.Module:
    """Wrap ``layer`` in power-iteration spectral normalization. Param tree
    placement is unchanged (params stay under the inner layer's name); only
    ``<name>/<leaf>/{u,sigma}`` state lands in ``batch_stats``."""
    return nn.SpectralNorm(layer, collection_name="batch_stats",
                           error_on_non_matrix=False, name=name)


class SelfAttention2d(nn.Module):
    """Self-attention over flattened HW tokens with pooled keys/values.

    out = x + gamma * Conv1x1( softmax(theta(x) phi(x)^T) g(x) ),
    theta: C->C/8, phi: C->C/8 (2x2 max-pooled), g: C->C/2 (pooled),
    output conv C/2->C, gamma scalar parameter initialized to 0.
    """

    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        n, h, w, c = x.shape
        dt = self.dtype
        c_qk = max(c // 8, 1)  # floors keep tiny test widths valid
        c_v = max(c // 2, 1)

        def snconv1x1(features: int, name: str) -> nn.Module:
            return spectral_norm(
                nn.Conv(features, (1, 1), use_bias=False, dtype=dt,
                        kernel_init=conv_init, name=name),
                name=f"sn_{name}")

        theta = snconv1x1(c_qk, "theta")(x, update_stats=train)
        phi = snconv1x1(c_qk, "phi")(x, update_stats=train)
        g = snconv1x1(c_v, "g")(x, update_stats=train)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        g = nn.max_pool(g, (2, 2), strides=(2, 2))
        q = theta.reshape(n, h * w, c_qk)
        k = phi.reshape(n, (h // 2) * (w // 2), c_qk)
        v = g.reshape(n, (h // 2) * (w // 2), c_v)
        logits = jnp.einsum("nqc,nkc->nqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(dt)
        o = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, h, w, c_v)
        o = snconv1x1(c, "o")(o, update_stats=train)
        gamma = self.param("gamma", nn.initializers.zeros_init(), (), jnp.float32)
        return x + gamma.astype(dt) * o


class SAGANGenerator(nn.Module):
    """DCGAN generator topology + spectral norm + one attention block."""

    cfg: GANModelConfig
    final_tanh: bool = True

    @nn.compact
    def __call__(self, z: jax.Array, labels: Optional[jax.Array] = None,
                 train: bool = True) -> jax.Array:
        cfg = self.cfg
        dt = _dtype(cfg.compute_dtype)
        r = _num_repeats(cfg.out_size)
        d = cfg.step_channels * (2 ** r)
        x = z.astype(dt)[:, None, None, :]
        x = spectral_norm(
            nn.ConvTranspose(d, (4, 4), (1, 1), padding="VALID",
                             use_bias=not cfg.batchnorm, dtype=dt,
                             kernel_init=conv_init, name="ConvTranspose_0"),
            name="sn_ConvTranspose_0")(x, update_stats=train)
        if cfg.batchnorm:
            x = _BN(dt)(x, train)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        size = 4
        for i in range(r):
            d //= 2
            x = spectral_norm(
                nn.ConvTranspose(d, (4, 4), (2, 2), padding="SAME",
                                 use_bias=not cfg.batchnorm, dtype=dt,
                                 kernel_init=conv_init, name=f"ConvTranspose_{i + 1}"),
                name=f"sn_ConvTranspose_{i + 1}")(x, update_stats=train)
            if cfg.batchnorm:
                x = _BN(dt)(x, train)
            x = nn.leaky_relu(x, cfg.leaky_slope)
            size *= 2
            if size == cfg.attn_size:
                x = SelfAttention2d(dt, name=f"Attention_{size}")(x, train)
        x = spectral_norm(
            nn.ConvTranspose(cfg.out_channels, (4, 4), (2, 2), padding="SAME",
                             use_bias=True, dtype=dt, kernel_init=conv_init,
                             name=f"ConvTranspose_{r + 1}"),
            name=f"sn_ConvTranspose_{r + 1}")(x, update_stats=train)
        x = x.astype(jnp.float32)
        return jnp.tanh(x) if self.final_tanh else x


class SAGANDiscriminator(nn.Module):
    """Mirror critic: spectral-normed strided convs (no batchnorm — SN is the
    paper's D conditioning), attention at ``attn_size`` on the way down."""

    cfg: GANModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None,
                 train: bool = True) -> jax.Array:
        cfg = self.cfg
        dt = _dtype(cfg.compute_dtype)
        r = _num_repeats(cfg.out_size)
        d = cfg.step_channels
        x = x.astype(dt)
        x = spectral_norm(
            nn.Conv(d, (4, 4), (2, 2), padding=((1, 1), (1, 1)), dtype=dt,
                    kernel_init=conv_init, name="Conv_0"),
            name="sn_Conv_0")(x, update_stats=train)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        size = cfg.out_size // 2
        if size == cfg.attn_size:
            x = SelfAttention2d(dt, name=f"Attention_{size}")(x, train)
        for i in range(r):
            d *= 2
            x = spectral_norm(
                nn.Conv(d, (4, 4), (2, 2), padding=((1, 1), (1, 1)),
                        use_bias=True, dtype=dt, kernel_init=conv_init,
                        name=f"Conv_{i + 1}"),
                name=f"sn_Conv_{i + 1}")(x, update_stats=train)
            x = nn.leaky_relu(x, cfg.leaky_slope)
            size //= 2
            if size == cfg.attn_size:
                x = SelfAttention2d(dt, name=f"Attention_{size}")(x, train)
        x = spectral_norm(
            nn.Conv(1, (4, 4), (1, 1), padding="VALID", dtype=dt,
                    kernel_init=conv_init, name=f"Conv_{r + 1}"),
            name=f"sn_Conv_{r + 1}")(x, update_stats=train)
        x = x.astype(jnp.float32)
        if cfg.disc_last_leaky:
            x = nn.leaky_relu(x, cfg.leaky_slope)
        return x.reshape(x.shape[0])
