"""BigGAN-style class-conditional residual GAN, NHWC / TPU-native.

The reference registers ``--gan_type biggan`` with ``dim_z=2048, G_ch=64,
resolution=256, n_classes=2`` (``histopathology_gan.py:211-234``) but the
``biggan`` module it imports does not exist (SURVEY.md section 2.5). This is
an original implementation of that intended surface following the BigGAN
recipe (arXiv:1809.11096):

* **residual up/down blocks** with spectral-normalized 3x3 convs and
  orthogonal init — all FLOPs in large dense convs (MXU) with cheap
  elementwise residual adds that XLA fuses;
* **hierarchical latent**: z splits into ``n_blocks + 1`` chunks — chunk 0
  seeds the 4x4 feature map, each later chunk conditions one block;
* **shared class embedding** (``GANModelConfig.embed_dim``) concatenated with
  the per-block z chunk and mapped to per-channel scale/shift by
  **conditional BatchNorm** (zero-init projections, so CBN starts as plain BN
  — stable from step 0; the official code instead orthogonally initializes
  spectral-normed gain layers, but spectral norm over a zero-init kernel
  divides by sigma=0, so zero-init + (1 + gamma) is the numerically safe
  equivalent);
* **self-attention** (:class:`rnagan_tpu.models.sagan.SelfAttention2d`) at
  ``GANModelConfig.attn_size`` in both nets;
* **projection discriminator**: score = SN-linear(global-sum-pooled h)
  + <embed(y), h> (Miyato & Koyama, arXiv:1802.05637).

With ``num_classes=0`` (or labels absent) the model degrades gracefully to an
unconditional BigGAN: CBN conditions on the z chunk alone and the projection
term drops — this is what lets ``biggan`` compose with the ``wganvae``
RNA-infusion noise path, whose batches carry expression vectors, not labels.

Channel schedule: width ``step_channels * min(16, 2**(n_up - i))`` after
block ``i`` (the reference wiring's ``G_ch=64`` is ``step_channels`` here) —
for 256**2 that is 1024 channels at 4x4 tapering to 64 at 256x256, matching
BigGAN-256's 16x...1x taper; the discriminator mirrors it.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rnagan_tpu.core.config import GANModelConfig
from rnagan_tpu.models.dcgan import _dtype
from rnagan_tpu.models.sagan import SelfAttention2d, spectral_norm

ortho_init = nn.initializers.orthogonal()


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")


def _n_up(out_size: int) -> int:
    if out_size < 8 or (out_size & (out_size - 1)) != 0:
        raise ValueError("image size must be >= 8 and a power of 2")
    return out_size.bit_length() - 3  # 4x4 seed -> out_size


def split_latent(z: jax.Array, n_chunks: int):
    """Split z on the feature axis into ``n_chunks`` near-equal chunks (the
    first chunks absorb the remainder, so any ``encoding_dims`` works —
    including the reference's 2048, which 7 chunks don't divide)."""
    dim = z.shape[-1]
    base, rem = divmod(dim, n_chunks)
    sizes = [base + (1 if i < rem else 0) for i in range(n_chunks)]
    out, start = [], 0
    for s in sizes:
        out.append(jax.lax.slice_in_dim(z, start, start + s, axis=-1))
        start += s
    return out


class ConditionalBatchNorm(nn.Module):
    """BN whose scale/shift are linear in a conditioning vector:
    ``bn(x) * (1 + gamma(cond)) + beta(cond)``, gamma/beta zero-initialized."""

    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1]
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="bn")(x)
        zeros = nn.initializers.zeros_init()
        gamma = nn.Dense(c, use_bias=False, kernel_init=zeros, dtype=self.dtype,
                         name="gamma")(cond)
        beta = nn.Dense(c, use_bias=False, kernel_init=zeros, dtype=self.dtype,
                        name="beta")(cond)
        return h * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]


class GBlock(nn.Module):
    """Residual up block: CBN-act-up-SNconv3x3-CBN-act-SNconv3x3 with an
    up-SNconv1x1 skip."""

    features: int
    dtype: Any
    slope: float

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array, train: bool) -> jax.Array:
        f, dt = self.features, self.dtype
        h = ConditionalBatchNorm(dt, name="cbn1")(x, cond, train)
        h = nn.leaky_relu(h, self.slope)
        h = upsample2x_nearest(h)
        h = spectral_norm(
            nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, kernel_init=ortho_init, name="conv1"),
            name="sn_conv1")(h, update_stats=train)
        h = ConditionalBatchNorm(dt, name="cbn2")(h, cond, train)
        h = nn.leaky_relu(h, self.slope)
        h = spectral_norm(
            nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, kernel_init=ortho_init, name="conv2"),
            name="sn_conv2")(h, update_stats=train)
        skip = upsample2x_nearest(x)
        skip = spectral_norm(
            nn.Conv(f, (1, 1), use_bias=False, dtype=dt,
                    kernel_init=ortho_init, name="conv_skip"),
            name="sn_conv_skip")(skip, update_stats=train)
        return h + skip


class DBlock(nn.Module):
    """Residual down block: (act)-SNconv3x3-act-SNconv3x3-pool with an
    SNconv1x1-pool skip. ``first`` skips the pre-activation (input is the
    image)."""

    features: int
    dtype: Any
    slope: float
    first: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        f, dt = self.features, self.dtype
        h = x if self.first else nn.leaky_relu(x, self.slope)
        h = spectral_norm(
            nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, kernel_init=ortho_init, name="conv1"),
            name="sn_conv1")(h, update_stats=train)
        h = nn.leaky_relu(h, self.slope)
        h = spectral_norm(
            nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, kernel_init=ortho_init, name="conv2"),
            name="sn_conv2")(h, update_stats=train)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        skip = spectral_norm(
            nn.Conv(f, (1, 1), use_bias=False, dtype=dt,
                    kernel_init=ortho_init, name="conv_skip"),
            name="sn_conv_skip")(x, update_stats=train)
        skip = nn.avg_pool(skip, (2, 2), strides=(2, 2))
        return h + skip


class BigGANGenerator(nn.Module):
    cfg: GANModelConfig
    final_tanh: bool = True

    @nn.compact
    def __call__(self, z: jax.Array, labels: Optional[jax.Array] = None,
                 train: bool = True) -> jax.Array:
        cfg = self.cfg
        dt = _dtype(cfg.compute_dtype)
        n_up = _n_up(cfg.out_size)
        # remat: recompute each residual block's activations in the backward
        # pass instead of holding them across the WGAN-GP double-grad
        # (static_argnums=(3,): the `train` python bool of GBlock.__call__,
        # with self at index 0 — verified in tests/test_attention_gans.py)
        Block = nn.remat(GBlock, static_argnums=(3,)) if cfg.remat else GBlock
        ch = [cfg.step_channels * min(16, 2 ** (n_up - i)) for i in range(n_up + 1)]
        chunks = split_latent(z.astype(dt), n_up + 1)
        emb = None
        if cfg.num_classes > 0 and labels is not None:
            emb = nn.Embed(cfg.num_classes, cfg.embed_dim,
                           embedding_init=ortho_init, dtype=dt,
                           name="shared_embed")(labels)
        h = spectral_norm(
            nn.Dense(4 * 4 * ch[0], dtype=dt, kernel_init=ortho_init,
                     name="linear_in"),
            name="sn_linear_in")(chunks[0], update_stats=train)
        h = h.reshape(h.shape[0], 4, 4, ch[0])
        size = 4
        for i in range(n_up):
            cond = chunks[i + 1] if emb is None else jnp.concatenate(
                [emb, chunks[i + 1]], axis=-1)
            h = Block(ch[i + 1], dt, cfg.leaky_slope, name=f"block_{i}")(h, cond, train)
            size *= 2
            if size == cfg.attn_size:
                h = SelfAttention2d(dt, name=f"Attention_{size}")(h, train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="bn_out")(h)
        h = nn.leaky_relu(h, cfg.leaky_slope)
        h = spectral_norm(
            nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dt, kernel_init=ortho_init, name="conv_out"),
            name="sn_conv_out")(h, update_stats=train)
        h = h.astype(jnp.float32)
        return jnp.tanh(h) if self.final_tanh else h


class BigGANDiscriminator(nn.Module):
    cfg: GANModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None,
                 train: bool = True) -> jax.Array:
        cfg = self.cfg
        dt = _dtype(cfg.compute_dtype)
        n_down = _n_up(cfg.out_size)  # mirror: out_size -> 4x4
        # remat matters most here: D runs 4x per step (real, fake, the GP
        # interpolates, and the double-grad recompute) at full resolution
        Block = nn.remat(DBlock, static_argnums=(2,)) if cfg.remat else DBlock
        ch = [cfg.step_channels * min(16, 2 ** (i + 1)) for i in range(n_down)]
        h = x.astype(dt)
        size = cfg.out_size
        for i in range(n_down):
            h = Block(ch[i], dt, cfg.leaky_slope, first=(i == 0),
                      name=f"block_{i}")(h, train)
            size //= 2
            if size == cfg.attn_size:
                h = SelfAttention2d(dt, name=f"Attention_{size}")(h, train)
        h = nn.leaky_relu(h, cfg.leaky_slope)
        h = jnp.sum(h, axis=(1, 2))  # global sum pool -> (N, C)
        out = spectral_norm(
            nn.Dense(1, dtype=dt, kernel_init=ortho_init, name="linear_out"),
            name="sn_linear_out")(h, update_stats=train)[:, 0]
        if cfg.num_classes > 0 and labels is not None:
            emb = nn.Embed(cfg.num_classes, ch[-1], embedding_init=ortho_init,
                           dtype=dt, name="proj_embed")(labels)
            out = out + jnp.sum(emb * h, axis=-1)
        out = out.astype(jnp.float32)
        if cfg.disc_last_leaky:
            out = nn.leaky_relu(out, cfg.leaky_slope)
        return out
