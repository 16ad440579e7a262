"""DCGAN-family generators and discriminators, NHWC / TPU-native.

Capability parity with the architectures the reference instantiates from
torchgan (reference ``histopathology_gan.py:175-210``) plus the in-repo
resize-convolution variant (reference ``src/dcgan.py:8-99``):

* :class:`DCGANGenerator` — z (N, 2048) -> ConvTranspose 4x4 head (1x1 -> 4x4,
  ``step_channels * 2**num_repeats`` channels) -> ``num_repeats`` stride-2
  ConvTranspose+BN+LeakyReLU blocks halving channels -> final stride-2
  ConvTranspose -> tanh. ``num_repeats = out_size.bit_length() - 4`` (for 256:
  5 blocks, channel path 2048->1024->512->256->128->64->3).
* :class:`DCGANUpGenerator` — same head, but up-blocks are bilinear-upsample
  x2 + reflection-pad 1 + 3x3 VALID conv (checkerboard-free resize-conv,
  reference ``dcgan.py:45-57,76-84``). The reference's final block omits the
  tanh (quirk at ``dcgan.py:76-84``); we apply it unless ``compat_no_tanh``.
* :class:`DCGANDiscriminator` — mirror: stride-2 4x4 convs doubling channels
  (BN on all but the first), final 4x4 VALID conv to 1 logit, optional trailing
  LeakyReLU matching the reference's ``last_nonlinearity`` choice
  (``histopathology_gan.py:191``).
* :class:`ConditionalDCGANGenerator` / :class:`ConditionalDCGANDiscriminator`
  — label-conditioned variants (``histopathology_gan.py:193-210``): one-hot
  concatenated to z (G) / broadcast as constant input channels (D).

Layout is NHWC (TPU-preferred); params float32, compute bfloat16 by default so
convs land on the MXU. Weight init mirrors DCGAN convention: conv kernels
N(0, 0.02), BN scale N(1, 0.02) (reference ``utils.py:23-29`` and torchgan's
default initializer).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rnagan_tpu.core.config import GANModelConfig


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


conv_init = nn.initializers.normal(0.02)


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def _num_repeats(size: int) -> int:
    if size < 16 or (size & (size - 1)) != 0:
        raise ValueError("image size must be >= 16 and a power of 2")
    return size.bit_length() - 4


class _BN(nn.Module):
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            scale_init=bn_scale_init,
        )(x)


class DCGANGenerator(nn.Module):
    cfg: GANModelConfig
    label_type: str = "none"
    #: serving paths set False to hand the tanh to the fused uint8 epilogue
    final_tanh: bool = True

    @nn.compact
    def __call__(self, z: jax.Array, labels: Optional[jax.Array] = None, train: bool = True) -> jax.Array:
        cfg = self.cfg
        dt = _dtype(cfg.compute_dtype)
        r = _num_repeats(cfg.out_size)
        d = cfg.step_channels * (2**r)
        if self.label_type == "required":
            onehot = jax.nn.one_hot(labels, cfg.num_classes, dtype=z.dtype)
            z = jnp.concatenate([z, onehot], axis=-1)
        x = z.astype(dt)[:, None, None, :]  # (N, 1, 1, encoding_dims)
        x = nn.ConvTranspose(d, (4, 4), (1, 1), padding="VALID", use_bias=not cfg.batchnorm,
                             dtype=dt, kernel_init=conv_init)(x)
        if cfg.batchnorm:
            x = _BN(dt)(x, train)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        for _ in range(r):
            d //= 2
            x = nn.ConvTranspose(d, (4, 4), (2, 2), padding="SAME",
                                 use_bias=not cfg.batchnorm, dtype=dt, kernel_init=conv_init)(x)
            if cfg.batchnorm:
                x = _BN(dt)(x, train)
            x = nn.leaky_relu(x, cfg.leaky_slope)
        x = nn.ConvTranspose(cfg.out_channels, (4, 4), (2, 2), padding="SAME",
                             use_bias=True, dtype=dt, kernel_init=conv_init)(x)
        x = x.astype(jnp.float32)
        return jnp.tanh(x) if self.final_tanh else x


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """2x bilinear upsample, align_corners=False semantics (torch
    ``nn.Upsample(scale_factor=2, mode='bilinear')``, reference ``dcgan.py:48``)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


def reflect_pad_hw(x: jax.Array, pad: int = 1) -> jax.Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class DCGANUpGenerator(nn.Module):
    """Resize-convolution generator (reference ``dcgan.py:8-99``)."""

    cfg: GANModelConfig
    compat_no_tanh: bool = False
    label_type: str = "none"

    @nn.compact
    def __call__(self, z: jax.Array, labels: Optional[jax.Array] = None, train: bool = True) -> jax.Array:
        cfg = self.cfg
        dt = _dtype(cfg.compute_dtype)
        r = _num_repeats(cfg.out_size)
        d = cfg.step_channels * (2**r)
        x = z.astype(dt)[:, None, None, :]
        x = nn.ConvTranspose(d, (4, 4), (1, 1), padding="VALID", use_bias=not cfg.batchnorm,
                             dtype=dt, kernel_init=conv_init)(x)
        if cfg.batchnorm:
            x = _BN(dt)(x, train)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        for _ in range(r):
            d //= 2
            x = upsample2x_bilinear(x)
            x = reflect_pad_hw(x, 1)
            x = nn.Conv(d, (3, 3), (1, 1), padding="VALID", dtype=dt, kernel_init=conv_init)(x)
            if cfg.batchnorm:
                x = _BN(dt)(x, train)
            x = nn.leaky_relu(x, cfg.leaky_slope)
        x = upsample2x_bilinear(x)
        x = reflect_pad_hw(x, 1)
        x = nn.Conv(cfg.out_channels, (3, 3), (1, 1), padding="VALID", dtype=dt, kernel_init=conv_init)(x)
        x = x.astype(jnp.float32)
        return x if self.compat_no_tanh else jnp.tanh(x)


class DCGANDiscriminator(nn.Module):
    cfg: GANModelConfig
    label_type: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None, train: bool = True) -> jax.Array:
        cfg = self.cfg
        dt = _dtype(cfg.compute_dtype)
        r = _num_repeats(cfg.out_size)
        d = cfg.step_channels
        if self.label_type == "required":
            onehot = jax.nn.one_hot(labels, cfg.num_classes, dtype=x.dtype)
            maps = jnp.broadcast_to(onehot[:, None, None, :], x.shape[:3] + (cfg.num_classes,))
            x = jnp.concatenate([x, maps], axis=-1)
        x = x.astype(dt)
        x = nn.Conv(d, (4, 4), (2, 2), padding=((1, 1), (1, 1)), dtype=dt, kernel_init=conv_init)(x)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        for _ in range(r):
            d *= 2
            x = nn.Conv(d, (4, 4), (2, 2), padding=((1, 1), (1, 1)), use_bias=not cfg.batchnorm,
                        dtype=dt, kernel_init=conv_init)(x)
            if cfg.batchnorm:
                x = _BN(dt)(x, train)
            x = nn.leaky_relu(x, cfg.leaky_slope)
        x = nn.Conv(1, (4, 4), (1, 1), padding="VALID", dtype=dt, kernel_init=conv_init)(x)
        x = x.astype(jnp.float32)
        if cfg.disc_last_leaky:
            x = nn.leaky_relu(x, cfg.leaky_slope)
        return x.reshape(x.shape[0])  # (N,) critic scores


class ConditionalDCGANGenerator(DCGANGenerator):
    label_type: str = "required"


class ConditionalDCGANDiscriminator(DCGANDiscriminator):
    label_type: str = "required"


def make_generator(cfg: GANModelConfig) -> nn.Module:
    """Architecture registry (reference ``histopathology_gan.py:175-246``;
    ``biggan``/``sagan`` there import missing modules and can never run —
    SURVEY.md section 2.5 — so they are not part of the buildable surface)."""
    if cfg.arch == "dcgan":
        return DCGANGenerator(cfg)
    if cfg.arch == "dcgan_up":
        return DCGANUpGenerator(cfg)
    if cfg.arch == "condgan":
        return ConditionalDCGANGenerator(cfg)
    raise ValueError(f"unknown gan arch: {cfg.arch}")


def make_discriminator(cfg: GANModelConfig) -> nn.Module:
    if cfg.arch in ("dcgan", "dcgan_up"):
        return DCGANDiscriminator(cfg)
    if cfg.arch == "condgan":
        return ConditionalDCGANDiscriminator(cfg)
    raise ValueError(f"unknown gan arch: {cfg.arch}")


def init_gan(cfg: GANModelConfig, key: jax.Array, batch: int = 2):
    """Initialize (generator_vars, discriminator_vars)."""
    gkey, dkey = jax.random.split(key)
    g = make_generator(cfg)
    d = make_discriminator(cfg)
    z = jnp.zeros((batch, cfg.encoding_dims), jnp.float32)
    img = jnp.zeros((batch, cfg.out_size, cfg.out_size, cfg.out_channels), jnp.float32)
    labels = jnp.zeros((batch,), jnp.int32) if cfg.arch == "condgan" else None
    gv = g.init(gkey, z, labels=labels, train=False)
    dv = d.init(dkey, img, labels=labels, train=False)
    return gv, dv
