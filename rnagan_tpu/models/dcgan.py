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


class ConvT4x4s2D2S(nn.Module):
    """``ConvTranspose(4x4, stride 2, SAME)`` as a phase-decomposed stride-1
    2x2 conv + pixel interleave (depth-to-space).

    XLA lowers a stride-2 transposed conv to ``conv_general_dilated`` with
    ``lhs_dilation=2`` — on TPU the systolic array then streams the inserted
    zeros, wasting up to 4x of the MXU work. The identity
    ``y[2u+pi, 2v+pj] = sum_{di,dj} w[pi+2di, pj+2dj] x[u+di-1+pi, v+dj-1+pj]``
    turns it into ONE dense stride-1 conv with the four parity-phase 2x2
    kernels stacked on the output-channel axis, followed by shifted slices and
    an interleaving reshape — exactly the true FLOPs, no zero padding work.

    Param tree (``kernel`` (4,4,in,out) [+ ``bias``]) and initialization are
    IDENTICAL to ``nn.ConvTranspose`` — checkpoints, torchgan ``.model``
    interop and init draws are unchanged; only the compute schedule differs.
    """

    features: int
    use_bias: bool
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin, cout = x.shape[-1], self.features
        kernel = self.param("kernel", conv_init, (4, 4, cin, cout), jnp.float32)
        k = kernel.astype(self.dtype)
        # phase (pi, pj) kernel = k[pi::2, pj::2] (2,2,cin,cout); stack phases
        # on the output-channel axis in (0,0),(0,1),(1,0),(1,1) order
        pk = jnp.concatenate([k[0::2, 0::2], k[0::2, 1::2], k[1::2, 0::2], k[1::2, 1::2]],
                             axis=-1)
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, pk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)  # (N, H+1, W+1, 4*cout)
        phases = [y[:, pi:pi + h, pj:pj + w, (2 * pi + pj) * cout:(2 * pi + pj + 1) * cout]
                  for pi in (0, 1) for pj in (0, 1)]
        out = jnp.stack(phases, axis=3).reshape(n, h, w, 2, 2, cout)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (cout,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


def _up_conv(impl: str, features: int, use_bias: bool, dt, name: str):
    """Stride-2 4x4 up-conv factory: 'xla' = nn.ConvTranspose (reference
    lowering), 'd2s' = phase-decomposed MXU-dense schedule. Explicit ``name``
    keeps the param tree identical across impls."""
    if impl == "d2s":
        return ConvT4x4s2D2S(features, use_bias, dt, name=name)
    return nn.ConvTranspose(features, (4, 4), (2, 2), padding="SAME", use_bias=use_bias,
                            dtype=dt, kernel_init=conv_init, name=name)


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
                             dtype=dt, kernel_init=conv_init, name="ConvTranspose_0")(x)
        if cfg.batchnorm:
            x = _BN(dt)(x, train)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        for i in range(r):
            d //= 2
            x = _up_conv(cfg.convt_impl, d, not cfg.batchnorm, dt,
                         name=f"ConvTranspose_{i + 1}")(x)
            if cfg.batchnorm:
                x = _BN(dt)(x, train)
            x = nn.leaky_relu(x, cfg.leaky_slope)
        x = _up_conv(cfg.convt_impl, cfg.out_channels, True, dt,
                     name=f"ConvTranspose_{r + 1}")(x)
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
    def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None, train: bool = True,
                 cond: Optional[jax.Array] = None) -> jax.Array:
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
        h = x  # final 4x4 feature map, (N, 4, 4, d)
        x = nn.Conv(1, (4, 4), (1, 1), padding="VALID", dtype=dt, kernel_init=conv_init)(h)
        score = x.astype(jnp.float32).reshape(x.shape[0])
        if cfg.critic == "projection":
            # Projection conditioning (arXiv:1802.05637 eq. 5) on a continuous
            # embedding: score += <W c, sum-pool phi(x)>. Gives the critic —
            # and through it the generator — a gradient toward matching tiles
            # to the patient embedding, the channel the reference's
            # unconditional critic lacks (wgan_loss.py:131-263;
            # docs/quality/REPRESENTATION.md's structural diagnosis).
            if cond is None:
                raise ValueError("critic='projection' requires cond (z_mean)")
            pooled = jnp.sum(h, axis=(1, 2))  # (N, d) global sum pool
            proj = nn.Dense(pooled.shape[-1], use_bias=False, dtype=dt,
                            kernel_init=nn.initializers.normal(0.02),
                            name="cond_proj")(cond.astype(dt))
            score = score + jnp.sum(pooled * proj, axis=-1).astype(jnp.float32)
        if cfg.disc_last_leaky:
            score = nn.leaky_relu(score, cfg.leaky_slope)
        return score  # (N,) critic scores


class ConditionalDCGANGenerator(DCGANGenerator):
    label_type: str = "required"


class ConditionalDCGANDiscriminator(DCGANDiscriminator):
    label_type: str = "required"


def make_generator(cfg: GANModelConfig) -> nn.Module:
    """Architecture registry (reference ``histopathology_gan.py:175-246``).
    ``sagan``/``biggan`` there import missing modules and can never run
    (SURVEY.md section 2.5); models/sagan.py and models/biggan.py build the
    intended surface. Imported lazily — they import from this module."""
    if cfg.arch == "dcgan":
        return DCGANGenerator(cfg)
    if cfg.arch == "dcgan_up":
        return DCGANUpGenerator(cfg)
    if cfg.arch == "condgan":
        return ConditionalDCGANGenerator(cfg)
    if cfg.arch == "sagan":
        from rnagan_tpu.models.sagan import SAGANGenerator

        return SAGANGenerator(cfg)
    if cfg.arch == "biggan":
        from rnagan_tpu.models.biggan import BigGANGenerator

        return BigGANGenerator(cfg)
    raise ValueError(f"unknown gan arch: {cfg.arch}")


def make_discriminator(cfg: GANModelConfig) -> nn.Module:
    if cfg.arch in ("dcgan", "dcgan_up"):
        return DCGANDiscriminator(cfg)
    if cfg.arch == "condgan":
        return ConditionalDCGANDiscriminator(cfg)
    if cfg.arch == "sagan":
        from rnagan_tpu.models.sagan import SAGANDiscriminator

        return SAGANDiscriminator(cfg)
    if cfg.arch == "biggan":
        from rnagan_tpu.models.biggan import BigGANDiscriminator

        return BigGANDiscriminator(cfg)
    raise ValueError(f"unknown gan arch: {cfg.arch}")


def init_gan(cfg: GANModelConfig, key: jax.Array, batch: int = 2):
    """Initialize (generator_vars, discriminator_vars)."""
    gkey, dkey = jax.random.split(key)
    g = make_generator(cfg)
    d = make_discriminator(cfg)
    z = jnp.zeros((batch, cfg.encoding_dims), jnp.float32)
    img = jnp.zeros((batch, cfg.out_size, cfg.out_size, cfg.out_channels), jnp.float32)
    conditional = cfg.arch == "condgan" or (cfg.arch == "biggan" and cfg.num_classes > 0)
    labels = jnp.zeros((batch,), jnp.int32) if conditional else None
    gv = g.init(gkey, z, labels=labels, train=False)
    dkw = {}
    if cfg.critic == "projection":
        # cond is the frozen-VAE z_mean, same width as the infusion prior
        dkw["cond"] = jnp.zeros((batch, cfg.encoding_dims), jnp.float32)
    dv = d.init(dkey, img, labels=labels, train=False, **dkw)
    return gv, dv
