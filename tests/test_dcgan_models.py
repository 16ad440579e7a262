"""DCGAN model family: shapes, channel schedule, conditional variants,
resize-conv generator, init statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnagan_tpu.core.config import GANModelConfig
from rnagan_tpu.models.dcgan import (
    DCGANDiscriminator,
    DCGANGenerator,
    DCGANUpGenerator,
    init_gan,
    make_discriminator,
    make_generator,
    upsample2x_bilinear,
)

CFG32 = GANModelConfig(encoding_dims=32, out_size=32, step_channels=8, compute_dtype="float32")


def _init_and_run(module, *args, **kwargs):
    variables = module.init(jax.random.key(0), *args, **kwargs)
    out = module.apply(variables, *args, **kwargs)
    return variables, out


def test_generator_output_shape_and_range():
    g = DCGANGenerator(CFG32)
    z = jax.random.normal(jax.random.key(1), (4, 32))
    variables, out = _init_and_run(g, z, train=False)
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(out))) <= 1.0
    # head channels: step * 2**(bit_length-4) = 8 * 4 = 32 for 32px
    head_kernel = variables["params"]["ConvTranspose_0"]["kernel"]
    assert head_kernel.shape[-1] == 32


def test_generator_256_channel_schedule():
    cfg = GANModelConfig(encoding_dims=8, out_size=256, step_channels=4, compute_dtype="float32")
    g = DCGANGenerator(cfg)
    z = jnp.zeros((1, 8))
    variables = g.init(jax.random.key(0), z, train=False)
    # 256px -> 5 up blocks; head channels 4 * 32 = 128 (matches reference
    # torchgan schedule 2048 for step 64, histopathology_gan.py:175-185)
    assert variables["params"]["ConvTranspose_0"]["kernel"].shape[-1] == 128
    out = g.apply(variables, z, train=False)
    assert out.shape == (1, 256, 256, 3)


def test_discriminator_shape_and_bn_layout():
    d = DCGANDiscriminator(CFG32)
    x = jax.random.normal(jax.random.key(2), (4, 32, 32, 3))
    variables, out = _init_and_run(d, x, train=False)
    assert out.shape == (4,)
    # first conv has no BN; each later block has one
    n_bn = len(variables.get("batch_stats", {}))
    assert n_bn == 32 .bit_length() - 4  # num_repeats


def test_up_generator_shapes_and_bilinear():
    g = DCGANUpGenerator(CFG32)
    z = jax.random.normal(jax.random.key(1), (2, 32))
    _, out = _init_and_run(g, z, train=False)
    assert out.shape == (2, 32, 32, 3)
    # bilinear upsample matches torch align_corners=False on a ramp
    torch = pytest.importorskip("torch")
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    ours = np.asarray(upsample2x_bilinear(jnp.asarray(x)))[0, :, :, 0]
    ref = torch.nn.functional.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2), scale_factor=2, mode="bilinear", align_corners=False
    )[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conditional_variants():
    cfg = GANModelConfig(arch="condgan", encoding_dims=16, out_size=32, step_channels=8,
                         num_classes=3, compute_dtype="float32")
    g = make_generator(cfg)
    d = make_discriminator(cfg)
    z = jax.random.normal(jax.random.key(0), (4, 16))
    labels = jnp.asarray([0, 1, 2, 1])
    gv = g.init(jax.random.key(1), z, labels=labels, train=False)
    imgs = g.apply(gv, z, labels=labels, train=False)
    assert imgs.shape == (4, 32, 32, 3)
    dv = d.init(jax.random.key(2), imgs, labels=labels, train=False)
    scores = d.apply(dv, imgs, labels=labels, train=False)
    assert scores.shape == (4,)
    # label matters: different labels change the generator output
    imgs2 = g.apply(gv, z, labels=jnp.asarray([1, 1, 1, 1]), train=False)
    assert not np.allclose(np.asarray(imgs), np.asarray(imgs2))


def test_init_gan_and_weight_stats():
    gv, dv = init_gan(CFG32, jax.random.key(0))
    k = np.asarray(gv["params"]["ConvTranspose_0"]["kernel"])
    # DCGAN init: N(0, 0.02)
    assert abs(k.std() - 0.02) < 0.005
    assert abs(k.mean()) < 0.005
    assert "batch_stats" in gv and "batch_stats" in dv


def test_invalid_size_rejected():
    with pytest.raises(ValueError):
        DCGANGenerator(GANModelConfig(out_size=100)).init(
            jax.random.key(0), jnp.zeros((1, 2048)), train=False
        )


def test_convt_d2s_matches_xla_lowering():
    """ConvT4x4s2D2S (phase-decomposed stride-1 conv + depth-to-space) must be
    numerically identical to nn.ConvTranspose: same param tree, same init
    draws, same forward, same grads — only the MXU schedule differs (no
    lhs_dilation zero-stuffing)."""
    import jax
    import jax.numpy as jnp

    from rnagan_tpu.core.config import GANModelConfig
    from rnagan_tpu.models.dcgan import DCGANGenerator

    z = jnp.asarray(np.random.RandomState(0).randn(4, 32).astype(np.float32))
    variables, outs, models = [], [], []
    for impl in ("xla", "d2s"):
        cfg = GANModelConfig(out_size=32, step_channels=8, encoding_dims=32,
                             compute_dtype="float32", convt_impl=impl)
        m = DCGANGenerator(cfg)
        v = m.init(jax.random.key(7), z)
        models.append(m)
        variables.append(v)
        outs.append(np.asarray(m.apply(v, z, train=False)))
    paths = [jax.tree_util.tree_leaves_with_path(v) for v in variables]
    assert [str(p) for p, _ in paths[0]] == [str(p) for p, _ in paths[1]]
    for (_, a), (_, b) in zip(*paths):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    grads = [jax.grad(lambda v, mm=m: jnp.sum(mm.apply(v, z, train=False) ** 2))(vv)
             for m, vv in zip(models, variables)]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4),
        grads[0], grads[1])
