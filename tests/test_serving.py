"""Serving optimizations: BN folding equivalence and the fused uint8 path."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from rnagan_tpu.core.config import GANModelConfig
from rnagan_tpu.eval.serving import fold_generator, make_serving_fn
from rnagan_tpu.models.dcgan import init_gan, make_generator

CFG = GANModelConfig(encoding_dims=16, out_size=32, step_channels=8, compute_dtype="float32")


def _trained_like_stats(gv, seed=0):
    """Perturb batch_stats away from init (mean 0 / var 1) so folding is
    actually exercised."""
    rng = np.random.RandomState(seed)

    def perturb(path, x):
        x = np.asarray(x)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return x + rng.randn(*x.shape).astype(np.float32) * 0.2
        return x * (1.0 + rng.rand(*x.shape).astype(np.float32))

    stats = jax.tree_util.tree_map_with_path(perturb, gv["batch_stats"])
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: np.asarray(x) + rng.randn(*np.asarray(x).shape).astype(np.float32) * 0.05,
        gv["params"],
    )
    return params, stats


def test_fold_generator_equivalence(rng):
    gv, _ = init_gan(CFG, jax.random.key(0))
    params, stats = _trained_like_stats(gv)
    gen = make_generator(CFG)
    z = jnp.asarray(rng.randn(4, 16), jnp.float32)
    ref = gen.apply({"params": params, "batch_stats": stats}, z, train=False)
    module, variables = fold_generator(CFG, params, stats)
    got = module.apply(variables, z, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fold_generator_up_variant(rng):
    cfg = GANModelConfig(arch="dcgan_up", encoding_dims=16, out_size=32, step_channels=8,
                         compute_dtype="float32")
    gv, _ = init_gan(cfg, jax.random.key(1))
    params, stats = _trained_like_stats(gv, seed=1)
    gen = make_generator(cfg)
    z = jnp.asarray(rng.randn(2, 16), jnp.float32)
    ref = gen.apply({"params": params, "batch_stats": stats}, z, train=False)
    module, variables = fold_generator(cfg, params, stats)
    got = module.apply(variables, z, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_serving_fn_uint8(rng):
    gv, _ = init_gan(CFG, jax.random.key(0))
    params, stats = _trained_like_stats(gv)
    z = jnp.asarray(rng.randn(4, 16), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        fn = make_serving_fn(CFG, params, stats, weights_dtype=jnp.float32, uint8_output=True)
        got = np.asarray(fn(z))
    assert got.dtype == np.uint8 and got.shape == (4, 32, 32, 3)
    # equals the float path quantized
    fn_f = make_serving_fn(CFG, params, stats, weights_dtype=jnp.float32, uint8_output=False)
    ref = np.clip(np.round((np.asarray(fn_f(z)) * 0.5 + 0.5) * 255), 0, 255).astype(np.uint8)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_resize_conv_fusion_interior_exact(rng):
    """(2x bilinear upsample -> reflect pad -> 3x3 conv) == one stride-2
    transposed conv with the tent-composed kernel, everywhere except the
    2-pixel border (documented semantics difference)."""
    from jax import lax

    from rnagan_tpu.eval.serving import fused_up_block, resize_conv_to_transposed
    from rnagan_tpu.models.dcgan import reflect_pad_hw, upsample2x_bilinear

    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    k3 = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    bias = jnp.asarray(rng.randn(4).astype(np.float32))
    ref = lax.conv_general_dilated(
        reflect_pad_hw(upsample2x_bilinear(x), 1), k3, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    k6 = jnp.asarray(resize_conv_to_transposed(np.asarray(k3)))
    got = fused_up_block(x, k6, bias)
    assert got.shape == ref.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(
        np.asarray(got)[:, 2:-2, 2:-2], np.asarray(ref)[:, 2:-2, 2:-2], atol=1e-4
    )


def test_fused_up_block_exact_border(rng):
    """fused_up_block_exact == the two-op pipeline EVERYWHERE (the edge-strip
    fix-up recomputes the 2px frame with the original ops)."""
    from jax import lax

    from rnagan_tpu.eval.serving import fused_up_block_exact, resize_conv_to_transposed
    from rnagan_tpu.models.dcgan import reflect_pad_hw, upsample2x_bilinear

    for h in (4, 8, 11):
        x = jnp.asarray(rng.randn(2, h, h, 3).astype(np.float32))
        k3 = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
        bias = jnp.asarray(rng.randn(4).astype(np.float32))
        ref = lax.conv_general_dilated(
            reflect_pad_hw(upsample2x_bilinear(x), 1), k3, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        k6 = jnp.asarray(resize_conv_to_transposed(np.asarray(k3)))
        got = fused_up_block_exact(x, k6, k3, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_serving_fn_dcgan_up_uses_fused_path_and_matches_module(rng):
    """make_serving_fn(arch=dcgan_up) serves through the fused transposed-conv
    kernels and equals the flax DCGANUpGenerator in eval mode (borders
    included, thanks to the exact fix-up)."""
    cfg = GANModelConfig(arch="dcgan_up", encoding_dims=16, out_size=32,
                         step_channels=8, compute_dtype="float32")
    gv, _ = init_gan(cfg, jax.random.key(1))
    params, stats = _trained_like_stats(gv)
    z = jnp.asarray(rng.randn(4, 16), jnp.float32)

    ref = make_generator(cfg).apply({"params": params, "batch_stats": stats}, z, train=False)

    fn_f = make_serving_fn(cfg, params, stats, uint8_output=False)
    got = np.asarray(fn_f(z))
    np.testing.assert_allclose(got, np.asarray(ref), atol=5e-4)

    with pltpu.force_tpu_interpret_mode():
        fn_u8 = make_serving_fn(cfg, params, stats, uint8_output=True)
        got8 = np.asarray(fn_u8(z))
    ref8 = np.clip(np.round((np.asarray(ref) * 0.5 + 0.5) * 255), 0, 255).astype(np.uint8)
    assert got8.dtype == np.uint8
    assert np.abs(got8.astype(int) - ref8.astype(int)).max() <= 1


def test_serving_fn_dcgan_up_quantized_head(rng):
    """The int8 Pallas head composes with the fused resize-conv path."""
    cfg = GANModelConfig(arch="dcgan_up", encoding_dims=16, out_size=32,
                         step_channels=8, compute_dtype="float32")
    gv, _ = init_gan(cfg, jax.random.key(2))
    params, stats = _trained_like_stats(gv)
    z = jnp.asarray(rng.randn(4, 16), jnp.float32)
    ref = np.asarray(make_generator(cfg).apply(
        {"params": params, "batch_stats": stats}, z, train=False))
    with pltpu.force_tpu_interpret_mode():
        fn = make_serving_fn(cfg, params, stats, uint8_output=False, quantized_head=True)
        got = np.asarray(fn(z))
    # int8 head quantization error propagates: demand close-but-not-exact
    assert got.shape == ref.shape
    assert np.abs(got - ref).mean() < 0.05
