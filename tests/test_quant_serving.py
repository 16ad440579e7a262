"""int8 quantized head: matmul kernel parity, head-matrix math exactness,
end-to-end quantized serving accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from rnagan_tpu.core.config import GANModelConfig
from rnagan_tpu.eval.serving import (
    dcgan_lax_apply,
    fold_generator,
    head_weight_matrix,
    make_serving_fn,
)
from rnagan_tpu.models.dcgan import init_gan, make_generator
from rnagan_tpu.ops.quant_matmul import pallas_int8_matmul, quantize_per_channel, xla_int8_matmul

CFG = GANModelConfig(encoding_dims=16, out_size=32, step_channels=8, compute_dtype="float32")


def test_quantize_per_channel_bounds(rng):
    w = rng.randn(32, 16).astype(np.float32) * np.linspace(0.1, 5, 16)
    q, s = quantize_per_channel(w)
    assert q.dtype == np.int8 and np.abs(q).max() <= 127
    np.testing.assert_allclose(q * s[None, :], w, atol=np.abs(w).max(axis=0).max() / 127 + 1e-6)


def test_pallas_int8_matmul_matches_xla(rng):
    x = rng.randn(8, 128).astype(np.float32)
    w = rng.randn(128, 512).astype(np.float32)
    q, s = quantize_per_channel(w)
    bias = rng.randn(512).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), jnp.asarray(bias), block_m=256))
    ref = np.asarray(xla_int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), jnp.asarray(bias)))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    # and both approximate the true f32 product within quantization error
    true = x @ w + bias
    rel = np.abs(got - true).max() / np.abs(true).max()
    assert rel < 0.03


def test_head_weight_matrix_exactness(rng):
    """Matmul with the derived weight matrix == the ConvTranspose head."""
    from jax import lax

    K = jnp.asarray(rng.randn(4, 4, 6, 5).astype(np.float32))
    z = jnp.asarray(rng.randn(3, 6).astype(np.float32))
    ref = lax.conv_transpose(z[:, None, None, :], K, (1, 1), "VALID",
                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w_mat = head_weight_matrix(np.asarray(K))
    got = (np.asarray(z) @ w_mat).reshape(3, 4, 4, 5)
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)


def test_dcgan_lax_apply_matches_flax(rng):
    gv, _ = init_gan(CFG, jax.random.key(0))
    module, variables = fold_generator(CFG, gv["params"], gv["batch_stats"])
    z = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    ref = module.apply(variables, z, train=False)
    got = dcgan_lax_apply(CFG, variables["params"], z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_quantized_serving_fn_accuracy(rng):
    gv, _ = init_gan(CFG, jax.random.key(0))
    z = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    ref_fn = make_serving_fn(CFG, gv["params"], gv["batch_stats"], uint8_output=False)
    ref = np.asarray(ref_fn(z))
    with pltpu.force_tpu_interpret_mode():
        q_fn = make_serving_fn(CFG, gv["params"], gv["batch_stats"], uint8_output=False,
                               quantized_head=True)
        got = np.asarray(q_fn(z))
    # int8 head + downstream nonlinearity: small bounded deviation
    assert np.abs(got - ref).max() < 0.05
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


# ------------------------------------------------------------ full int8 stack


def test_int8_full_stack_matches_f32_path():
    """W8A8 generator vs the f32 lax path: per-layer per-tensor/per-channel
    symmetric quantization must track the float output closely on realistic
    (DCGAN-init) weights."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rnagan_tpu.core.config import GANModelConfig
    from rnagan_tpu.eval.serving import (dcgan_int8_apply, dcgan_lax_apply,
                                         fold_generator, quantize_generator_params)
    from rnagan_tpu.models.dcgan import init_gan

    cfg = GANModelConfig(out_size=64, step_channels=16, encoding_dims=32,
                         compute_dtype="float32")
    gv, _ = init_gan(cfg, jax.random.key(0))
    _, folded = fold_generator(cfg, gv["params"], gv["batch_stats"])
    qparams = quantize_generator_params(cfg, folded["params"])

    noise = jax.random.normal(jax.random.key(1), (4, 32), jnp.float32)
    ref = np.asarray(dcgan_lax_apply(cfg, folded["params"], noise))
    q = np.asarray(dcgan_int8_apply(cfg, qparams, noise))
    assert ref.shape == q.shape == (4, 64, 64, 3)
    corr = np.corrcoef(ref.ravel(), q.ravel())[0, 1]
    assert corr > 0.995, corr
    # bounded error in tanh output space (images in [-1, 1])
    assert np.mean(np.abs(ref - q)) < 0.02, np.mean(np.abs(ref - q))
    assert np.max(np.abs(ref - q)) < 0.25, np.max(np.abs(ref - q))


def test_int8_serving_fn_wiring():
    """make_serving_fn(quantized_full=True) builds and runs (f32 egress on
    CPU; the uint8 Pallas epilogue is TPU-only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from rnagan_tpu.core.config import GANModelConfig
    from rnagan_tpu.eval.serving import make_serving_fn
    from rnagan_tpu.models.dcgan import init_gan

    cfg = GANModelConfig(out_size=32, step_channels=8, encoding_dims=16,
                         compute_dtype="float32")
    gv, _ = init_gan(cfg, jax.random.key(0))
    fn = make_serving_fn(cfg, gv["params"], gv["batch_stats"],
                         uint8_output=False, quantized_full=True)
    imgs = np.asarray(fn(jnp.zeros((2, 16), jnp.float32)))
    assert imgs.shape == (2, 32, 32, 3)
    assert np.abs(imgs).max() <= 1.0

    up = GANModelConfig(arch="dcgan_up", out_size=32, step_channels=8, encoding_dims=16)
    gv_up, _ = init_gan(up, jax.random.key(1))
    with pytest.raises(ValueError):
        make_serving_fn(up, gv_up["params"], gv_up["batch_stats"],
                        uint8_output=False, quantized_full=True)
