"""Pallas kernels: interpret-mode correctness on CPU against XLA references."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu


def test_infusion_kernel_statistics(rng):
    from rnagan_tpu.ops.infusion import pallas_infused_noise

    z = jnp.asarray(rng.randn(32, 512).astype(np.float32) * 3)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_infused_noise(jnp.int32(7), z, 0.3, block=256)
    out = np.asarray(out)
    assert out.shape == (32, 512)
    # standardized over the batch with ddof=1 (torch.std parity)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=0, ddof=1), 1.0, atol=1e-4)
    # the z signal dominates the +-0.3 uniform noise
    corr = np.corrcoef(np.asarray(z)[:, 0], out[:, 0])[0, 1]
    assert corr > 0.9
    # deterministic re-run (interpret mode's PRNG ignores the seed value, so
    # cross-seed divergence is asserted on real TPU hardware instead — see the
    # TPU smoke in tools/tpu_smoke.py)
    with pltpu.force_tpu_interpret_mode():
        out2 = pallas_infused_noise(jnp.int32(7), z, 0.3, block=256)
    np.testing.assert_allclose(out, np.asarray(out2), atol=1e-6)


def test_quantize_kernel_matches_xla(rng):
    from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8, xla_tanh_to_uint8

    x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32) * 2)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_tanh_to_uint8(x))
    ref = np.asarray(xla_tanh_to_uint8(x))
    # round-half-up vs round-half-even can differ by 1 on exact .5 values
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    assert (got != ref).mean() < 0.01
    assert got.dtype == np.uint8


def test_quantize_kernel_range_endpoints():
    from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8

    x = jnp.asarray([[[[-100.0, 0.0, 100.0]]]], jnp.float32)  # saturates tanh
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_tanh_to_uint8(x))
    np.testing.assert_array_equal(got.ravel(), [0, 128, 255])


def test_quantize_large_map_blocks(rng):
    """256x256x3 maps must split into VMEM-sized lane blocks."""
    from rnagan_tpu.ops.quantize import _lane_block

    assert _lane_block(256 * 256 * 3, 64) * 64 * 4 <= 2 << 20
    assert (256 * 256 * 3) % _lane_block(256 * 256 * 3, 64) == 0


def test_fused_adam_matches_optax(rng):
    """ops/fused_adam.adam_update_flat == optax.adam, f32 bit-level math
    (same EMA + bias-correction formulas), including the padded tail when
    n is not a multiple of the kernel block."""
    import optax

    from rnagan_tpu.ops.fused_adam import adam_update_flat

    n = 128 * 2048 + 4321  # forces the zero-pad path
    p = jnp.asarray(rng.randn(n), jnp.float32)
    g = jnp.asarray(rng.randn(n) * 0.01, jnp.float32)
    lr, b1, b2, eps = 1e-4, 0.5, 0.999, 1e-8

    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    opt_state = tx.init(p)
    p_ref, st = p, opt_state
    for _ in range(3):
        upd, st = tx.update(g, st, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)

    mu = jnp.zeros_like(p)
    nu = jnp.zeros_like(p)
    p_k = p
    with pltpu.force_tpu_interpret_mode():
        for step in range(3):
            p_k, mu, nu = adam_update_flat(p_k, g, mu, nu, jnp.asarray(step),
                                           lr=lr, b1=b1, b2=b2, eps=eps)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_ref), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(st[0].mu), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(nu), np.asarray(st[0].nu), rtol=1e-6, atol=1e-9)
