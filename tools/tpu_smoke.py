"""Real-TPU smoke for the Pallas kernels (run manually: python tools/tpu_smoke.py).

Covers what interpret mode cannot: seed-dependence of the on-core PRNG and
compiled-vs-interpret numerical agreement.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from rnagan_tpu.ops.infusion import pallas_infused_noise
    from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8, xla_tanh_to_uint8

    z = jax.random.normal(jax.random.key(0), (64, 2048)) * 3
    a = np.asarray(pallas_infused_noise(jnp.int32(7), z))
    b = np.asarray(pallas_infused_noise(jnp.int32(7), z))
    c = np.asarray(pallas_infused_noise(jnp.int32(8), z))
    assert np.allclose(a, b), "same seed must reproduce"
    assert not np.allclose(a, c), "different seeds must differ"
    assert abs(a.mean()) < 1e-3 and abs(a.std(ddof=1) - 1.0) < 1e-2
    print("infusion kernel: ok (seeded, standardized)")

    x = jax.random.normal(jax.random.key(1), (64, 256, 256, 3)) * 2
    got = np.asarray(pallas_tanh_to_uint8(x))
    ref = np.asarray(xla_tanh_to_uint8(x))
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    print("quantize kernel: ok (matches XLA within rounding)")

    # micro-benchmark: fused uint8 epilogue vs f32 + host convert
    jax.block_until_ready(pallas_tanh_to_uint8(x))
    t0 = time.perf_counter(); u8 = np.asarray(pallas_tanh_to_uint8(x)); t_u8 = time.perf_counter() - t0
    t0 = time.perf_counter(); f32 = np.asarray(jnp.tanh(x)); _ = ((f32 * .5 + .5) * 255).astype(np.uint8); t_f32 = time.perf_counter() - t0
    print(f"device->host per 64 tiles: uint8 {t_u8*1e3:.1f} ms vs f32+host-convert {t_f32*1e3:.1f} ms")

    # int8 quantized matmul kernel (generator head)
    from rnagan_tpu.ops.quant_matmul import pallas_int8_matmul, quantize_per_channel, xla_int8_matmul

    rngk = jax.random.key(2)
    xq = jax.random.normal(rngk, (64, 2048))
    w = np.asarray(jax.random.normal(jax.random.fold_in(rngk, 1), (2048, 4096))) * 0.02
    q, s = quantize_per_channel(w)
    bias = np.zeros(4096, np.float32)
    got = np.asarray(pallas_int8_matmul(xq, jnp.asarray(q), jnp.asarray(s), jnp.asarray(bias)))
    ref = np.asarray(xla_int8_matmul(xq, jnp.asarray(q), jnp.asarray(s), jnp.asarray(bias)))
    assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 0.02
    print("int8 matmul kernel: ok")


if __name__ == "__main__":
    main()
