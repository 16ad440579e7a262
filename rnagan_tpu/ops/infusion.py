"""Pallas TPU kernel: fused RNA-infusion noise.

The infusion prior (losses/rna_infusion.py, reference ``wgan_loss.py:97-106``)
is ``standardize(U(-r, r) + z_mean)`` over the batch. As XLA ops this is four
HBM round-trips over an (N, 2048) tensor (RNG dump, add, mean/var reduce,
normalize). This kernel does it in ONE pass per column block entirely in
VMEM: on-core PRNG -> uniform -> add -> batch mean/var -> normalize.

The batch dimension is small (N <= a few hundred) and the feature dimension is
2048, so the whole (N, block) tile fits VMEM; the grid runs over feature
blocks. Matches the reference's unbiased (ddof=1) torch.std semantics.

Intended for single-device serving paths; the training step keeps the XLA
version, whose global-batch reductions pjit turns into cross-chip collectives
automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _infusion_kernel(seed_ref, z_ref, out_ref, *, noise_range: float, n_valid: int):
    # independent stream per feature block
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    z = z_ref[:].astype(jnp.float32)
    bits = pltpu.prng_random_bits(z.shape)
    # uint32 -> [0, 1): keep the 24 high bits (fits an f32 mantissa exactly);
    # route the cast through int32 — Mosaic has no uint32->f32 cast
    hi24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u01 = hi24.astype(jnp.float32) * (1.0 / (1 << 24))
    noise = (u01 * 2.0 - 1.0) * noise_range + z
    n = jnp.float32(n_valid)
    mean = jnp.sum(noise, axis=0, keepdims=True) / n
    centered = noise - mean
    var = jnp.sum(centered * centered, axis=0, keepdims=True) / jnp.maximum(n - 1.0, 1.0)
    out_ref[:] = centered * jax.lax.rsqrt(var + 1e-12)


@functools.partial(jax.jit, static_argnames=("noise_range", "block"))
def pallas_infused_noise(seed: jax.Array, z_mean: jax.Array, noise_range: float = 0.3, block: int = 256) -> jax.Array:
    """seed: int32 scalar array; z_mean: (N, D) float. Returns standardized
    infused noise (N, D) float32."""
    n, d = z_mean.shape
    block = min(block, d)
    assert d % block == 0, "feature dim must divide the block size"
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    grid = (d // block,)
    return pl.pallas_call(
        functools.partial(_infusion_kernel, noise_range=noise_range, n_valid=n),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            # index maps get the scalar-prefetch ref as an extra trailing arg
            in_specs=[pl.BlockSpec((n, block), lambda i, s: (0, i), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, block), lambda i, s: (0, i), memory_space=pltpu.VMEM),
        ),
    )(seed, z_mean)
