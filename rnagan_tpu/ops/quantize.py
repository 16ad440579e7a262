"""Pallas TPU kernel: fused tanh -> un-normalize -> uint8 quantization.

The serving path ends with the generator's float output being tanh-squashed,
un-normalized from [-1,1] to [0,255] and cast to uint8 for storage/host
transfer (reference ``gan_utils.py:236-243`` does this on host after moving
float32 tensors off-device). Fusing the whole epilogue on the TPU means the
device->host transfer is uint8 — 4x less PCIe/ICI traffic per tile — and the
intermediate float image never round-trips HBM.

Input is the generator's PRE-tanh activation (any float dtype); output uint8.
uint8 tiles on TPU require (32, 128)-aligned blocks; the wrapper flattens
NHWC to (N, H*W*C) rows so the lane dimension is wide and aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_kernel(x_ref, out_ref, *, apply_tanh: bool):
    x = x_ref[:].astype(jnp.float32)
    if apply_tanh:
        x = jnp.tanh(x)
    x01 = x * 0.5 + 0.5
    scaled = jnp.clip(x01 * 255.0 + 0.5, 0.0, 255.0)  # round-half-up like np.round for x>=0
    # Mosaic has no f32->uint8 cast; go through int32
    out_ref[:] = scaled.astype(jnp.int32).astype(jnp.uint8)


def _lane_block(hwc: int, n: int, budget_bytes: int = 2 << 20) -> int:
    """Largest power-of-two-divisor lane block keeping the f32 input block
    under the VMEM budget (blocks stay 128-lane aligned for big maps)."""
    block = hwc
    while block * n * 4 > budget_bytes and block % 2 == 0:
        block //= 2
    return block


@functools.partial(jax.jit, static_argnames=("apply_tanh",))
def pallas_tanh_to_uint8(x: jax.Array, apply_tanh: bool = True) -> jax.Array:
    """x: (N, H, W, C) generator activations (pre-tanh when ``apply_tanh``,
    already in [-1,1] otherwise) -> (N, H, W, C) uint8."""
    n, h, w, c = x.shape
    hwc = h * w * c
    flat = x.reshape(n, hwc)
    block = _lane_block(hwc, n)
    out = pl.pallas_call(
        functools.partial(_quant_kernel, apply_tanh=apply_tanh),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.uint8),
        grid=(hwc // block,),
        in_specs=[pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(flat)
    return out.reshape(n, h, w, c)


def xla_tanh_to_uint8(x: jax.Array) -> jax.Array:
    """Reference implementation (for parity tests and non-TPU backends)."""
    x01 = jnp.tanh(x.astype(jnp.float32)) * 0.5 + 0.5
    return jnp.clip(jnp.round(x01 * 255.0), 0, 255).astype(jnp.uint8)
