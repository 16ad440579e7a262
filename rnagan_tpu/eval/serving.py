"""Serving-path optimizations for tile synthesis.

At inference the generator's BatchNorms use fixed running statistics, so each
(ConvTranspose/Conv -> BN) pair folds into a single conv with per-output-
channel rescaled kernel and bias:

    y = scale * (conv(x) - mean) / sqrt(var + eps) + bias
      = conv'(x) + bias'     with  k' = k * g,  bias' = bias - g * mean,
                                   g = scale / sqrt(var + eps)

This removes every BN op from the serving graph (VPU work + HBM round-trips
between MXU convs). Measured on v5e (tools/serve_bench.py, batch 64, 256px):
folding gains ~3% (16.6k -> 17.0k tiles/s). Casting *weights* to bfloat16
REGRESSES ~25% on this backend (13.0k tiles/s) — XLA already runs f32-param
convs on the bf16 MXU, and explicit bf16 weights select a slower path — so
``weights_dtype`` defaults to float32. The fused uint8 epilogue costs ~5%
on-device but shrinks device->host transfers 4x (the right trade whenever
tiles leave the chip: 0.6s vs 4.2s per 64-tile fetch over this link).

``fold_generator`` returns a ``batchnorm=False`` generator config + folded
params that produce bit-comparable outputs to the original eval-mode model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnagan_tpu.core.config import GANModelConfig
from rnagan_tpu.models.dcgan import make_generator


def _fold_pair(kernel: np.ndarray, conv_bias, bn_params, bn_stats, eps: float = 1e-5):
    """Fold BN into a conv kernel whose LAST axis is the output channel
    (flax HWIO for both Conv and ConvTranspose)."""
    scale = np.asarray(bn_params["scale"], np.float64)
    bias = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    g = scale / np.sqrt(var + eps)
    k = np.asarray(kernel, np.float64) * g  # broadcast over last axis
    b = bias - g * mean
    if conv_bias is not None:
        b = b + g * np.asarray(conv_bias, np.float64)
    return k.astype(np.float32), b.astype(np.float32)


def fold_generator(
    cfg: GANModelConfig, g_params: Dict[str, Any], g_stats: Dict[str, Any], *, dtype=jnp.float32
) -> Tuple[Any, Dict[str, Any]]:
    """Fold every ConvT/Conv+BN pair of a DCGAN-family generator. Returns
    ``(folded_generator_module, {'params': ...})`` — a ``batchnorm=False``
    generator (convs with biases, no BN) numerically equivalent to the
    eval-mode original."""
    if not cfg.batchnorm:
        module = make_generator(cfg)
        return module, {"params": jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), g_params)}

    params = jax.tree_util.tree_map(np.asarray, g_params)
    stats = jax.tree_util.tree_map(np.asarray, g_stats)

    # dcgan: ConvTranspose_0..n; dcgan_up: ConvTranspose_0 head then Conv_0..n
    conv_names = sorted(
        [k for k in params if k.startswith(("ConvTranspose_", "Conv_"))],
        key=lambda s: (0 if s.startswith("ConvTranspose_") else 1, int(s.split("_")[-1])),
    )
    bn_names = sorted([k for k in params if k.startswith("_BN_")], key=lambda s: int(s.split("_")[-1]))

    folded: Dict[str, Any] = {}
    for i, cname in enumerate(conv_names):
        leaf = dict(params[cname])
        if i < len(bn_names):  # every conv but the last has a BN after it
            bname = bn_names[i]
            bn_p = params[bname]["BatchNorm_0"]
            bn_s = stats[bname]["BatchNorm_0"]
            k, b = _fold_pair(leaf["kernel"], leaf.get("bias"), bn_p, bn_s)
            folded[cname] = {"kernel": k, "bias": b}
        else:
            folded[cname] = {
                "kernel": np.asarray(leaf["kernel"], np.float32),
                "bias": np.asarray(leaf["bias"], np.float32),
            }

    new_cfg = dataclasses.replace(cfg, batchnorm=False)
    module = make_generator(new_cfg)
    folded = {k: jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), v) for k, v in folded.items()}
    return module, {"params": folded}


def make_serving_fn(cfg: GANModelConfig, g_params, g_stats, *, weights_dtype=jnp.float32, uint8_output: bool = True):
    """Build the fastest synthesis function: BN-folded generator with
    ``weights_dtype`` weights, optionally ending in the fused Pallas
    tanh->uint8 epilogue (ops/quantize.py). Returns ``fn(noise) -> images``
    (uint8 NHWC or float32 [-1,1])."""
    module, variables = fold_generator(cfg, g_params, g_stats, dtype=weights_dtype)

    if uint8_output:
        from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8

        if cfg.arch in ("dcgan", "condgan"):
            # run the generator minus its final tanh, then the fused epilogue
            pre_module = dataclasses.replace(module, final_tanh=False)

            @jax.jit
            def fn(noise):
                pre = pre_module.apply(variables, noise, train=False)
                return pallas_tanh_to_uint8(pre, apply_tanh=True)

        else:  # resize-conv variant: module output already tanh'd
            @jax.jit
            def fn(noise):
                out = module.apply(variables, noise, train=False)
                return pallas_tanh_to_uint8(out, apply_tanh=False)

        return fn

    @jax.jit
    def fn(noise):
        return module.apply(variables, noise, train=False)

    return fn
