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


def head_weight_matrix(kernel: np.ndarray) -> np.ndarray:
    """The 4x4 VALID ConvTranspose head on a 1x1 input is a matmul:
    out[b, i, j, o] = sum_c z[b, c] * K[3-i, 3-j, c, o]   (lax.conv_transpose
    convolves with the spatially flipped kernel). Returns the (Cin,
    4*4*Cout) matrix whose columns are flattened (i, j, o)."""
    k = np.asarray(kernel, np.float32)[::-1, ::-1]  # flip both spatial axes
    kh, kw, cin, cout = k.shape
    return np.ascontiguousarray(k.transpose(2, 0, 1, 3).reshape(cin, kh * kw * cout))


def quantized_head_fn(params: dict, cfg: GANModelConfig, leaky_slope: float):
    """int8-quantized head: z -> (N, 4, 4, C0) features via the Pallas
    int8 matmul (ops/quant_matmul.py). ``params`` = folded generator params."""
    from rnagan_tpu.ops.quant_matmul import pallas_int8_matmul, quantize_per_channel

    head = params["ConvTranspose_0"]
    kernel = np.asarray(head["kernel"])
    kh, kw, cin, cout = kernel.shape
    w_mat = head_weight_matrix(kernel)
    w_q, scales = quantize_per_channel(w_mat)
    bias = np.tile(np.asarray(head["bias"], np.float32), kh * kw)  # per (i,j,o) column
    w_q_j, scales_j, bias_j = jnp.asarray(w_q), jnp.asarray(scales), jnp.asarray(bias)

    def fn(z):
        out = pallas_int8_matmul(z.astype(jnp.float32), w_q_j, scales_j, bias_j)
        n = out.shape[0]
        return out.reshape(n, kh, kw, cout)

    return fn


def dcgan_lax_apply(cfg: GANModelConfig, params: dict, noise: jax.Array, *,
                    head_fn=None, final_tanh: bool = True) -> jax.Array:
    """Folded (batchnorm=False) DCGAN generator as plain lax ops — lets the
    head be swapped (e.g. the quantized Pallas matmul) without renaming the
    flax parameter tree. Numerically identical to the flax module."""
    import jax.lax as lax

    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    r = cfg.out_size.bit_length() - 4
    dn = ("NHWC", "HWIO", "NHWC")
    if head_fn is None:
        head = params["ConvTranspose_0"]
        x = lax.conv_transpose(noise.astype(dt)[:, None, None, :], head["kernel"].astype(dt),
                               (1, 1), "VALID", dimension_numbers=dn) + head["bias"].astype(dt)
    else:
        x = head_fn(noise).astype(dt)
    x = jax.nn.leaky_relu(x, cfg.leaky_slope)
    for i in range(1, r + 1):
        leaf = params[f"ConvTranspose_{i}"]
        x = lax.conv_transpose(x, leaf["kernel"].astype(dt), (2, 2), "SAME",
                               dimension_numbers=dn) + leaf["bias"].astype(dt)
        x = jax.nn.leaky_relu(x, cfg.leaky_slope)
    leaf = params[f"ConvTranspose_{r + 1}"]
    x = lax.conv_transpose(x, leaf["kernel"].astype(dt), (2, 2), "SAME",
                           dimension_numbers=dn) + leaf["bias"].astype(dt)
    x = x.astype(jnp.float32)
    return jnp.tanh(x) if final_tanh else x


# ----------------------------------------------------------------- int8 stack


def quantize_generator_params(cfg: GANModelConfig, folded_params: Dict[str, Any]) -> Dict[str, Any]:
    """Per-output-channel symmetric int8 quantization of every transposed-conv
    kernel of a BN-folded ``dcgan`` generator (biases stay float32). With the
    whole stack in int8 the convs run on the MXU's double-rate int8 path and
    weight HBM traffic halves vs bf16 (quarters vs f32)."""
    out = {}
    r = cfg.out_size.bit_length() - 4
    for i in range(r + 2):
        leaf = folded_params[f"ConvTranspose_{i}"]
        w = np.asarray(leaf["kernel"], np.float32)  # (H, W, I, O)
        s = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
        s = np.where(s == 0.0, 1.0, s).astype(np.float32)
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        out[f"ConvTranspose_{i}"] = {
            "kernel_q": jnp.asarray(wq),
            "w_scale": jnp.asarray(s),
            "bias": jnp.asarray(np.asarray(leaf["bias"], np.float32)),
        }
    return out


def _int8_conv_transpose(x: jax.Array, leaf: Dict[str, jax.Array], strides, padding) -> jax.Array:
    """Dynamic per-tensor activation quant -> int8 transposed conv (int32
    accumulate) -> float32 dequant with the fused activation*weight scale."""
    a = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x / a), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_transpose(
        xq, leaf["kernel_q"], strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (a * leaf["w_scale"]) + leaf["bias"]


def dcgan_int8_apply(cfg: GANModelConfig, qparams: Dict[str, Any], noise: jax.Array, *,
                     final_tanh: bool = True) -> jax.Array:
    """W8A8 folded DCGAN generator: every layer quantizes its input
    per-tensor on the fly and runs an int8 transposed conv. Quantization
    error is bounded per layer by the 127-level grid (test-verified against
    the f32 path); intended for serving, not training."""
    r = cfg.out_size.bit_length() - 4
    x = _int8_conv_transpose(noise[:, None, None, :], qparams["ConvTranspose_0"], (1, 1), "VALID")
    x = jax.nn.leaky_relu(x, cfg.leaky_slope)
    for i in range(1, r + 1):
        x = _int8_conv_transpose(x, qparams[f"ConvTranspose_{i}"], (2, 2), "SAME")
        x = jax.nn.leaky_relu(x, cfg.leaky_slope)
    x = _int8_conv_transpose(x, qparams[f"ConvTranspose_{r + 1}"], (2, 2), "SAME")
    return jnp.tanh(x) if final_tanh else x


_BILINEAR_TAPS = np.array([0.25, 0.75, 0.75, 0.25], np.float64)  # 2x, align_corners=False


def resize_conv_to_transposed(kernel3: np.ndarray) -> np.ndarray:
    """Fuse (2x bilinear upsample -> 3x3 conv) into ONE stride-2 transposed
    convolution, in weight space.

    Math: bilinear 2x upsampling is itself a stride-2 transposed conv with the
    separable tent kernel t = [.25, .75, .75, .25]; convolving afterwards with
    K3 composes to a single transposed conv whose kernel is the full 2-D
    correlation of K3 with the tent — size 6x6. The interior of the output is
    bit-identical to the two-op pipeline; only a 2-pixel border differs
    (upsample edge-clamp + reflection pad vs. the transposed conv's implicit
    zeros), which the caller can reproduce or ignore (generator borders are
    cosmetically negligible at 256px). Removes one full-resolution HBM
    round-trip per up-block of the resize-conv generator.

    kernel3: (3, 3, Cin, Cout) -> (6, 6, Cin, Cout).
    """
    k3 = np.asarray(kernel3, np.float64)
    tent = np.outer(_BILINEAR_TAPS, _BILINEAR_TAPS)  # (4, 4)
    kh, kw, cin, cout = k3.shape
    out = np.zeros((kh + 3, kw + 3, cin, cout), np.float64)
    # full 2-D correlation of the tent with K3 per channel pair
    for dy in range(kh):
        for dx in range(kw):
            out[dy : dy + 4, dx : dx + 4] += tent[:, :, None, None] * k3[dy, dx]
    return out.astype(np.float32)


def fused_up_block(x: jax.Array, kernel6: jax.Array, bias: jax.Array) -> jax.Array:
    """Apply one fused resize-conv up-block: (N, H, W, Cin) -> (N, 2H, 2W, Cout).

    Alignment (verified empirically against the two-op pipeline): unflipped
    fused kernel, symmetric padding (3, 3) lands on the same 2H x 2W grid.
    """
    return jax.lax.conv_transpose(
        x, kernel6, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias


def _up_block_ref(x: jax.Array, kernel3: jax.Array, bias: jax.Array) -> jax.Array:
    """The original two-op up-block (2x bilinear upsample -> reflect-pad ->
    3x3 VALID conv), used on thin edge strips for the exact border fix-up."""
    from rnagan_tpu.models.dcgan import reflect_pad_hw, upsample2x_bilinear

    x = reflect_pad_hw(upsample2x_bilinear(x), 1)
    return jax.lax.conv_general_dilated(
        x, kernel3, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias


def fused_up_block_exact(x: jax.Array, kernel6: jax.Array, kernel3: jax.Array,
                         bias: jax.Array, *, small_exact: int = 16) -> jax.Array:
    """Fused up-block with EXACT border: the single stride-2 transposed conv
    handles the interior; the 2-pixel output frame (where the transposed
    conv's implicit zero padding diverges from upsample edge-clamp +
    reflection pad) is recomputed with the original two-op pipeline on edge
    strips — O(edge) extra work for bit-parity with the unfused generator.

    Strip size: upsampled row ``u[2i] = .25 x[i-1] + .75 x[i]``,
    ``u[2i+1] = .75 x[i] + .25 x[i+1]`` (clamped), so a 2-row input strip
    yields correct ``u[0..2]``; after reflection pad the 3x3 conv's output
    rows 0..1 read exactly ``u[1], u[0..2]`` — all correct. 2-row strips are
    therefore minimal AND sufficient (the round-1 version used 4).

    Cost shape: strips cost ~8/H of the fused interior, which at small maps
    (H=4 head block: 2x the interior!) dominates — so maps with
    ``H <= small_exact`` run the whole two-op reference path instead (exact by
    definition, compute-trivial at those sizes, and the extra HBM round-trip
    is cache-resident). Measured threshold sweep lives in tools/serve_bench.py."""
    h, w = x.shape[1], x.shape[2]
    if h <= small_exact or w <= small_exact:
        return _up_block_ref(x, kernel3, bias)
    y = fused_up_block(x, kernel6, bias)
    s = 2
    top = _up_block_ref(x[:, :s], kernel3, bias)[:, :2]
    bot = _up_block_ref(x[:, -s:], kernel3, bias)[:, -2:]
    left = _up_block_ref(x[:, :, :s], kernel3, bias)[:, :, :2]
    right = _up_block_ref(x[:, :, -s:], kernel3, bias)[:, :, -2:]
    y = y.at[:, :2].set(top).at[:, -2:].set(bot)
    y = y.at[:, :, :2].set(left).at[:, :, -2:].set(right)
    return y


def fuse_up_generator_params(cfg: GANModelConfig, folded_params: Dict[str, Any],
                             *, dtype=jnp.float32) -> Dict[str, Any]:
    """Precompute the fused 6x6 kernels for every resize-conv up-block of a
    BN-folded ``dcgan_up`` generator. Returns the folded params with
    ``kernel6`` added to each ``Conv_i`` leaf."""
    r = cfg.out_size.bit_length() - 4
    out = {k: dict(v) for k, v in folded_params.items()}
    for i in range(r + 1):
        k3 = np.asarray(folded_params[f"Conv_{i}"]["kernel"], np.float32)
        out[f"Conv_{i}"]["kernel6"] = jnp.asarray(resize_conv_to_transposed(k3), dtype)
    return out


def dcgan_up_lax_apply(cfg: GANModelConfig, params: Dict[str, Any], noise: jax.Array, *,
                       head_fn=None, final_tanh: bool = True,
                       exact_border: bool = True, small_exact: int = 16) -> jax.Array:
    """Folded resize-conv generator on the fused path: ConvT head + one
    stride-2 transposed conv per up-block (kernels from
    ``fuse_up_generator_params``), borders exact via
    :func:`fused_up_block_exact`. Numerically identical to the flax
    ``DCGANUpGenerator`` in eval mode; removes one full-resolution HBM
    round-trip (upsample) and one pad op per block."""
    import jax.lax as lax

    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    r = cfg.out_size.bit_length() - 4
    dn = ("NHWC", "HWIO", "NHWC")
    if head_fn is None:
        head = params["ConvTranspose_0"]
        x = lax.conv_transpose(noise.astype(dt)[:, None, None, :], head["kernel"].astype(dt),
                               (1, 1), "VALID", dimension_numbers=dn) + head["bias"].astype(dt)
    else:
        x = head_fn(noise).astype(dt)
    x = jax.nn.leaky_relu(x, cfg.leaky_slope)
    if exact_border:
        def block(x, k6, k3, b):
            return fused_up_block_exact(x, k6, k3, b, small_exact=small_exact)
    else:
        def block(x, k6, k3, b):
            return fused_up_block(x, k6, b)
    for i in range(r):
        leaf = params[f"Conv_{i}"]
        x = block(x, leaf["kernel6"].astype(dt), leaf["kernel"].astype(dt),
                  leaf["bias"].astype(dt))
        x = jax.nn.leaky_relu(x, cfg.leaky_slope)
    leaf = params[f"Conv_{r}"]
    x = block(x, leaf["kernel6"].astype(dt), leaf["kernel"].astype(dt), leaf["bias"].astype(dt))
    x = x.astype(jnp.float32)
    return jnp.tanh(x) if final_tanh else x


def make_serving_fn(cfg: GANModelConfig, g_params, g_stats, *, weights_dtype=jnp.float32,
                    uint8_output: bool = True, quantized_head: bool = False,
                    quantized_full: bool = False, exact_border: bool = True,
                    small_exact: int = 16):
    """Build the fastest synthesis function: BN-folded generator with
    ``weights_dtype`` weights, optionally ending in the fused Pallas
    tanh->uint8 epilogue (ops/quantize.py). ``quantized_full`` runs the whole
    ``dcgan`` stack as W8A8 int8 convs (double-rate MXU path; small bounded
    quantization error — serving only). ``exact_border`` (dcgan_up only)
    selects bit-parity borders vs the unfused generator; ``small_exact`` is
    the feature-map size at or below which whole blocks run the exact two-op
    path (see fused_up_block_exact). Returns ``fn(noise) -> images``
    (uint8 NHWC or float32 [-1,1])."""
    module, variables = fold_generator(cfg, g_params, g_stats, dtype=weights_dtype)

    if quantized_full:
        if cfg.arch != "dcgan":
            raise ValueError("quantized_full supports the ConvTranspose dcgan stack")
        qparams = quantize_generator_params(cfg, variables["params"])

        if uint8_output:
            from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8

            @jax.jit
            def fn(noise):
                return pallas_tanh_to_uint8(
                    dcgan_int8_apply(cfg, qparams, noise, final_tanh=False), apply_tanh=True)
        else:
            @jax.jit
            def fn(noise):
                return dcgan_int8_apply(cfg, qparams, noise, final_tanh=True)

        return fn

    if cfg.arch == "condgan":
        # the conditional generator needs labels at call time; serve it via
        # the flax module directly (one-hot concat changes the head shape,
        # so the quantized/lax fast paths don't apply)
        if quantized_head:
            raise ValueError("quantized_head does not support condgan (one-hot widens the head)")

        if uint8_output:
            from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8

            pre_module = dataclasses.replace(module, final_tanh=False)

            @jax.jit
            def fn(noise, labels):
                pre = pre_module.apply(variables, noise, labels=labels, train=False)
                return pallas_tanh_to_uint8(pre, apply_tanh=True)

        else:
            @jax.jit
            def fn(noise, labels):
                return module.apply(variables, noise, labels=labels, train=False)

        return fn

    # both lax fast paths share the ConvT 4x4 VALID head, so the int8 Pallas
    # head applies to either architecture
    head_fn = None
    params = variables["params"]
    if quantized_head:
        if cfg.arch not in ("dcgan", "dcgan_up"):
            raise ValueError("quantized_head supports the ConvTranspose-headed generators")
        head_fn = quantized_head_fn(params, cfg, cfg.leaky_slope)

    if cfg.arch == "dcgan_up":
        # fused resize-conv path: one stride-2 transposed conv per up-block
        # (weight-space fusion), borders exact via edge-strip fix-up
        params = fuse_up_generator_params(cfg, params, dtype=weights_dtype)

        def apply_fn(noise, final_tanh):
            return dcgan_up_lax_apply(cfg, params, noise, head_fn=head_fn,
                                      final_tanh=final_tanh,
                                      exact_border=exact_border, small_exact=small_exact)
    else:
        def apply_fn(noise, final_tanh):
            return dcgan_lax_apply(cfg, params, noise, head_fn=head_fn,
                                   final_tanh=final_tanh)

    if uint8_output:
        from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8

        @jax.jit
        def fn(noise):
            return pallas_tanh_to_uint8(apply_fn(noise, False), apply_tanh=True)

    else:
        @jax.jit
        def fn(noise):
            return apply_fn(noise, True)

    return fn
