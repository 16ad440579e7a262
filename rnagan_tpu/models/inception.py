"""InceptionV3 feature extractor for FID, in flax/NHWC.

The reference computes FID on InceptionV3 pool3 features: torchvision
``inception_v3(pretrained=True)`` with a forward hook on ``Mixed_7c`` followed
by adaptive average pooling to 2048-d (reference ``src/fid.py:33-63``; input
scaled ``x*2-1`` at ``fid.py:54``, and torchvision's pretrained
``transform_input`` channel remap applies inside the network).

This module re-implements the torchvision InceptionV3 architecture
(BasicConv2d = conv(no bias) + BN(eps=1e-3) + relu; Inception A/B/C/D/E
blocks) up to ``Mixed_7c`` in NHWC for the TPU, with submodule names mirroring
the torchvision state_dict layout so pretrained weights port mechanically via
:func:`params_from_torch_state_dict` (torchvision weights are an external
artifact; without them the features are deterministic-but-untrained, which is
fine for pipeline tests but NOT comparable to published FID numbers — pass a
``pth`` file for metric parity).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides, padding=self.padding,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


def max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), (2, 2))


def avg_pool_3x3_s1_p1(x):
    return nn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)), count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b1 = C(64, (1, 1), name="branch1x1")(x)
        b5 = C(48, (1, 1), name="branch5x5_1")(x)
        b5 = C(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = C(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = C(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = C(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_3x3_s1_p1(x)
        bp = C(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b3 = C(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = C(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = C(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = C(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        c7 = self.channels_7x7
        b1 = C(192, (1, 1), name="branch1x1")(x)
        b7 = C(c7, (1, 1), name="branch7x7_1")(x)
        b7 = C(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7_2")(b7)
        b7 = C(192, (7, 1), padding=_pad((3, 0)), name="branch7x7_3")(b7)
        bd = C(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = C(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_2")(bd)
        bd = C(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_3")(bd)
        bd = C(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_4")(bd)
        bd = C(192, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_5")(bd)
        bp = avg_pool_3x3_s1_p1(x)
        bp = C(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b3 = C(192, (1, 1), name="branch3x3_1")(x)
        b3 = C(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = C(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = C(192, (1, 7), padding=_pad((0, 3)), name="branch7x7x3_2")(b7)
        b7 = C(192, (7, 1), padding=_pad((3, 0)), name="branch7x7x3_3")(b7)
        b7 = C(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b1 = C(320, (1, 1), name="branch1x1")(x)
        b3 = C(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                C(384, (1, 3), padding=_pad((0, 1)), name="branch3x3_2a")(b3),
                C(384, (3, 1), padding=_pad((1, 0)), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = C(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = C(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                C(384, (1, 3), padding=_pad((0, 1)), name="branch3x3dbl_3a")(bd),
                C(384, (3, 1), padding=_pad((1, 0)), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        bp = avg_pool_3x3_s1_p1(x)
        bp = C(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Backbone up to Mixed_7c + global average pool -> (N, 2048).

    Input: NHWC float32 in [0, 1], 299x299 (the reference's contract,
    ``fid.py:49-54``). Applies ``x*2-1`` then the pretrained-torchvision
    ``transform_input`` channel remap.
    """

    transform_input: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x * 2.0 - 1.0  # fid.py:54
        if self.transform_input:
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        x = x.astype(self.dtype)
        C = partial(BasicConv2d, dtype=self.dtype)
        x = C(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = C(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = C(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = max_pool_3x3_s2(x)
        x = C(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = C(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool_3x3_s2(x)
        x = InceptionA(32, self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5d")(x)
        x = InceptionB(self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, self.dtype, name="Mixed_6e")(x)
        x = InceptionD(self.dtype, name="Mixed_7a")(x)
        x = InceptionE(self.dtype, name="Mixed_7b")(x)
        x = InceptionE(self.dtype, name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1 (fid.py:61-63)
        return x.astype(jnp.float32)


def init_inception(key: jax.Array, transform_input: bool = True, dtype=jnp.float32):
    model = InceptionV3Features(transform_input=transform_input, dtype=dtype)
    variables = model.init(key, jnp.zeros((1, 299, 299, 3), jnp.float32))
    return model, variables


def params_from_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Port torchvision ``inception_v3`` weights: every ``X.conv.weight``
    (OIHW) -> params[X...]['conv']['kernel'] (HWIO); ``X.bn.{weight,bias,
    running_mean,running_var}`` -> bn scale/bias + batch_stats. ``fc``/``AuxLogits``
    entries are ignored (features stop at Mixed_7c)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, val in state_dict.items():
        arr = np.asarray(val)
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        module_path, layer, param = parts[:-2], parts[-2], parts[-1]
        if layer == "conv" and param == "weight":
            put(params, module_path + ["conv", "kernel"], np.ascontiguousarray(arr.transpose(2, 3, 1, 0)))
        elif layer == "bn":
            if param == "weight":
                put(params, module_path + ["bn", "scale"], arr)
            elif param == "bias":
                put(params, module_path + ["bn", "bias"], arr)
            elif param == "running_mean":
                put(stats, module_path + ["bn", "mean"], arr)
            elif param == "running_var":
                put(stats, module_path + ["bn", "var"], arr)
    return {"params": params, "batch_stats": stats}
