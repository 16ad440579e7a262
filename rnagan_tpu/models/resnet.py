"""ResNet family, NHWC / TPU-native.

Capability parity with the reference's torchvision-style fork (reference
``src/resnet.py``): BasicBlock/Bottleneck (``resnet.py:25-94``), the resnet
18/34/50/101/152 constructors (``:346-458``), ``forward_extract`` returning
penultimate (post-avgpool) features (``:155-170``), 4-channel / 1-channel
input variants (the reference does pretrained-weight surgery for these,
``:381-435`` — here it's just ``in_channels``), and the projection-head
variant (``ResNetProject``, ``:323``). A torchvision ``state_dict`` port
(:func:`params_from_torch_state_dict`) covers the reference's
pretrained-weights path (``:381-435``, ``ml_experiments.py:288-295``).

Convs run in bfloat16 on the MXU by default; params are float32.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dt, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn2")(y)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), (self.strides, self.strides), use_bias=False,
                               dtype=dt, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=dt, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=dt, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1), (self.strides, self.strides), use_bias=False,
                               dtype=dt, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    in_channels: int = 3  # 4-ch (RNfour) / 1-ch (RNone) variants, resnet.py:172,247
    compute_dtype: str = "bfloat16"
    #: optional projection head (ResNetProject, resnet.py:323)
    project_dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False, extract: bool = False):
        """``extract=True`` returns penultimate features (the
        ``forward_extract`` path, reference ``resnet.py:155-170``)."""
        dt = _dtype(self.compute_dtype)
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)), use_bias=False, dtype=dt, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        features = 64
        for stage, blocks in enumerate(self.layers):
            strides = 1 if stage == 0 else 2
            for b in range(blocks):
                downsample = b == 0 and (strides != 1 or stage == 0 and self.block is Bottleneck)
                x = self.block(
                    features, strides if b == 0 else 1, downsample, dt,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            features *= 2
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg pool
        if self.project_dim:
            x = nn.Dense(self.project_dim, name="project")(x)
        if extract:
            return x
        return nn.Dense(self.num_classes, name="fc")(x)


def resnet18(**kw) -> ResNet:
    return ResNet(BasicBlock, (2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(BasicBlock, (3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 23, 3), **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(Bottleneck, (3, 8, 36, 3), **kw)


def init_resnet(model: ResNet, key: jax.Array, image_size: int = 224):
    x = jnp.zeros((1, image_size, image_size, model.in_channels), jnp.float32)
    return model.init(key, x, train=False)


# ----------------------------------------------------------- torch interop


def _conv_k(arr):
    return np.ascontiguousarray(np.asarray(arr).transpose(2, 3, 1, 0))


def params_from_torch_state_dict(model: ResNet, state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Port torchvision resnet weights (``layerL.B.convN/bnN/downsample``)
    onto this module's tree. Supports the reference's input-channel surgery
    (reference ``resnet.py:381-435``): for ``in_channels != 3`` the first conv
    is tiled/averaged from the RGB kernel."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(name, prefix):
        params[name] = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
        stats[name] = {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]}

    k1 = _conv_k(sd["conv1.weight"])  # (7,7,3,64)
    if model.in_channels == 1:
        k1 = k1.mean(axis=2, keepdims=True)  # RNone surgery (resnet.py:420-435)
    elif model.in_channels == 4:
        k1 = np.concatenate([k1, k1.mean(axis=2, keepdims=True)], axis=2)  # RNfour (:381-419)
    params["conv1"] = {"kernel": k1}
    put_bn("bn1", "bn1")

    for stage, blocks in enumerate(model.layers):
        for b in range(blocks):
            t = f"layer{stage + 1}.{b}"
            f = f"layer{stage + 1}_{b}"
            leaf: Dict[str, Any] = {}
            sleaf: Dict[str, Any] = {}
            n_convs = 3 if model.block is Bottleneck else 2
            for c in range(1, n_convs + 1):
                leaf[f"conv{c}"] = {"kernel": _conv_k(sd[f"{t}.conv{c}.weight"])}
                leaf[f"bn{c}"] = {"scale": sd[f"{t}.bn{c}.weight"], "bias": sd[f"{t}.bn{c}.bias"]}
                sleaf[f"bn{c}"] = {"mean": sd[f"{t}.bn{c}.running_mean"], "var": sd[f"{t}.bn{c}.running_var"]}
            if f"{t}.downsample.0.weight" in sd:
                leaf["downsample_conv"] = {"kernel": _conv_k(sd[f"{t}.downsample.0.weight"])}
                leaf["downsample_bn"] = {"scale": sd[f"{t}.downsample.1.weight"], "bias": sd[f"{t}.downsample.1.bias"]}
                sleaf["downsample_bn"] = {"mean": sd[f"{t}.downsample.1.running_mean"], "var": sd[f"{t}.downsample.1.running_var"]}
            params[f] = leaf
            stats[f] = sleaf

    if "fc.weight" in sd and model.num_classes == sd["fc.weight"].shape[0]:
        params["fc"] = {"kernel": np.ascontiguousarray(sd["fc.weight"].T), "bias": sd["fc.bias"]}
    return {"params": params, "batch_stats": stats}
