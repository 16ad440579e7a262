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


def avg_pool_3x3_s1_p1(x, torch_pool: bool = False):
    """3x3/1 avg pool, padding 1. ``torch_pool=False`` divides by the count of
    *valid* (unpadded) taps — TF/keras semantics, also what pytorch-fid's
    patched FID network uses. ``torch_pool=True`` divides by 9 everywhere —
    plain torchvision ``F.avg_pool2d`` (count_include_pad default), the exact
    op the reference's ``inception_v3(pretrained=True)`` runs (``fid.py:37``).
    The two differ only on the 1-pixel border of each 35/17/8px feature map."""
    return nn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=torch_pool)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32
    torch_pool: bool = False

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b1 = C(64, (1, 1), name="branch1x1")(x)
        b5 = C(48, (1, 1), name="branch5x5_1")(x)
        b5 = C(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = C(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = C(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = C(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_3x3_s1_p1(x, self.torch_pool)
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
    torch_pool: bool = False

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
        bp = avg_pool_3x3_s1_p1(x, self.torch_pool)
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
    torch_pool: bool = False

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
        bp = avg_pool_3x3_s1_p1(x, self.torch_pool)
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
    # torchvision's pretrained net divides border avg-pool taps by 9
    # (count_include_pad); TF/keras weights (and pytorch-fid's canonical FID
    # network) divide by the valid-tap count. Pick per weight source.
    torch_pool: bool = False

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
        tp = self.torch_pool
        x = InceptionA(32, self.dtype, tp, name="Mixed_5b")(x)
        x = InceptionA(64, self.dtype, tp, name="Mixed_5c")(x)
        x = InceptionA(64, self.dtype, tp, name="Mixed_5d")(x)
        x = InceptionB(self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, self.dtype, tp, name="Mixed_6b")(x)
        x = InceptionC(160, self.dtype, tp, name="Mixed_6c")(x)
        x = InceptionC(160, self.dtype, tp, name="Mixed_6d")(x)
        x = InceptionC(192, self.dtype, tp, name="Mixed_6e")(x)
        x = InceptionD(self.dtype, name="Mixed_7a")(x)
        x = InceptionE(self.dtype, tp, name="Mixed_7b")(x)
        x = InceptionE(self.dtype, tp, name="Mixed_7c")(x)
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


def _block_conv_paths():
    """Conv module paths in *creation order* — identical for torchvision's
    ``Inception3.__init__`` and keras ``inception_v3`` (branch order and every
    concat order match; verified against keras/src/applications/inception_v3.py
    and reference ``fid.py:37``'s torchvision graph)."""
    A = ["branch1x1", "branch5x5_1", "branch5x5_2",
         "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
    B = ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]
    Cc = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
          "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
          "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
    D = ["branch3x3_1", "branch3x3_2",
         "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"]
    E = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
         "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
         "branch3x3dbl_3b", "branch_pool"]
    paths = [("Conv2d_1a_3x3",), ("Conv2d_2a_3x3",), ("Conv2d_2b_3x3",),
             ("Conv2d_3b_1x1",), ("Conv2d_4a_3x3",)]
    for block, names in [("Mixed_5b", A), ("Mixed_5c", A), ("Mixed_5d", A),
                         ("Mixed_6a", B), ("Mixed_6b", Cc), ("Mixed_6c", Cc),
                         ("Mixed_6d", Cc), ("Mixed_6e", Cc), ("Mixed_7a", D),
                         ("Mixed_7b", E), ("Mixed_7c", E)]:
        paths.extend((block, n) for n in names)
    assert len(paths) == 94
    return paths


KERAS_CONV_ORDER = _block_conv_paths()


def params_from_keras_arrays(kernels, betas, means, variances) -> Dict[str, Any]:
    """Build flax variables from keras-InceptionV3 weights given as four lists
    in conv *creation order* (keras auto-names ``conv2d[_i]`` /
    ``batch_normalization[_i]`` follow creation order). Keras convs are
    already HWIO; its BatchNorm uses ``scale=False`` so gamma is 1.

    Use with ``InceptionV3Features(transform_input=False, torch_pool=False)``:
    keras's published weights expect plain ``x*2-1`` input (no torchvision
    channel remap) and TF avg-pool border semantics."""
    if not (len(kernels) == len(betas) == len(means) == len(variances) == 94):
        raise ValueError(f"expected 94 conv/bn pairs, got {len(kernels)}")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def node(tree, path):
        for p in path:
            tree = tree.setdefault(p, {})
        return tree

    for path, k, b, m, v in zip(KERAS_CONV_ORDER, kernels, betas, means, variances):
        k = np.asarray(k, np.float32)
        p = node(params, path)
        p["conv"] = {"kernel": k}
        p["bn"] = {"scale": np.ones(k.shape[-1], np.float32),
                   "bias": np.asarray(b, np.float32)}
        s = node(stats, path)
        s["bn"] = {"mean": np.asarray(m, np.float32),
                   "var": np.asarray(v, np.float32)}
    return {"params": params, "batch_stats": stats}


def params_from_keras_h5(path: str) -> Dict[str, Any]:
    """Load keras-applications InceptionV3 weights from an ``.h5`` file (the
    ``..._tf_dim_ordering_tf_kernels[_notop].h5`` artifacts). Handles both the
    modern ``conv2d``/``conv2d_1`` and legacy ``conv2d_1``-first namings by
    numeric sort."""
    import h5py

    def order_key(name, prefix):
        rest = name[len(prefix):].lstrip("_")
        return int(rest) if rest else 0

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def collect(prefix):
            names = [n for n in root if n == prefix or
                     (n.startswith(prefix + "_") and n[len(prefix) + 1:].isdigit())]
            return sorted(names, key=lambda n: order_key(n, prefix))

        def leaf_arrays(group):
            out = {}
            def visit(_, obj):
                if hasattr(obj, "shape") and hasattr(obj, "dtype"):
                    out[obj.name.rsplit("/", 1)[-1].split(":")[0]] = np.asarray(obj)
            group.visititems(visit)
            return out

        kernels, betas, means, variances = [], [], [], []
        for cname, bname in zip(collect("conv2d"), collect("batch_normalization")):
            cw = leaf_arrays(root[cname])
            bw = leaf_arrays(root[bname])
            kernels.append(cw["kernel"])
            betas.append(bw["beta"])
            means.append(bw["moving_mean"])
            variances.append(bw["moving_variance"])
    return params_from_keras_arrays(kernels, betas, means, variances)


def load_fid_inception(weights_path: str):
    """Load FID-inception weights from either source and return
    ``(variables, module_kwargs)`` matched to that source's conventions:

    * ``.pt``/``.pth`` — torchvision ``inception_v3_google`` state_dict, the
      reference's exact network (``fid.py:37``): ``transform_input=True``,
      ``torch_pool=True``;
    * ``.h5``/``.npz`` — keras-applications InceptionV3 (same TF-slim
      architecture, independently trained): ``transform_input=False``,
      ``torch_pool=False``.
    """
    if weights_path.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        return params_from_torch_state_dict(sd), {"transform_input": True, "torch_pool": True}
    if weights_path.endswith(".h5"):
        return params_from_keras_h5(weights_path), {"transform_input": False, "torch_pool": False}
    if weights_path.endswith(".npz"):
        data = np.load(weights_path)
        n = 94
        lists = [[data[f"{field}_{i}"] for i in range(n)]
                 for field in ("kernel", "beta", "mean", "var")]
        return params_from_keras_arrays(*lists), {"transform_input": False, "torch_pool": False}
    raise ValueError(f"unsupported inception weights format: {weights_path}")
