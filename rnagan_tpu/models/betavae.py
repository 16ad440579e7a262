"""beta-VAE over RNA-seq expression vectors.

TPU-native re-design of the reference model (reference ``src/betaVAE.py:18-143``):

* encoder = Dropout -> [Dense -> BatchNorm -> LeakyReLU] x len(encoder_dims)
  (reference ``betaVAE.py:26-39``; torch defaults: Dropout p=0.5, LeakyReLU
  slope 0.01, BatchNorm eps 1e-5 / momentum 0.1-new == flax momentum 0.9-old)
* z heads = two Dense(z_dim -> z_dim) (``betaVAE.py:76-77``)
* reparametrize: std = exp(0.5 * logvar); z = mu + eps * std (``betaVAE.py:96-100``,
  applied in *both* train and eval forward, ``betaVAE.py:109-115``)
* decoder = [Dense -> BatchNorm -> LeakyReLU] x len(decoder_dims) -> Dense -> tanh
  (``betaVAE.py:81-92``)

All layers are plain Dense/BatchNorm, so XLA maps the whole forward to three
large MXU GEMMs per stack; params stay float32, compute dtype is configurable
(bfloat16 for the GAN-side frozen encoder).

A torch ``state_dict`` import shim (:func:`params_from_torch_state_dict`) lets
reference checkpoints (``model_dict_best.pt``) drive this model.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rnagan_tpu.core.config import VAEModelConfig


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class RNAEncoder(nn.Module):
    """MLP encoder over gene-expression vectors (reference ``betaVAE.py:18-42``)."""

    hidden_dims: Sequence[int]
    dropout_rate: float = 0.5
    leaky_slope: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=f"bn_{i}",
            )(x)
            x = nn.leaky_relu(x, self.leaky_slope)
        return x


class Decoder(nn.Module):
    """MLP decoder: hidden stacks then Dense -> tanh (reference ``betaVAE.py:81-92``)."""

    hidden_dims: Sequence[int]
    out_features: int
    leaky_slope: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> jax.Array:
        x = z.astype(self.dtype)
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=f"bn_{i}",
            )(x)
            x = nn.leaky_relu(x, self.leaky_slope)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="dense_out")(x)
        return jnp.tanh(x).astype(jnp.float32)


class BetaVAE(nn.Module):
    """beta-VAE (reference ``betaVAE.py:63-143``). RNG streams: ``dropout`` (train
    only) and ``reparam`` (every forward — the reference reparametrizes in eval
    too, ``betaVAE.py:109-115``)."""

    cfg: VAEModelConfig

    def setup(self):
        dt = _dtype(self.cfg.compute_dtype)
        self.encoder = RNAEncoder(
            self.cfg.encoder_dims, self.cfg.dropout_rate, self.cfg.leaky_slope, dt
        )
        self.z_mu = nn.Dense(self.cfg.z_dim, dtype=dt)
        self.z_logvar = nn.Dense(self.cfg.z_dim, dtype=dt)
        self.decoder = Decoder(
            self.cfg.decoder_dims, self.cfg.rna_features, self.cfg.leaky_slope, dt
        )

    def encode(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns ``(z_mean, z_logvar, x_encoded)`` (reference ``betaVAE.py:102-107``)."""
        x_encoded = self.encoder(x, train=train)
        z_mean = self.z_mu(x_encoded).astype(jnp.float32)
        z_log_var = self.z_logvar(x_encoded).astype(jnp.float32)
        return z_mean, z_log_var, x_encoded

    def decode(self, z: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder(z, train=train)

    def reparametrize(self, z_mean: jax.Array, z_log_var: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * z_log_var)
        eps = jax.random.normal(self.make_rng("reparam"), std.shape, std.dtype)
        return z_mean + eps * std

    def __call__(self, x: jax.Array, train: bool = False):
        z_mean, z_log_var, _ = self.encode(x, train=train)
        z = self.reparametrize(z_mean, z_log_var)
        out = self.decode(z, train=train)
        return out, z_mean, z_log_var

    def sample(self, z: jax.Array, interpolation: Optional[jax.Array] = None, alpha: float = 1.0) -> jax.Array:
        """Decode latents, optionally offset along an interpolation direction
        (reference ``betaVAE.py:117-140``). ``z`` is supplied by the caller so
        randomness stays explicit."""
        if interpolation is not None:
            z = z + alpha * interpolation
        return self.decode(z, train=False)


def init_betavae(cfg: VAEModelConfig, key: jax.Array) -> Dict[str, Any]:
    """Initialize variables ``{'params': ..., 'batch_stats': ...}``."""
    model = BetaVAE(cfg)
    x = jnp.zeros((2, cfg.rna_features), jnp.float32)
    variables = model.init(
        {"params": key, "dropout": key, "reparam": key}, x, train=False
    )
    return variables


# --------------------------------------------------------------------------
# Torch state_dict interop (reference checkpoint format, betaVAE.py:270-278)
# --------------------------------------------------------------------------

def _linear(sd, prefix):
    # torch Linear: weight (out, in) -> flax Dense kernel (in, out)
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _bn(sd, prefix):
    return (
        {"scale": np.asarray(sd[prefix + ".weight"]), "bias": np.asarray(sd[prefix + ".bias"])},
        {"mean": np.asarray(sd[prefix + ".running_mean"]), "var": np.asarray(sd[prefix + ".running_var"])},
    )


def params_from_torch_state_dict(cfg: VAEModelConfig, state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference torch ``state_dict`` (layout per ``betaVAE.py:63-94``:
    ``encoder.encoder.{i+1}.0/1``, ``z_mu``, ``z_logvar``, ``decoder.{i}.0/1``,
    final ``decoder.{n}.0``) onto this model's variables."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {"encoder": {}, "decoder": {}}
    stats: Dict[str, Any] = {"encoder": {}, "decoder": {}}

    for i in range(len(cfg.encoder_dims)):
        params["encoder"][f"dense_{i}"] = _linear(sd, f"encoder.encoder.{i + 1}.0")
        bn_p, bn_s = _bn(sd, f"encoder.encoder.{i + 1}.1")
        params["encoder"][f"bn_{i}"] = bn_p
        stats["encoder"][f"bn_{i}"] = bn_s

    params["z_mu"] = _linear(sd, "z_mu")
    params["z_logvar"] = _linear(sd, "z_logvar")

    for i in range(len(cfg.decoder_dims)):
        params["decoder"][f"dense_{i}"] = _linear(sd, f"decoder.{i}.0")
        bn_p, bn_s = _bn(sd, f"decoder.{i}.1")
        params["decoder"][f"bn_{i}"] = bn_p
        stats["decoder"][f"bn_{i}"] = bn_s
    params["decoder"]["dense_out"] = _linear(sd, f"decoder.{len(cfg.decoder_dims)}.0")

    return {"params": params, "batch_stats": stats}


def params_to_torch_state_dict(cfg: VAEModelConfig, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`params_from_torch_state_dict` (numpy arrays; callers
    may ``torch.save`` the result for reference-toolchain consumption)."""
    p = variables["params"]
    s = variables["batch_stats"]
    sd: Dict[str, Any] = {}

    def put_linear(prefix, leaf):
        sd[prefix + ".weight"] = np.ascontiguousarray(np.asarray(leaf["kernel"]).T)
        sd[prefix + ".bias"] = np.asarray(leaf["bias"])

    def put_bn(prefix, leaf_p, leaf_s):
        sd[prefix + ".weight"] = np.asarray(leaf_p["scale"])
        sd[prefix + ".bias"] = np.asarray(leaf_p["bias"])
        sd[prefix + ".running_mean"] = np.asarray(leaf_s["mean"])
        sd[prefix + ".running_var"] = np.asarray(leaf_s["var"])
        sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)

    for i in range(len(cfg.encoder_dims)):
        put_linear(f"encoder.encoder.{i + 1}.0", p["encoder"][f"dense_{i}"])
        put_bn(f"encoder.encoder.{i + 1}.1", p["encoder"][f"bn_{i}"], s["encoder"][f"bn_{i}"])
    put_linear("z_mu", p["z_mu"])
    put_linear("z_logvar", p["z_logvar"])
    for i in range(len(cfg.decoder_dims)):
        put_linear(f"decoder.{i}.0", p["decoder"][f"dense_{i}"])
        put_bn(f"decoder.{i}.1", p["decoder"][f"bn_{i}"], s["decoder"][f"bn_{i}"])
    put_linear(f"decoder.{len(cfg.decoder_dims)}.0", p["decoder"]["dense_out"])
    return sd
