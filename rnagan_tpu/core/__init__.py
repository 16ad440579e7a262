from rnagan_tpu.core.config import (
    DataConfig,
    GANConfig,
    GANModelConfig,
    MeshConfig,
    VAEConfig,
    VAEModelConfig,
    load_reference_json,
)
from rnagan_tpu.core.rng import KeyStream
from rnagan_tpu.core.checkpoint import (
    load_bundle,
    load_pytree,
    save_bundle,
    save_pytree,
)
from rnagan_tpu.core.metrics import MetricsLogger

__all__ = [
    "DataConfig",
    "GANConfig",
    "GANModelConfig",
    "MeshConfig",
    "VAEConfig",
    "VAEModelConfig",
    "load_reference_json",
    "KeyStream",
    "MetricsLogger",
    "save_pytree",
    "load_pytree",
    "save_bundle",
    "load_bundle",
]
