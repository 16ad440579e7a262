"""Shared CLI plumbing."""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional



def setup_jax(platform: Optional[str] = None, cache_dir: str = ".jax_cache"):
    """Optionally force a platform (this image's sitecustomize overrides
    JAX_PLATFORMS; see tests/conftest.py) and enable the persistent
    compilation cache."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def dump_pickle(path: str, obj: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_gan_dataframe(config: Dict[str, Any]):
    """Multi-CSV concat with integer tissue labels (reference
    ``histopathology_gan.py:111-129``)."""
    import pandas as pd

    frames = []
    for tissue_id, (csv_path, patch_path) in enumerate(
        zip(config["path_csv"], config["patch_data_path"])
    ):
        df = pd.read_csv(csv_path)
        df["patch_data_path"] = [patch_path] * len(df)
        df["labels"] = [tissue_id] * len(df)
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def load_inception_extractor(weights_path=None):
    """InceptionExtractor, optionally from a torchvision ``inception_v3``
    state_dict (.pt) for published-FID parity (shared by the fid / gan-train /
    representation CLIs)."""
    from rnagan_tpu.eval.fid import InceptionExtractor

    variables = None
    if weights_path:
        import torch

        from rnagan_tpu.models.inception import params_from_torch_state_dict

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        variables = params_from_torch_state_dict({k: v.numpy() for k, v in sd.items()})
    return InceptionExtractor(variables)
