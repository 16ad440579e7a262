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
    """InceptionExtractor, optionally from pretrained weights — torchvision
    ``inception_v3`` state_dict (.pt/.pth, the reference's exact FID network)
    or keras-applications InceptionV3 (.h5/.npz) — with input/pool conventions
    matched to the source (shared by the fid / gan-train / representation
    CLIs)."""
    from rnagan_tpu.eval.fid import InceptionExtractor

    if weights_path:
        from rnagan_tpu.models.inception import load_fid_inception

        variables, kwargs = load_fid_inception(weights_path)
        return InceptionExtractor(variables, **kwargs)
    return InceptionExtractor(None)
