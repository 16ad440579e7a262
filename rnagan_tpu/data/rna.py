"""RNA-seq data layer.

Re-design of the reference's RNA path (reference ``src/read_data.py:374-497``,
``src/betaVAE_training.py:60-114``):

* log transform with the zeros-stay-zero trick (``read_data.py:468-471``:
  ``log(replace(0, nan))`` then ``nan -> 0``) — here a vectorized
  ``where(x > 0, log(x), 0)``
* standard / minmax scaling **fit on train only** (``read_data.py:488-495``)
* per-tissue 64/16/20 split then concat (``betaVAE_training.py:70-96``)

Unlike the reference — which materializes one tensor per row via
``DataFrame.iterrows`` (``read_data.py:391-407``) and re-fits the scaler in
every script — this keeps whole splits as contiguous float32 matrices (they are
small: 19,198 genes x a few hundred rows) and makes the scaler an explicit,
checkpointable state object.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


def rna_columns(df: pd.DataFrame) -> List[str]:
    """Columns holding expression values — reference convention: substring
    ``'rna_'`` (``read_data.py:399``)."""
    return [c for c in df.columns if "rna_" in c]


def log_transform(values: np.ndarray) -> np.ndarray:
    """Natural log with zeros mapped to 0 (reference ``read_data.py:468-471``)."""
    values = np.asarray(values, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(values > 0, np.log(np.where(values > 0, values, 1.0)), 0.0)
    return out


@dataclass
class Scaler:
    """Checkpointable feature scaler (replaces sklearn Standard/MinMaxScaler,
    reference ``read_data.py:488-495``). ``transform(x) = (x - offset) / scale``."""

    kind: str
    offset: np.ndarray
    scale: np.ndarray

    @staticmethod
    def fit(values: np.ndarray, kind: str = "standard") -> "Scaler":
        values = np.asarray(values, np.float64)
        if kind == "standard":
            # sklearn StandardScaler: population std (ddof=0)
            offset = values.mean(axis=0)
            scale = values.std(axis=0)
            scale = np.where(scale == 0.0, 1.0, scale)  # sklearn zero-variance guard
        elif kind == "minmax":
            lo = values.min(axis=0)
            hi = values.max(axis=0)
            rng = np.where(hi - lo == 0.0, 1.0, hi - lo)
            offset, scale = lo, rng
        else:
            raise ValueError(f"unknown scaler kind: {kind}")
        return Scaler(kind, offset.astype(np.float64), scale.astype(np.float64))

    def transform(self, values: np.ndarray) -> np.ndarray:
        return ((np.asarray(values, np.float64) - self.offset) / self.scale).astype(np.float32)

    def inverse_transform(self, values: np.ndarray) -> np.ndarray:
        return (np.asarray(values, np.float64) * self.scale + self.offset).astype(np.float32)

    # pytree-ish dict form for bundling into checkpoints (kind encoded as an
    # int so the tree is pure-numeric for msgpack)
    _KINDS = ("standard", "minmax")

    def state_dict(self) -> Dict[str, np.ndarray]:
        return {
            "kind_id": np.int32(self._KINDS.index(self.kind)),
            "offset": self.offset,
            "scale": self.scale,
        }

    @staticmethod
    def from_state_dict(d) -> "Scaler":
        kind = Scaler._KINDS[int(d["kind_id"])]
        return Scaler(kind, np.asarray(d["offset"]), np.asarray(d["scale"]))


def normalize_dfs(
    train_df: pd.DataFrame,
    val_df: Optional[pd.DataFrame] = None,
    test_df: Optional[pd.DataFrame] = None,
    norm_type: str = "standard",
) -> Tuple[pd.DataFrame, Optional[pd.DataFrame], Optional[pd.DataFrame], Scaler]:
    """log -> fit-on-train scaler -> transform all splits (reference
    ``read_data.py:467-497``). Non-RNA columns are preserved."""
    cols = rna_columns(train_df)
    train_df = train_df.copy()
    train_vals = log_transform(train_df[cols].values)
    scaler = Scaler.fit(train_vals, norm_type)
    train_df[cols] = scaler.transform(train_vals)

    def _apply(df):
        if df is None:
            return None
        df = df.copy()
        df[cols] = scaler.transform(log_transform(df[cols].values))
        return df

    return train_df, _apply(val_df), _apply(test_df), scaler


def split_df(df: pd.DataFrame, test_frac: float, seed: int) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Deterministic row split (the reference uses unseeded
    ``train_test_split``, ``betaVAE_training.py:72-74``; we seed it)."""
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(df))
    n_test = int(round(len(df) * test_frac))
    test_idx, train_idx = idx[:n_test], idx[n_test:]
    return df.iloc[train_idx], df.iloc[test_idx]


def load_tissue_splits(
    csv_paths: Sequence[str], seed: int = 99, quick: bool = False
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, np.ndarray]:
    """Per-tissue 64/16/20 split then concat, with integer tissue labels on the
    test set (reference ``betaVAE_training.py:60-96``). Returns
    ``(train_df, val_df, test_df, test_labels)``."""
    parts = {"train": [], "val": [], "test": []}
    test_labels: List[int] = []
    for tissue_id, path in enumerate(csv_paths):
        df = pd.read_csv(path)
        if quick:
            df = df.sample(min(10, len(df)), random_state=seed)
        train, test = split_df(df, 0.2, seed + tissue_id)
        train, val = split_df(train, 0.2, seed + tissue_id + 1000)
        parts["train"].append(train)
        parts["val"].append(val)
        parts["test"].append(test)
        test_labels += [tissue_id] * len(test)
    return (
        pd.concat(parts["train"], ignore_index=True),
        pd.concat(parts["val"], ignore_index=True),
        pd.concat(parts["test"], ignore_index=True),
        np.asarray(test_labels, np.int32),
    )


def rna_matrix(df: pd.DataFrame) -> np.ndarray:
    """Whole split as one contiguous float32 matrix (rows x genes) — the
    RNADataset equivalent (reference ``read_data.py:374-407``) without the
    per-row tensor materialization."""
    return np.ascontiguousarray(df[rna_columns(df)].values, dtype=np.float32)


def batch_iterator(
    data: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    drop_remainder: bool = False,
    pad_to: int = 1,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield ``(batch, valid_mask)`` (shared semantics: data/batching.py)."""
    from rnagan_tpu.data.batching import batch_indices

    for idx, mask in batch_indices(
        len(data), batch_size, shuffle=shuffle, seed=seed, epoch=epoch,
        pad_to=pad_to, drop_remainder=drop_remainder,
    ):
        yield data[idx], mask
