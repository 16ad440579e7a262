"""RNA data layer: log transform and scaler parity vs the reference's
pandas/sklearn pipeline (reference read_data.py:467-497), split/concat
behavior, and batch padding semantics."""

import numpy as np
import pandas as pd
import pytest

from rnagan_tpu.data.rna import (
    Scaler,
    batch_iterator,
    load_tissue_splits,
    log_transform,
    normalize_dfs,
    rna_matrix,
)


def _fake_df(n, genes=12, seed=0, with_wsi=True):
    rng = np.random.RandomState(seed)
    vals = rng.gamma(2.0, 50.0, size=(n, genes))
    vals[rng.rand(n, genes) < 0.2] = 0.0  # zeros like real RNA-seq
    df = pd.DataFrame(vals, columns=[f"rna_g{i}" for i in range(genes)])
    if with_wsi:
        df["wsi_file_name"] = [f"slide_{i}" for i in range(n)]
    return df


def test_log_transform_matches_reference_nan_trick():
    df = _fake_df(30, with_wsi=False)
    # reference trick (read_data.py:468-471)
    ref = np.log(df.replace(0, np.nan)).replace(np.nan, 0).values
    ours = log_transform(df.values)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_scaler_matches_sklearn():
    sklearn_pre = pytest.importorskip("sklearn.preprocessing")
    x = np.random.RandomState(1).randn(50, 7) * 3 + 1
    for kind, skl in [("standard", sklearn_pre.StandardScaler()), ("minmax", sklearn_pre.MinMaxScaler((0, 1)))]:
        ours = Scaler.fit(x, kind)
        ref = skl.fit_transform(x)
        np.testing.assert_allclose(ours.transform(x), ref, atol=1e-6)
        np.testing.assert_allclose(ours.inverse_transform(ours.transform(x)), x, atol=1e-6)


def test_normalize_dfs_fit_on_train_only():
    train, val, test = _fake_df(40, seed=0), _fake_df(10, seed=1), _fake_df(10, seed=2)
    tr, va, te, scaler = normalize_dfs(train, val, test)
    m = rna_matrix(tr)
    # train is standardized exactly; val/test use train statistics
    np.testing.assert_allclose(m.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.std(axis=0), 1.0, atol=1e-4)
    assert abs(rna_matrix(va).mean()) > 1e-9  # not refit on val
    assert "wsi_file_name" in tr.columns
    # scaler state round-trips (the checkpointed-normalization fix, SURVEY 5.4)
    s2 = Scaler.from_state_dict(scaler.state_dict())
    np.testing.assert_allclose(s2.transform(log_transform(test.values[:, :12])), rna_matrix(te), atol=1e-6)


def test_load_tissue_splits(tmp_path):
    paths = []
    for t in range(2):
        p = tmp_path / f"tissue{t}.csv"
        _fake_df(25, seed=t).to_csv(p, index=False)
        paths.append(str(p))
    train, val, test, labels = load_tissue_splits(paths, seed=7)
    assert len(train) + len(val) + len(test) == 50
    assert len(labels) == len(test)
    assert set(labels) == {0, 1}
    # deterministic
    train2, _, _, _ = load_tissue_splits(paths, seed=7)
    pd.testing.assert_frame_equal(train.reset_index(drop=True), train2.reset_index(drop=True))


def test_batch_iterator_padding_and_mask():
    data = np.arange(10, dtype=np.float32).reshape(10, 1)
    batches = list(batch_iterator(data, 4, pad_to=4))
    assert len(batches) == 3
    last_batch, last_mask = batches[-1]
    assert last_batch.shape == (4, 1)  # padded up to pad_to multiple
    assert last_mask.sum() == 2
    # padding rows are wrapped real rows, not zeros (BatchNorm safety)
    assert last_batch[2, 0] in data[:, 0]
    total_valid = sum(int(m.sum()) for _, m in batches)
    assert total_valid == 10
