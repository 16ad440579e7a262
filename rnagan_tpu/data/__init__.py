from rnagan_tpu.data.rna import (
    Scaler,
    load_tissue_splits,
    log_transform,
    normalize_dfs,
    rna_matrix,
)

__all__ = ["Scaler", "log_transform", "normalize_dfs", "rna_matrix", "load_tissue_splits"]
