from rnagan_tpu.eval.fid import (
    calculate_activation_statistics,
    calculate_fid,
    calculate_frechet_distance,
    get_activations,
)

__all__ = [
    "get_activations",
    "calculate_activation_statistics",
    "calculate_frechet_distance",
    "calculate_fid",
]
