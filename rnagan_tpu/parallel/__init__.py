from rnagan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "pad_to_multiple"]
