from rnagan_tpu.utils.images import save_image_grid, to_uint8

__all__ = ["save_image_grid", "to_uint8"]
