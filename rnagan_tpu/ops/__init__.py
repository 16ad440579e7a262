from rnagan_tpu.ops.infusion import pallas_infused_noise
from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8

__all__ = ["pallas_infused_noise", "pallas_tanh_to_uint8"]
