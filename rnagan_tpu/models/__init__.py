from rnagan_tpu.models.betavae import BetaVAE, RNAEncoder

__all__ = ["BetaVAE", "RNAEncoder"]
