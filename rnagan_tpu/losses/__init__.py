from rnagan_tpu.losses.vae import beta_vae_loss

__all__ = ["beta_vae_loss"]
