from rnagan_tpu.train.schedules import gradual_warmup_cosine
from rnagan_tpu.train.vae_trainer import VAETrainer

__all__ = ["gradual_warmup_cosine", "VAETrainer"]
