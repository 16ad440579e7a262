"""rnagan_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
gevaertlab/RNA-GAN (reference mounted read-only at /root/reference).

Subpackages
-----------
core      typed config tree, rng streams, checkpointing, metrics/logging, profiling
parallel  device mesh / sharding helpers (data-parallel over ICI)
data      RNA-seq normalization + datasets, tile stores, WSI tiler
models    betaVAE, DCGAN generator/discriminator families, ResNet, InceptionV3
losses    beta-VAE ELBO, GAN loss registry (minimax/wgan/wgan-gp/lsgan), RNA infusion
train     VAE trainer, GAN trainer (the torchgan.trainer.Trainer equivalent)
eval      FID, tile generation, latent interpolation/sampling, representations
ops       Pallas TPU kernels for the hot paths
cli       command-line entry points mirroring the reference script surface
"""

__version__ = "0.1.0"
