"""Reference-checkpoint interop: a torch-saved betaVAE state_dict (the
reference's checkpoint format, e.g. betavae_tissues.pt) drives the wganvae
loss family end-to-end."""

import numpy as np
import pytest

from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
from rnagan_tpu.data.tiles import TileBatches, tiles_to_float
from rnagan_tpu.train.gan_trainer import GANTrainer, load_frozen_vae

VAE_SMALL = VAEModelConfig(rna_features=20, z_dim=16, encoder_dims=(24, 16), decoder_dims=(24,))


def test_torch_pt_checkpoint_drives_rnagan(tmp_path, rng):
    torch = pytest.importorskip("torch")
    import jax

    from rnagan_tpu.models.betavae import init_betavae, params_to_torch_state_dict

    # save a reference-layout .pt checkpoint
    variables = init_betavae(VAE_SMALL, jax.random.key(0))
    sd = {k: torch.tensor(np.asarray(v)) for k, v in params_to_torch_state_dict(VAE_SMALL, variables).items()}
    pt_path = str(tmp_path / "betavae_tissues.pt")
    torch.save(sd, pt_path)

    # load through the wganvae path (reference histopathology_gan.py:275-278)
    loaded = load_frozen_vae(pt_path, VAE_SMALL)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["z_mu"]["kernel"]),
        np.asarray(variables["params"]["z_mu"]["kernel"]),
        atol=1e-6,
    )

    cfg = GANConfig(
        model=GANModelConfig(encoding_dims=16, out_size=32, step_channels=8, compute_dtype="float32"),
        loss_type="wganvae", batch_size=16, vae=VAE_SMALL, vae_checkpoint=pt_path,
    )
    trainer = GANTrainer(cfg)  # loads the .pt via cfg.vae_checkpoint
    tiles = tiles_to_float((rng.rand(16, 32, 32, 3) * 255).astype(np.uint8))
    batches = TileBatches(tiles, rna=rng.randn(16, 20).astype(np.float32), batch_size=16, pad_to=8)
    _, results = trainer.fit(lambda e: batches.epoch(e), num_epochs=1)
    assert np.isfinite(results["history"][0]["g_loss"])
