"""beta-VAE: loss golden values vs torch, model shape/dtype contracts, torch
state_dict interop parity, and a convergence smoke run on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnagan_tpu.core.config import VAEConfig, VAEModelConfig, MeshConfig
from rnagan_tpu.core.rng import KeyStream
from rnagan_tpu.losses.vae import beta_vae_loss
from rnagan_tpu.models.betavae import (
    BetaVAE,
    init_betavae,
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)

SMALL = VAEModelConfig(rna_features=60, z_dim=16, encoder_dims=(48, 32, 16), decoder_dims=(32, 48), beta=0.0005)


def test_beta_vae_loss_matches_torch_reference_formula(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(8, 20).astype(np.float32)
    xr = rng.randn(8, 20).astype(np.float32)
    mu = rng.randn(8, 5).astype(np.float32)
    lv = rng.randn(8, 5).astype(np.float32)
    beta = 0.0005

    tx, txr, tmu, tlv = map(torch.tensor, (x, xr, mu, lv))
    recons_t = torch.nn.functional.mse_loss(txr, tx)
    kld_t = torch.mean(-0.5 * torch.sum(1 + tlv - tmu**2 - tlv.exp(), dim=1), dim=0)
    total_t = recons_t + beta * kld_t

    ours = beta_vae_loss(jnp.asarray(x), jnp.asarray(xr), jnp.asarray(mu), jnp.asarray(lv), beta)
    np.testing.assert_allclose(float(ours["reconstruction_loss"]), recons_t.item(), rtol=1e-5)
    np.testing.assert_allclose(float(ours["kl_loss"]), kld_t.item(), rtol=1e-5)
    np.testing.assert_allclose(float(ours["total_loss"]), total_t.item(), rtol=1e-5)
    # validation total drops KL (reference betaVAE.py:151-155)
    ours_val = beta_vae_loss(jnp.asarray(x), jnp.asarray(xr), jnp.asarray(mu), jnp.asarray(lv), beta, training=False)
    np.testing.assert_allclose(float(ours_val["total_loss"]), recons_t.item(), rtol=1e-5)


def test_betavae_shapes_and_tanh_range(rng):
    variables = init_betavae(SMALL, jax.random.key(0))
    model = BetaVAE(SMALL)
    x = jnp.asarray(rng.randn(4, 60), jnp.float32)
    out, mu, lv = model.apply(
        variables, x, train=False, rngs={"reparam": jax.random.key(1)}
    )
    assert out.shape == (4, 60) and mu.shape == (4, 16) and lv.shape == (4, 16)
    assert out.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh output


def test_encode_decode_methods(rng):
    variables = init_betavae(SMALL, jax.random.key(0))
    model = BetaVAE(SMALL)
    x = jnp.asarray(rng.randn(4, 60), jnp.float32)
    mu, lv, enc = model.apply(variables, x, train=False, method=BetaVAE.encode)
    assert enc.shape == (4, 16)
    dec = model.apply(variables, mu, train=False, method=BetaVAE.decode)
    assert dec.shape == (4, 60)
    # sample with interpolation offset (reference betaVAE.py:131-139)
    z = jax.random.normal(jax.random.key(2), (3, 16))
    offset = jnp.ones((16,))
    s = model.apply(variables, z, interpolation=offset, alpha=0.5, method=BetaVAE.sample)
    assert s.shape == (3, 60)


def test_torch_state_dict_roundtrip_parity(rng):
    """Export flax params to torch layout, rebuild the torch reference
    architecture from them, and check forward parity in eval mode."""
    torch = pytest.importorskip("torch")
    torch_nn = torch.nn

    variables = init_betavae(SMALL, jax.random.key(0))
    sd = params_to_torch_state_dict(SMALL, variables)
    sd = {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}

    # torch mirror of the reference betaVAE architecture (betaVAE.py:63-94)
    class TEnc(torch_nn.Module):
        def __init__(self):
            super().__init__()
            mods = [torch_nn.Sequential(torch_nn.Dropout())]
            inc = SMALL.rna_features
            for h in SMALL.encoder_dims:
                mods.append(torch_nn.Sequential(torch_nn.Linear(inc, h), torch_nn.BatchNorm1d(h), torch_nn.LeakyReLU()))
                inc = h
            self.encoder = torch_nn.Sequential(*mods)

    class TVAE(torch_nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = TEnc()
            self.z_mu = torch_nn.Linear(SMALL.z_dim, SMALL.z_dim)
            self.z_logvar = torch_nn.Linear(SMALL.z_dim, SMALL.z_dim)
            mods = []
            inc = SMALL.z_dim
            for h in SMALL.decoder_dims:
                mods.append(torch_nn.Sequential(torch_nn.Linear(inc, h), torch_nn.BatchNorm1d(h), torch_nn.LeakyReLU()))
                inc = h
            mods.append(torch_nn.Sequential(torch_nn.Linear(inc, SMALL.rna_features), torch_nn.Tanh()))
            self.decoder = torch_nn.Sequential(*mods)

    tmodel = TVAE()
    tmodel.load_state_dict(sd)
    tmodel.eval()

    x = rng.randn(4, 60).astype(np.float32)
    with torch.no_grad():
        enc_t = tmodel.encoder.encoder(torch.tensor(x))
        mu_t = tmodel.z_mu(enc_t).numpy()
        dec_t = tmodel.decoder(torch.tensor(mu_t)).numpy()

    model = BetaVAE(SMALL)
    mu_j, _, _ = model.apply(variables, jnp.asarray(x), train=False, method=BetaVAE.encode)
    dec_j = model.apply(variables, jnp.asarray(mu_t), train=False, method=BetaVAE.decode)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dec_j), dec_t, atol=1e-4)

    # and the inverse import direction
    variables2 = params_from_torch_state_dict(SMALL, {k: v.numpy() for k, v in sd.items()})
    mu_j2, _, _ = model.apply(variables2, jnp.asarray(x), train=False, method=BetaVAE.encode)
    np.testing.assert_allclose(np.asarray(mu_j2), np.asarray(mu_j), atol=1e-6)


def test_vae_trainer_converges_on_mesh(rng):
    """End-to-end smoke: loss decreases on synthetic data, sharded over the
    8-device CPU mesh."""
    from rnagan_tpu.train.vae_trainer import VAETrainer

    cfg = VAEConfig(
        model=SMALL,
        lr=1e-3,
        batch_size=16,
        num_epochs=8,
        warmup_steps=10,
        cosine_steps=1000,
        mesh=MeshConfig(),
    )
    # low-rank synthetic expression in [-1, 1]
    basis = rng.randn(4, 60).astype(np.float32)
    codes = rng.randn(96, 4).astype(np.float32)
    data = np.tanh(codes @ basis * 0.5)
    trainer = VAETrainer(cfg)
    state, results = trainer.fit(data[:80], data[80:])
    first = results["history"]["val"][0]["total_loss"]
    last = results["history"]["val"][-1]["total_loss"]
    assert last < first
    test_losses, preds = trainer.evaluate(data[80:], state)
    assert preds.shape == (16, 60)
    assert np.isfinite(test_losses["total_loss"])
