"""GAN checkpoint interop with the reference's torchgan ``.model`` format.

Validates BOTH directions against real torch modules built in torchgan's
Sequential layout (reference ``histopathology_gan.py:175-192`` constructs
torchgan DCGANGenerator/DCGANDiscriminator; its ``Trainer`` pickles their
state_dicts + Adam states into ``.model`` bundles, loaded at
``histopathology_gan.py:311-312`` / ``gan_utils.py:297``):

* export: our flax G/D weights -> torchgan-layout state_dicts load with
  ``strict=True`` into the torch replicas and produce the same outputs;
* import: a ``.model`` bundle written by torch round-trips into a
  GANTrainState (weights, BN stats, Adam moments) whose samples match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rnagan_tpu.core.config import GANConfig, GANModelConfig  # noqa: E402

CFG = GANModelConfig(encoding_dims=16, out_size=32, step_channels=8, compute_dtype="float32")


def torchgan_generator(cfg):
    """torchgan DCGANGenerator layout: Sequential of Sequential(ConvT, BN, nl)
    blocks, biases only where BN is absent."""
    r = cfg.out_size.bit_length() - 4
    d = cfg.step_channels * 2**r
    nl = torch.nn.LeakyReLU(cfg.leaky_slope)
    blocks = [torch.nn.Sequential(
        torch.nn.ConvTranspose2d(cfg.encoding_dims, d, 4, 1, 0, bias=False),
        torch.nn.BatchNorm2d(d), nl)]
    for _ in range(r):
        blocks.append(torch.nn.Sequential(
            torch.nn.ConvTranspose2d(d, d // 2, 4, 2, 1, bias=False),
            torch.nn.BatchNorm2d(d // 2), nl))
        d //= 2
    blocks.append(torch.nn.Sequential(
        torch.nn.ConvTranspose2d(d, cfg.out_channels, 4, 2, 1, bias=True), torch.nn.Tanh()))

    class G(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.Sequential(*blocks)

        def forward(self, z):
            return self.model(z.view(z.shape[0], -1, 1, 1))

    return G()


def torchgan_discriminator(cfg):
    r = cfg.out_size.bit_length() - 4
    d = cfg.step_channels
    nl = torch.nn.LeakyReLU(cfg.leaky_slope)
    blocks = [torch.nn.Sequential(torch.nn.Conv2d(cfg.out_channels, d, 4, 2, 1, bias=True), nl)]
    for _ in range(r):
        blocks.append(torch.nn.Sequential(
            torch.nn.Conv2d(d, d * 2, 4, 2, 1, bias=False), torch.nn.BatchNorm2d(d * 2), nl))
        d *= 2
    last = [torch.nn.Conv2d(d, 1, 4, 1, 0, bias=True)]
    if cfg.disc_last_leaky:
        last.append(nl)
    blocks.append(torch.nn.Sequential(*last))

    class D(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.Sequential(*blocks)

        def forward(self, x):
            return self.model(x).view(x.shape[0])

    return D()


@pytest.fixture(scope="module")
def trained_state():
    """A GANTrainState with non-trivial BN stats and Adam moments (two real
    wgan steps on random tiles)."""
    from rnagan_tpu.train.gan_trainer import GANTrainer

    cfg = GANConfig(model=CFG, loss_type="wgan", batch_size=4, seed=3)
    trainer = GANTrainer(cfg)
    state = trainer.init_state()
    rng = np.random.RandomState(0)
    for _ in range(2):
        batch = {"image": jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32) * 2 - 1)}
        state, _ = trainer._train_step(state, batch, None)
    jax.block_until_ready(state.g_params)
    return trainer, state


def test_generator_state_dict_drives_torch_replica(trained_state):
    from rnagan_tpu.models.dcgan import make_generator
    from rnagan_tpu.models.dcgan_torch import generator_state_dict

    _, state = trained_state
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) if getattr(v, "ndim", 0) else torch.tensor(v)
          for k, v in generator_state_dict(CFG, jax.device_get(state.g_params),
                                           jax.device_get(state.g_stats)).items()}
    tg = torchgan_generator(CFG)
    tg.load_state_dict(sd, strict=True)  # key layout must match torchgan exactly
    tg.eval()

    z = np.random.RandomState(1).randn(2, 16).astype(np.float32)
    flax_out = make_generator(CFG).apply(
        {"params": state.g_params, "batch_stats": state.g_stats}, jnp.asarray(z), train=False)
    torch_out = tg(torch.from_numpy(z)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(flax_out), torch_out, atol=1e-5)


def test_discriminator_state_dict_drives_torch_replica(trained_state):
    from rnagan_tpu.models.dcgan import make_discriminator
    from rnagan_tpu.models.dcgan_torch import discriminator_state_dict

    _, state = trained_state
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) if getattr(v, "ndim", 0) else torch.tensor(v)
          for k, v in discriminator_state_dict(CFG, jax.device_get(state.d_params),
                                               jax.device_get(state.d_stats)).items()}
    td = torchgan_discriminator(CFG)
    td.load_state_dict(sd, strict=True)
    td.eval()

    x = np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    flax_out = make_discriminator(CFG).apply(
        {"params": state.d_params, "batch_stats": state.d_stats}, jnp.asarray(x), train=False)
    torch_out = td(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(np.asarray(flax_out), torch_out, atol=1e-5)


def test_bundle_export_import_roundtrip(trained_state, tmp_path):
    """export -> torch.load -> import restores weights, BN stats AND Adam
    moments bit-exactly; training can continue from the imported state."""
    from rnagan_tpu.models.dcgan_torch import export_torchgan_bundle, import_torchgan_bundle

    trainer, state = trained_state
    path = str(tmp_path / "rna-gan.model")
    export_torchgan_bundle(path, trainer.cfg, jax.device_get(state), epoch=7,
                           loss_information={"d_loss": 0.5})

    bundle = torch.load(path, map_location="cpu", weights_only=False)
    assert bundle["epoch"] == 8
    assert set(bundle) >= {"generator", "discriminator",
                           "optimizer_generator", "optimizer_discriminator"}
    # optimizer layout is torch Adam's
    og = bundle["optimizer_generator"]
    assert og["param_groups"][0]["betas"] == (trainer.cfg.adam_b1, trainer.cfg.adam_b2)
    assert {"step", "exp_avg", "exp_avg_sq"} <= set(og["state"][0])

    template = trainer.init_state()
    restored, epoch = import_torchgan_bundle(path, trainer.cfg, template)
    assert epoch == 7

    src = jax.device_get(state)
    for a, b in zip(jax.tree_util.tree_leaves(src.g_params),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(src.d_opt),
                    jax.tree_util.tree_leaves(restored.d_opt)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   atol=1e-7)

    # the imported state trains onward
    batch = {"image": jnp.asarray(np.random.RandomState(5).rand(4, 32, 32, 3)
                                  .astype(np.float32) * 2 - 1)}
    restored = jax.device_put(restored)
    new_state, metrics = trainer._train_step(restored.replace(step=jnp.asarray(2, jnp.int32)),
                                             batch, None)
    assert np.isfinite(float(metrics["d_loss"]))


def test_bundle_import_with_lazy_adam_state(trained_state, tmp_path):
    """torch Adam populates per-param state lazily: a bundle saved before the
    first optimizer step (or with params that never saw gradients) has a
    partial/empty state dict — those params' moments stay at template zeros
    instead of crashing the import."""
    from rnagan_tpu.models.dcgan_torch import export_torchgan_bundle, import_torchgan_bundle

    trainer, state = trained_state
    path = str(tmp_path / "lazy.model")
    export_torchgan_bundle(path, trainer.cfg, jax.device_get(state), epoch=0)

    bundle = torch.load(path, map_location="cpu", weights_only=False)
    # simulate lazily-unpopulated optimizer state for every other param
    for opt_key in ("optimizer_generator", "optimizer_discriminator"):
        st = bundle[opt_key]["state"]
        for i in list(st):
            if int(i) % 2 == 1:
                del st[i]
    torch.save(bundle, path)

    template = trainer.init_state()
    restored, _ = import_torchgan_bundle(path, trainer.cfg, template)
    # present entries imported, absent ones remain zeros; nothing crashed
    mu_leaves = jax.tree_util.tree_leaves(restored.g_opt)
    assert all(np.isfinite(np.asarray(leaf, np.float32)).all() for leaf in mu_leaves)
