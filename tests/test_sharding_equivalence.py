"""The framework's central sharding claim: a training step over an N-device
data mesh produces EXACTLY the same numbers as the single-device run — batch
statistics (BatchNorm, noise standardization), losses, gradient penalty and
parameter updates are global-batch operations that XLA turns into collectives.
"""

import jax
import numpy as np
import pytest

from rnagan_tpu.core.config import GANConfig, GANModelConfig, MeshConfig, VAEConfig, VAEModelConfig
from rnagan_tpu.models.betavae import init_betavae
from rnagan_tpu.parallel.mesh import make_mesh, shard_batch
from rnagan_tpu.train.gan_trainer import GANTrainer

VAE_SMALL = VAEModelConfig(rna_features=20, z_dim=16, encoder_dims=(24, 16), decoder_dims=(24,))
MODEL32 = GANModelConfig(encoding_dims=16, out_size=32, step_channels=8, compute_dtype="float32")


def _meshes():
    devs = jax.devices()
    return (
        make_mesh(MeshConfig(data=1, model=1), devices=devs[:1]),
        make_mesh(MeshConfig(data=len(devs), model=1), devices=devs),
    )


def _run_steps(mesh, n_steps=3, loss_type="wganvae", compat=False):
    vae_vars = init_betavae(VAE_SMALL, jax.random.key(3))
    cfg = GANConfig(model=MODEL32, loss_type=loss_type, batch_size=16, vae=VAE_SMALL,
                    compat_reference_gp=compat, seed=7)
    trainer = GANTrainer(cfg, vae_variables=vae_vars, mesh=mesh)
    state = trainer.init_state()
    rng = np.random.RandomState(0)
    out = []
    for step in range(n_steps):
        batch = {
            "image": rng.rand(16, 32, 32, 3).astype(np.float32) * 2 - 1,
            "rna_data": rng.randn(16, 20).astype(np.float32),
        }
        sharded = shard_batch(batch, mesh)
        state, metrics = trainer._train_step(state, sharded, trainer.vae_variables)
        out.append({k: float(v) for k, v in jax.device_get(metrics).items()})
    final_param = np.asarray(jax.device_get(state.g_params["ConvTranspose_0"]["kernel"]))
    return out, final_param


@pytest.mark.parametrize("loss_type,compat", [("wganvae", False), ("wganvae", True), ("lsgan", False)])
def test_train_step_identical_across_mesh_sizes(loss_type, compat):
    mesh1, mesh8 = _meshes()
    if mesh8.devices.size < 2:
        pytest.skip("needs multiple devices")
    m1, p1 = _run_steps(mesh1, loss_type=loss_type, compat=compat)
    m8, p8 = _run_steps(mesh8, loss_type=loss_type, compat=compat)
    # identical math; differences are f32 reduction-order noise, which
    # compounds slightly over optimization steps
    for step, (a, b) in enumerate(zip(m1, m8)):
        tol = 2e-5 * (10 ** step)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-3, atol=tol,
                                       err_msg=f"metric {k} diverges across mesh sizes at step {step}")
    # parameters after 3 steps match too (gradients were identical)
    np.testing.assert_allclose(p1, p8, atol=5e-4)


def test_vae_train_step_identical_across_mesh_sizes(rng):
    from rnagan_tpu.train.vae_trainer import VAETrainer

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs multiple devices")
    data = rng.randn(64, 20).astype(np.float32)

    def run(mesh_cfg, devices):
        cfg = VAEConfig(model=VAE_SMALL, lr=1e-3, batch_size=16, num_epochs=2,
                        warmup_steps=4, mesh=mesh_cfg, seed=11)
        trainer = VAETrainer(cfg, mesh=make_mesh(mesh_cfg, devices=devices))
        state, results = trainer.fit(data[:48], data[48:])
        return results["history"]

    h1 = run(MeshConfig(data=1, model=1), devs[:1])
    h8 = run(MeshConfig(data=len(devs), model=1), devs)
    for e1, e8 in zip(h1["val"], h8["val"]):
        np.testing.assert_allclose(e1["total_loss"], e8["total_loss"], rtol=1e-3, atol=1e-4)


def test_vae_2d_mesh_tensor_parallel(rng):
    """(data=4, model=2) mesh: Dense kernels column-sharded over the model
    axis, training runs, and results match the 1-device run."""
    from rnagan_tpu.train.vae_trainer import VAETrainer

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    data = rng.randn(64, 20).astype(np.float32)
    cfg1 = VAEConfig(model=VAE_SMALL, lr=1e-3, batch_size=16, num_epochs=1,
                     warmup_steps=4, mesh=MeshConfig(data=1, model=1), seed=11)
    t1 = VAETrainer(cfg1, mesh=make_mesh(cfg1.mesh, devices=devs[:1]))
    _, r1 = t1.fit(data[:48], data[48:])

    cfg2 = VAEConfig(model=VAE_SMALL, lr=1e-3, batch_size=16, num_epochs=1,
                     warmup_steps=4, mesh=MeshConfig(data=4, model=2), seed=11)
    t2 = VAETrainer(cfg2, mesh=make_mesh(cfg2.mesh, devices=devs))
    state2 = t2.init_state()
    # the 16-wide encoder kernels actually got column-sharded over 'model'
    sh = state2.params["encoder"]["dense_0"]["kernel"].sharding
    assert "model" in str(sh.spec)
    state2, r2 = t2.fit(data[:48], data[48:], state=state2)
    np.testing.assert_allclose(
        r1["history"]["val"][0]["total_loss"], r2["history"]["val"][0]["total_loss"],
        rtol=1e-3, atol=1e-4,
    )


def test_shard_batch_passes_device_arrays_through():
    """A batch already transferred by a Prefetcher thread (jax.Array input)
    must not bounce through the host: shard_batch reshards on device and the
    result matches the numpy path exactly."""
    devs = jax.devices()
    mesh = make_mesh(MeshConfig(data=len(devs), model=1), devices=devs)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(16, 8, 8, 3).astype(np.float32),
        "rna_data": rng.randn(16, 20).astype(np.float32),
    }
    from_np = shard_batch(batch, mesh)
    pre_transferred = {k: jax.device_put(v) for k, v in batch.items()}
    from_dev = shard_batch(pre_transferred, mesh)
    for k in batch:
        assert from_dev[k].sharding == from_np[k].sharding
        np.testing.assert_array_equal(np.asarray(from_dev[k]), np.asarray(from_np[k]))
