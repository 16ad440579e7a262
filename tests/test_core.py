"""Core subsystems: rng streams, checkpoint round-trips, mesh/sharding, schedules."""

import jax
import jax.numpy as jnp
import numpy as np

from rnagan_tpu.core.checkpoint import BestKeeper, load_bundle, load_pytree, save_bundle, save_pytree
from rnagan_tpu.core.config import MeshConfig, VAEConfig, vae_config_from_json
from rnagan_tpu.core.rng import KeyStream, step_key
from rnagan_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from rnagan_tpu.train.schedules import gradual_warmup_cosine


def test_keystream_deterministic_and_distinct():
    ks = KeyStream(99)
    a = ks.fold("dropout", 5)
    b = KeyStream(99).fold("dropout", 5)
    assert jnp.array_equal(jax.random.key_data(a), jax.random.key_data(b))
    c = ks.fold("reparam", 5)
    assert not jnp.array_equal(jax.random.key_data(a), jax.random.key_data(c))
    # step_key works with traced steps
    f = jax.jit(lambda s: jax.random.normal(step_key(ks.key, s), (2,)))
    assert not np.allclose(np.asarray(f(0)), np.asarray(f(1)))


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "nested": {"b": np.float32(2.5)}}
    p = str(tmp_path / "ck.msgpack")
    save_pytree(p, tree)
    back = load_pytree(p)
    np.testing.assert_array_equal(back["a"], tree["a"])
    assert float(back["nested"]["b"]) == 2.5

    bp = str(tmp_path / "bundle.model")
    save_bundle(bp, {"gen": tree, "step": np.int32(7)}, {"epoch": 3})
    trees, meta = load_bundle(bp)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(trees["gen"]["a"], tree["a"])


def test_best_keeper(tmp_path):
    keeper = BestKeeper(str(tmp_path))
    assert keeper.update(0, 1.0, {"p": np.zeros(2)})
    assert not keeper.update(1, 2.0, {"p": np.ones(2)})
    assert keeper.update(2, 0.5, {"p": np.ones(2) * 3})
    trees, meta = load_bundle(keeper.best_path)
    assert meta["epoch"] == 2
    np.testing.assert_array_equal(trees["p"], np.ones(2) * 3)


def test_mesh_and_shard_batch():
    mesh = make_mesh(MeshConfig())
    assert mesh.devices.size == len(jax.devices())
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2), "m": np.ones(16, np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == batch_sharding(mesh, 2).spec
    # a global mean over a sharded array is the true global mean
    assert float(jnp.mean(sharded["x"])) == float(np.mean(batch["x"]))


def test_warmup_cosine_schedule():
    sched = gradual_warmup_cosine(1e-3, warmup_steps=100, cosine_steps=500)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-6)
    # half a cosine period after warmup -> halfway between peak and min
    np.testing.assert_allclose(float(sched(100 + 250)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100 + 500)), 0.0, atol=1e-9)


def test_vae_config_from_reference_json():
    raw = {"rna_features": 19198, "beta": 0.0005, "lr": 5e-5, "batch_size": 128, "num_epochs": 500, "optimizer": "Adam", "weights_decay": 0}
    cfg = vae_config_from_json(raw)
    assert cfg.model.rna_features == 19198
    assert cfg.model.beta == 0.0005
    assert cfg.lr == 5e-5
    assert cfg.batch_size == 128


def test_async_saver(tmp_path):
    from rnagan_tpu.core.checkpoint import AsyncSaver, load_bundle

    saver = AsyncSaver()
    p = str(tmp_path / "a.model")
    saver.save_bundle(p, {"x": np.arange(4)}, {"epoch": 1})
    saver.save_bundle(p, {"x": np.arange(4) * 2}, {"epoch": 2})  # waits for first
    saver.wait()
    trees, meta = load_bundle(p)
    assert meta["epoch"] == 2
    np.testing.assert_array_equal(trees["x"], np.arange(4) * 2)


def test_async_saver_survives_donation(tmp_path):
    """The saved snapshot must not alias buffers a later jitted step donates
    (the race that silently dropped per-epoch GAN checkpoints)."""
    import jax
    import jax.numpy as jnp

    from rnagan_tpu.core.checkpoint import AsyncSaver, load_bundle

    saver = AsyncSaver()
    x = jnp.arange(8, dtype=jnp.float32)

    @jax.jit
    def donate_step(a):
        return a + 1

    donate_step = jax.jit(lambda a: a + 1, donate_argnums=(0,))
    p = str(tmp_path / "d.model")
    saver.save_bundle(p, {"x": x}, {"epoch": 0})
    _ = donate_step(x)  # donates/deletes x's buffer immediately
    saver.wait()  # raises if the worker hit 'Array has been deleted'
    trees, _ = load_bundle(p)
    np.testing.assert_array_equal(trees["x"], np.arange(8, dtype=np.float32))
