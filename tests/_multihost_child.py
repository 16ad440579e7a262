"""Child process for the 2-process multi-host test (test_multihost.py).

Run as: python _multihost_child.py <process_id> <port>
Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent); the
global mesh is 8-wide on the data axis. Each process supplies only its LOCAL
half of the global batch, driving shard_batch's
``make_array_from_process_local_data`` branch (SURVEY.md 5.8), and runs one
wgan GAN train step. Both processes print the same global metrics line.
"""

import sys

import numpy as np


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        print("SKIP: no gloo cpu collectives", flush=True)
        return 0

    from rnagan_tpu.parallel.mesh import init_distributed

    init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import jax.numpy as jnp

    from rnagan_tpu.core.config import GANConfig, GANModelConfig, MeshConfig
    from rnagan_tpu.parallel.mesh import make_mesh, shard_batch
    from rnagan_tpu.train.gan_trainer import GANTrainer

    mesh = make_mesh(MeshConfig(data=8, model=1))
    model_cfg = GANModelConfig(encoding_dims=8, out_size=16, step_channels=4,
                               compute_dtype="float32")
    cfg = GANConfig(model=model_cfg, loss_type="wgan", batch_size=8, seed=7)
    trainer = GANTrainer(cfg, mesh=mesh)
    state = trainer.init_state()

    # per-process LOCAL half of the global batch (process 0 -> rows 0..3,
    # process 1 -> rows 4..7 of the deterministic global batch)
    rng = np.random.RandomState(0)
    global_images = rng.rand(8, 16, 16, 3).astype(np.float32) * 2 - 1
    local = {"image": global_images[pid * 4 : (pid + 1) * 4]}
    sharded = shard_batch(local, mesh)
    assert sharded["image"].shape == (8, 16, 16, 3), sharded["image"].shape

    state, metrics = trainer._train_step(state, sharded, None)
    jax.block_until_ready(metrics["d_loss"])
    vals = {k: float(jax.device_get(v)) for k, v in sorted(metrics.items())}
    print("METRICS " + " ".join(f"{k}={v:.6f}" for k, v in vals.items()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
