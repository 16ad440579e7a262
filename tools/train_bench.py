"""RNA-GAN training-step benchmark on one chip (chained lax.scan timing).

Production configuration: 256x256 tiles, z=2048, step_channels 64, frozen
19,198-gene beta-VAE encoder, wganvae loss family (D critic + fused GP + G),
global batch 8 (the reference's hardcoded batch, histopathology_gan.py:94) and
batch 32 for scale. Anchors the <=1h-to-reference-FID target: the reference
trains RNA-GAN brain for 24 epochs x ~246 slides x 600 tiles / 8 per step
~= 440k steps worth of data budget (README.md:62-81).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
    from rnagan_tpu.models.betavae import init_betavae
    from rnagan_tpu.train.gan_trainer import GANTrainer

    for batch in (8, 32):
        vae_cfg = VAEModelConfig(compute_dtype="bfloat16")
        cfg = GANConfig(model=GANModelConfig(), loss_type="wganvae", batch_size=batch, vae=vae_cfg)
        vae_vars = init_betavae(vae_cfg, jax.random.key(0))
        trainer = GANTrainer(cfg, vae_variables=vae_vars)
        state = trainer.init_state()

        rng = np.random.RandomState(0)
        batch_data = {
            "image": jnp.asarray(rng.rand(batch, 256, 256, 3).astype(np.float32) * 2 - 1),
            "rna_data": jnp.asarray(rng.randn(batch, vae_cfg.rna_features).astype(np.float32)),
        }

        step_impl = trainer._train_step_impl

        @partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
        def chain(state, n):
            def body(s, _):
                s2, metrics = step_impl(s, batch_data)
                return s2, metrics["d_loss"]

            s, losses = jax.lax.scan(body, state, None, length=n)
            return s, losses[-1]

        def timed(n, state):
            state, loss = chain(state, n)
            float(loss)  # forces completion
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                state, loss = chain(state, n)
                float(loss)
                best = min(best, time.perf_counter() - t0)
            return best, state

        t_short, state = timed(2, state)
        t_long, state = timed(12, state)
        per_step = (t_long - t_short) / 10
        print(
            f"batch {batch:3d}: {per_step*1e3:8.2f} ms/step  "
            f"{batch/per_step:8.1f} tiles/s  {1/per_step:6.2f} steps/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
