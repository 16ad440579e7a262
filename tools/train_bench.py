"""RNA-GAN training-step benchmark on one chip (chained lax.scan timing;
see bench.py for why naive timing lies on this backend).

Usage:  python tools/train_bench.py <batch> <chain_len> [time]
Run twice (short + long chain) and difference the times:
    python tools/train_bench.py 8 2 time
    python tools/train_bench.py 8 12 time
    per_step = (t12 - t2) / 10

Production configuration: 256x256 tiles, z=2048, step 64, frozen 19,198-gene
beta-VAE encoder, wganvae loss (D critic + fused GP + G, one donated program).

Measured on v5e (f32 params / bf16 conv compute):
    batch  8: 16.9 ms/step ->  474 tiles/s,  59 steps/s
    batch 32: ~35 ms/step  ->  ~915 tiles/s
Reference training budget (README.md:62-81): RNA-GAN brain = 24 epochs x 246
slides x 600 tiles / batch 8 ~= 443k steps ~= 2.1 h on ONE v5e chip; a v4-8
data-parallel mesh at global batch 32 lands well inside the <=1 h target
(BASELINE.md) — the reference needed ~24 epochs on a GTX 2080/P40 class GPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    time_it = len(sys.argv) > 3

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

    # weights/batch as ARGUMENTS — closures would inline them as HLO constants
    @partial(jax.jit, static_argnums=(1,))
    def chain(state, n, vv, bd):
        def body(s, _):
            s2, m = step_impl(s, bd, vv)
            return s2, m["d_loss"]

        s, losses = jax.lax.scan(body, state, None, length=n)
        return s, losses[-1]

    t0 = time.time()
    state2, loss = chain(state, n, trainer.vae_variables, batch_data)
    print(f"batch {batch} n={n} compile+run {time.time() - t0:.0f}s loss {float(loss):.4f}", flush=True)
    if time_it:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, loss2 = chain(state, n, trainer.vae_variables, batch_data)
            float(loss2)
            best = min(best, time.perf_counter() - t0)
        print(f"TIMED batch {batch} n={n}: {best:.4f}s", flush=True)


if __name__ == "__main__":
    main()
