"""Stage-level timing of the wganvae training step on one chip.

There is no working sampling profiler over this tunneled backend, so this
breaks the step into separately-jitted stage programs and times each with
the chained-scan differencing method (see bench.py): corpus render, VAE
encode + infusion, G forward, D forward, fused D loss+GP grad, G update.
The sum roughly reproduces the full step; the largest bars are where
optimization effort should go.

Usage: python tools/step_profile.py [batch] [--fused-critic] [--mu_bf16]

``--mu_bf16`` sets GANConfig.adam_mu_dtype="bfloat16" — A/B it against the
default to see how much of the batch-independent ``adam_updates`` floor is
first-moment HBM traffic.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

N_SHORT, N_LONG = 2, 10


def timed_chain(make_body, carry0, *args):
    """Time one body execution via chained-scan differencing."""

    @partial(jax.jit, static_argnums=(1,))
    def chain(carry, n, *a):
        def body(c, i):
            return make_body(c, i, *a), None

        c, _ = jax.lax.scan(body, carry, jnp.arange(n))
        # scalar probe: a full reduction over EVERY carry leaf keeps a data
        # dependency on every element (XLA cannot dead-code any part of the
        # scan) while the host fetch stays 4 bytes. Fetching an actual leaf
        # here is the trap this replaces: np.asarray(leaf) pulls the whole
        # array through the ~20 MB/s tunnel RPC — for the optimizer/FULL_STEP
        # stages that is a multi-second transfer whose variance swamps the
        # chain differencing (the round-3 488 ms "adam_updates" artifact).
        return jax.tree_util.tree_reduce(
            lambda acc, leaf: acc + jnp.sum(leaf.astype(jnp.float32)),
            c, jnp.float32(0.0))

    def run(n):
        # exactly ONE chain execution per timed run: float() blocks on the
        # 4-byte scalar fetch, so no separate block_until_ready call (which
        # would execute the chain a second time and double every stage time —
        # the round-3 FULL_STEP 34.5 ms vs bench 16.2 ms discrepancy)
        float(chain(carry0, n, *args))

    def t(n):
        run(n)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(n)
            best = min(best, time.perf_counter() - t0)
        return best

    t_s, t_l = t(N_SHORT), t(N_LONG)
    if t_l <= t_s:
        t_s, t_l = t(N_SHORT), t(N_LONG)
    return max(t_l - t_s, 1e-9) / (N_LONG - N_SHORT)


def main():
    from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
    from rnagan_tpu.data.synthetic import SyntheticCorpus, render_batch
    from rnagan_tpu.losses import gan as gan_losses
    from rnagan_tpu.losses.rna_infusion import encode_z_mean, infused_noise
    from rnagan_tpu.models.betavae import init_betavae
    from rnagan_tpu.train.gan_trainer import GANTrainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32
    fused_critic = "--fused-critic" in sys.argv
    if "--cpu" in sys.argv:  # smoke/verify runs while the TPU tunnel is busy/down
        jax.config.update("jax_platforms", "cpu")
    # --smoke: 64px model so a CPU verification drive finishes in minutes;
    # the stage structure (what's timed, how carries chain) is what's driven
    size = 64 if "--smoke" in sys.argv else 256

    mu_bf16 = "--mu_bf16" in sys.argv
    vae_cfg = VAEModelConfig(compute_dtype="bfloat16")
    cfg = GANConfig(model=GANModelConfig(out_size=size), loss_type="wganvae",
                    batch_size=batch, vae=vae_cfg, fused_critic_batch=fused_critic,
                    adam_mu_dtype="bfloat16" if mu_bf16 else None)
    vae_vars = init_betavae(vae_cfg, jax.random.key(0))
    trainer = GANTrainer(cfg, vae_variables=vae_vars)
    state = trainer.init_state()
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32) * 2 - 1)
    gene = jnp.asarray(rng.randn(batch, vae_cfg.rna_features).astype(np.float32))
    noise = jnp.asarray(rng.randn(batch, 2048).astype(np.float32))
    key = jax.random.key(0)
    corpus = SyntheticCorpus(n_slides=8, tiles_per_slide=16)
    bd = {"image": real, "rna_data": gene}

    results = {}

    # 1. corpus render (quality-run input path)
    def render_body(c, i):
        sl = jax.random.randint(jax.random.fold_in(key, i + c), (batch,), 0, 8)
        img = render_batch(corpus._render_key, corpus.slides.s[sl], sl * 16 + i, size)
        return c + jnp.mean(img).astype(jnp.int32) * 0

    results["render"] = timed_chain(render_body, jnp.int32(0))

    # 2. VAE encode + infusion
    def enc_body(c, i, vv):
        z = encode_z_mean(trainer.vae, vv, gene + c * 1e-9)
        n = infused_noise(jax.random.fold_in(key, i), z)
        return jnp.mean(n)

    results["vae_encode+infuse"] = timed_chain(enc_body, jnp.float32(0), vae_vars)

    # 3. G forward
    def g_fwd(c, i, gp, gs):
        img, _ = trainer._g_apply(gp, gs, noise + c * 1e-9, None)
        return jnp.mean(img).astype(jnp.float32)

    results["g_forward"] = timed_chain(g_fwd, jnp.float32(0), state.g_params, state.g_stats)

    # 4. D forward
    def d_fwd(c, i, dp, ds):
        out, _ = trainer._d_apply(dp, ds, real + c * 1e-9, None)
        return jnp.mean(out).astype(jnp.float32)

    results["d_forward"] = timed_chain(d_fwd, jnp.float32(0), state.d_params, state.d_stats)

    # 5. D loss + fused GP: grad wrt D params (the critic update's backward)
    eps = jax.random.uniform(key, (batch, 1, 1, 1))
    fake = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32) * 2 - 1)
    interp = eps * real + (1 - eps) * fake

    def d_update(c, i, dp, ds):
        def loss_fn(p):
            dx, s1 = trainer._d_apply(p, ds, real + c * 1e-9, None)
            dgz, s2 = trainer._d_apply(p, s1, fake, None)
            loss = gan_losses.wasserstein_discriminator_loss(dx, dgz)

            def critic(x):
                out, _ = trainer._d_apply(p, s2, x, None)
                return out

            gp = gan_losses.gradient_penalty(critic, interp, per_sample=True)
            return loss + cfg.gp_lambda * gp

        g = jax.grad(loss_fn)(dp)
        return jnp.asarray(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g, 0.0))

    results["d_loss+gp_grad"] = timed_chain(d_update, jnp.float32(0), state.d_params, state.d_stats)

    # 6. G update (forward G -> D -> backward to G params)
    def g_update(c, i, gp, gs, dp, ds):
        def loss_fn(p):
            img, _ = trainer._g_apply(p, gs, noise + c * 1e-9, None)
            out, _ = trainer._d_apply(dp, ds, img, None)
            return gan_losses.wasserstein_generator_loss(out)

        g = jax.grad(loss_fn)(gp)
        return jnp.asarray(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g, 0.0))

    results["g_loss_grad"] = timed_chain(
        g_update, jnp.float32(0), state.g_params, state.g_stats, state.d_params, state.d_stats)

    # 7. optimizer updates alone — batch-INDEPENDENT HBM traffic (Adam reads
    # params + 2 moments and writes all three for BOTH nets). At small batch
    # this fixed term is a floor no batching lever can touch.
    import optax

    def opt_body(carry, i):
        gp, go, dp, do = carry
        gg = jax.tree_util.tree_map(lambda p: p * 1e-9, gp)  # data-dependent grads
        up, go = trainer.g_tx.update(gg, go, gp)
        gp = optax.apply_updates(gp, up)
        dg = jax.tree_util.tree_map(lambda p: p * 1e-9, dp)
        up, do = trainer.d_tx.update(dg, do, dp)
        dp = optax.apply_updates(dp, up)
        return (gp, go, dp, do)

    results["adam_updates(G+D)"] = timed_chain(
        opt_body, (state.g_params, state.g_opt, state.d_params, state.d_opt))

    # 8. the full step for reference
    def full(c, i, vv):
        st2, _ = trainer._train_step_impl(c, bd, vv)
        return st2

    results["FULL_STEP"] = timed_chain(full, state, trainer.vae_variables)

    n_gp = sum(x.size for x in jax.tree_util.tree_leaves(state.g_params))
    n_dp = sum(x.size for x in jax.tree_util.tree_leaves(state.d_params))
    print(f"\nbatch={batch} fused_critic={fused_critic} mu_bf16={mu_bf16} "
          f"params: G={n_gp / 1e6:.1f}M D={n_dp / 1e6:.1f}M")
    for k, v in results.items():
        print(f"  {k:<20} {v * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
