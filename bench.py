"""Headline benchmark: RNA-GAN tile-synthesis throughput on one chip.

Baseline anchor (BASELINE.md north star): >= 5,000 256x256 tiles/sec/chip.
The reference's synthesis path decodes in chunks of 10 on a single GPU
(reference ``gan_utils.py:217-224``); here the whole path (frozen beta-VAE
encode -> infused noise -> DCGAN generator at 256x256, bf16) is one jitted
XLA program, batched to saturate the MXU.

Measurement note: on this image's axon tunnel backend, ``block_until_ready``
returns before remote execution completes, so naive wall-clock loops
over-report by ~10x. We therefore chain N synthesis steps inside one
``lax.scan`` program (each step's noise depends on the previous step's
output, forcing serial execution) and difference the run times of a short and
a long chain — constant RPC/launch overhead cancels exactly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

BASELINE_TILES_PER_SEC = 5000.0
# batch sweep on v5e (folded generator): 64 -> 17.0k, 128 -> 24.7k,
# 256 -> 25.7k tiles/s; 128 amortizes weight loads with headroom to spare
BATCH = 128
N_SHORT, N_LONG = 2, 12
# peak dense bf16 matmul throughput per chip, for the MFU figure
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "TPU v5p": 459e12}
# reference batch (histopathology_gan.py:94) + scaled batches; the MFU-vs-
# batch sweep (docs/PERF.md) shows the step is MXU-bound past b64 and crosses
# 60% MFU at b128
TRAIN_BATCHES = (8, 64, 128)

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def train_metrics() -> dict:
    """wganvae training-step metrics on one chip: step time at the reference
    batch (8) and a scaled batch (64), tiles/s, and MFU vs the chip's peak
    bf16 matmul rate (flops per step from XLA's own cost analysis of the
    compiled D+GP+G program; hot loop match: reference wgan_loss.py:82-389)."""
    import numpy as np

    from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
    from rnagan_tpu.models.betavae import init_betavae
    from rnagan_tpu.train.gan_trainer import GANTrainer

    peak = next((v for k, v in PEAK_FLOPS.items()
                 if k in jax.devices()[0].device_kind), None)
    vae_cfg = VAEModelConfig(compute_dtype="bfloat16")
    vae_vars = init_betavae(vae_cfg, jax.random.key(0))
    rng = np.random.RandomState(0)
    out = {}
    for batch in TRAIN_BATCHES:
        cfg = GANConfig(model=GANModelConfig(), loss_type="wganvae",
                        batch_size=batch, vae=vae_cfg)
        trainer = GANTrainer(cfg, vae_variables=vae_vars)
        state = trainer.init_state()
        bd = {
            "image": jnp.asarray(rng.rand(batch, 256, 256, 3).astype(np.float32) * 2 - 1),
            "rna_data": jnp.asarray(rng.randn(batch, vae_cfg.rna_features).astype(np.float32)),
        }
        step_impl = trainer._train_step_impl

        # flops of ONE step, from the compiled program itself
        compiled = jax.jit(step_impl).lower(state, bd, vae_vars).compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            step_flops = float(ca.get("flops", 0.0))
        except Exception:
            step_flops = 0.0

        # timing: chained scan, differenced (constant RPC overhead cancels)
        @partial(jax.jit, static_argnums=(1,))
        def chain(state, n, vv, bd):
            def body(s, _):
                s2, m = step_impl(s, bd, vv)
                return s2, m["d_loss"]

            s, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]

        def timed(n):
            float(chain(state, n, vae_vars, bd))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(state, n, vae_vars, bd))
                best = min(best, time.perf_counter() - t0)
            return best

        t_short, t_long = timed(N_SHORT), timed(N_LONG)
        if t_long <= t_short:
            t_short, t_long = timed(N_SHORT), timed(N_LONG)
        if t_long <= t_short:
            continue  # noisy: skip this batch size rather than lie
        step_s = (t_long - t_short) / (N_LONG - N_SHORT)
        out[f"train_step_ms_b{batch}"] = round(step_s * 1000.0, 2)
        out[f"train_tiles_per_sec_b{batch}"] = round(batch / step_s, 1)
        if step_flops and peak:
            out[f"train_mfu_b{batch}"] = round(step_flops / step_s / peak, 4)
    return out


def main():
    from rnagan_tpu.core.config import GANModelConfig, VAEModelConfig
    from rnagan_tpu.losses.rna_infusion import encode_z_mean, standardize_batch
    from rnagan_tpu.models.betavae import BetaVAE, init_betavae
    from rnagan_tpu.models.dcgan import init_gan

    from rnagan_tpu.eval.serving import dcgan_lax_apply, fold_generator

    vae_cfg = VAEModelConfig(compute_dtype="bfloat16")
    model_cfg = GANModelConfig()  # 256x256, z 2048, step 64, bf16 compute
    key = jax.random.key(0)
    vae = BetaVAE(vae_cfg)
    vae_vars = init_betavae(vae_cfg, key)
    gv, _ = init_gan(model_cfg, jax.random.fold_in(key, 1))
    # BN folded into conv kernels; weights stored f32 in HBM and cast to bf16
    # in-graph by dcgan_lax_apply (storing bf16 weights regressed ~25% in the
    # tools/serve_bench.py A/B; the lax-apply variant measured fastest in the
    # /tmp quant_bench sweep: 17.7k vs 17.0k tiles/s at batch 64)
    _, folded = fold_generator(model_cfg, gv["params"], gv["batch_stats"])
    g_vars = folded["params"]
    gene = jax.random.normal(key, (BATCH, vae_cfg.rna_features), jnp.float32)

    @partial(jax.jit, static_argnums=(3,))
    def chained_synth(g_vars, vae_variables, gene, n_iters, key):
        def body(carry, i):
            # full synthesis path; tiny carry feedback serializes the chain
            z_mean = encode_z_mean(vae, vae_variables, gene + carry * 1e-6)
            u = jax.random.uniform(
                jax.random.fold_in(key, i), (BATCH, model_cfg.encoding_dims), jnp.float32, -0.3, 0.3
            )
            noise = standardize_batch(u + z_mean)
            img = dcgan_lax_apply(model_cfg, g_vars, noise)
            return jnp.mean(img).astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
        return carry

    def timed(n):
        float(chained_synth(g_vars, vae_vars, gene, n, key))  # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(chained_synth(g_vars, vae_vars, gene, n, key))  # host fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = timed(N_SHORT)
    t_long = timed(N_LONG)
    if t_long <= t_short:  # noisy run: remeasure once, then fail loudly
        t_short, t_long = timed(N_SHORT), timed(N_LONG)
    if t_long <= t_short:
        raise RuntimeError(f"non-positive timing differential ({t_short=}, {t_long=})")
    per_batch = (t_long - t_short) / (N_LONG - N_SHORT)
    tiles_per_sec = BATCH / per_batch

    # the RECOMMENDED egress configuration (BN-folded generator + fused
    # tanh->uint8 Pallas epilogue — the make_serving_fn(uint8_output=True)
    # computation), same infusion pipeline. Weights ride as ARGUMENTS:
    # make_serving_fn's returned closure would inline them as HLO constants
    # when traced inside the scan (remote compiler rejects >~100 MB bodies)
    from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8

    @partial(jax.jit, static_argnums=(3,))
    def chained_serve(vae_variables, g_vars2, gene, n_iters, key):
        def body(carry, i):
            z_mean = encode_z_mean(vae, vae_variables, gene + carry * 1e-6)
            u = jax.random.uniform(
                jax.random.fold_in(key, i), (BATCH, model_cfg.encoding_dims), jnp.float32, -0.3, 0.3
            )
            noise = standardize_batch(u + z_mean)
            pre = dcgan_lax_apply(model_cfg, g_vars2, noise, final_tanh=False)
            img = pallas_tanh_to_uint8(pre, apply_tanh=True)
            return jnp.mean(img.astype(jnp.float32)), None

        carry, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
        return carry

    def timed_serve(n):
        float(chained_serve(vae_vars, g_vars, gene, n, key))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(chained_serve(vae_vars, g_vars, gene, n, key))
            best = min(best, time.perf_counter() - t0)
        return best

    serve_tps = None
    try:
        ts, tl = timed_serve(N_SHORT), timed_serve(N_LONG)
        if tl <= ts:
            ts, tl = timed_serve(N_SHORT), timed_serve(N_LONG)
        if tl > ts:
            serve_tps = BATCH / ((tl - ts) / (N_LONG - N_SHORT))
    except Exception as e:  # secondary metric: never take down the headline
        serve_error = f"{type(e).__name__}: {e}"
    else:
        serve_error = None

    record = {
        "metric": "rnagan_synthesis_throughput",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/sec/chip(256x256)",
        "vs_baseline": round(tiles_per_sec / BASELINE_TILES_PER_SEC, 4),
    }
    if serve_tps is not None:
        record["serve_uint8_tiles_per_sec"] = round(serve_tps, 2)
    elif serve_error:
        record["serve_metric_error"] = serve_error[:200]
    try:  # secondary metrics ride along in the same single JSON line
        record.update(train_metrics())
    except Exception as e:
        record["train_metrics_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
