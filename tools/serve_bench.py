"""Serving-path A/B benchmark on the real chip (chained-scan differential
timing — see bench.py for why naive timing lies on this backend).

Compares at full production size (256x256, z=2048, step 64, batch 64):
  A. baseline eval-mode generator (BN + f32 params + float output)
  B. BN-folded, bf16-weight generator (float output)
  C. B + fused Pallas tanh->uint8 epilogue
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BATCH = 64
N_SHORT, N_LONG = 2, 18


def chained(apply_fn, n_iters, key):
    def body(carry, i):
        noise = jax.random.normal(jax.random.fold_in(key, i), (BATCH, 2048)) + carry * 1e-6
        img = apply_fn(noise)
        return jnp.mean(img.astype(jnp.float32)), None

    carry, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
    return carry


def timed(apply_fn, key):
    run = jax.jit(partial(chained, apply_fn), static_argnums=(0,))
    out = {}
    for n in (N_SHORT, N_LONG):
        float(run(n, key))  # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(run(n, key))
            best = min(best, time.perf_counter() - t0)
        out[n] = best
    per_batch = (out[N_LONG] - out[N_SHORT]) / (N_LONG - N_SHORT)
    return BATCH / per_batch, per_batch


def main():
    from rnagan_tpu.core.config import GANModelConfig
    from rnagan_tpu.eval.serving import fold_generator, make_serving_fn
    from rnagan_tpu.models.dcgan import init_gan, make_generator

    cfg = GANModelConfig()
    key = jax.random.key(0)
    gv, _ = init_gan(cfg, key)
    gen = make_generator(cfg)
    base_vars = {"params": gv["params"], "batch_stats": gv["batch_stats"]}

    def baseline(noise):
        return gen.apply(base_vars, noise, train=False)

    tps, pb = timed(baseline, key)
    print(f"A baseline (BN, f32 weights, f32 out):  {tps:9.1f} tiles/s  ({pb*1e3:.2f} ms/batch)", flush=True)

    module, variables = fold_generator(cfg, gv["params"], gv["batch_stats"], dtype=jnp.bfloat16)

    def folded(noise):
        return module.apply(variables, noise, train=False)

    tps, pb = timed(folded, key)
    print(f"B folded BN, bf16 weights, f32 out:     {tps:9.1f} tiles/s  ({pb*1e3:.2f} ms/batch)", flush=True)

    serve = make_serving_fn(cfg, gv["params"], gv["batch_stats"], weights_dtype=jnp.bfloat16, uint8_output=True)
    tps, pb = timed(serve, key)
    print(f"C  + fused Pallas tanh->uint8 epilogue: {tps:9.1f} tiles/s  ({pb*1e3:.2f} ms/batch)", flush=True)

    serve_q = make_serving_fn(cfg, gv["params"], gv["batch_stats"], uint8_output=True,
                              quantized_full=True)
    tps, pb = timed(serve_q, key)
    print(f"C8 full W8A8 int8 stack + uint8 out:    {tps:9.1f} tiles/s  ({pb*1e3:.2f} ms/batch)", flush=True)

    # ---- resize-conv (dcgan_up) A/B: 3-op pipeline vs fused transposed conv
    from functools import partial as _partial

    from rnagan_tpu.eval.serving import dcgan_up_lax_apply, fuse_up_generator_params

    up_cfg = GANModelConfig(arch="dcgan_up")
    gvu, _ = init_gan(up_cfg, jax.random.fold_in(key, 9))
    up_gen = make_generator(up_cfg)
    up_vars = {"params": gvu["params"], "batch_stats": gvu["batch_stats"]}

    def up_baseline(noise):
        return up_gen.apply(up_vars, noise, train=False)

    tps, pb = timed(up_baseline, key)
    print(f"D dcgan_up 3-op pipeline (BN, f32):     {tps:9.1f} tiles/s  ({pb*1e3:.2f} ms/batch)", flush=True)

    _, up_folded = fold_generator(up_cfg, gvu["params"], gvu["batch_stats"])
    fused_params = fuse_up_generator_params(up_cfg, up_folded["params"])

    tps, pb = timed(_partial(dcgan_up_lax_apply, up_cfg, fused_params, exact_border=False), key)
    print(f"E dcgan_up fused ConvT (no border fix): {tps:9.1f} tiles/s  ({pb*1e3:.2f} ms/batch)", flush=True)

    tps, pb = timed(_partial(dcgan_up_lax_apply, up_cfg, fused_params, exact_border=True), key)
    print(f"F dcgan_up fused ConvT + exact border:  {tps:9.1f} tiles/s  ({pb*1e3:.2f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
