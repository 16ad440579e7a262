"""Serving-path A/B benchmark on the real chip (chained-scan differential
timing — see bench.py for why naive timing lies on this backend).

Compares at full production size (256x256, z=2048, step 64, batch 64):
  A.  baseline eval-mode generator (BN + f32 params + float output)
  B.  BN-folded, bf16-weight generator (float output)
  C.  B + fused Pallas tanh->uint8 epilogue
  C8. full W8A8 int8 conv stack + uint8 epilogue
  D-F. resize-conv (dcgan_up): 3-op pipeline vs fused ConvT (+ border fix)

All variants thread their parameters as jit ARGUMENTS — closing over them
inlines the weight tree as HLO constants inside the timing scan, and this
backend's remote compiler rejects >~100 MB program bodies (HTTP 413).
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


def timed(apply_fn, params, key):
    """apply_fn(params, noise) -> images; params ride as a jit argument."""

    @partial(jax.jit, static_argnums=(2,))
    def run(params, key, n):
        def body(carry, i):
            noise = jax.random.normal(jax.random.fold_in(key, i), (BATCH, 2048)) + carry * 1e-6
            img = apply_fn(params, noise)
            return jnp.mean(img.astype(jnp.float32)), None

        carry, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return carry

    out = {}
    for n in (N_SHORT, N_LONG):
        float(run(params, key, n))  # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(run(params, key, n))
            best = min(best, time.perf_counter() - t0)
        out[n] = best
    per_batch = (out[N_LONG] - out[N_SHORT]) / (N_LONG - N_SHORT)
    return BATCH / per_batch, per_batch


def report(label, tps, pb):
    print(f"{label} {tps:9.1f} tiles/s  ({pb * 1e3:.2f} ms/batch)", flush=True)


def main():
    from rnagan_tpu.core.config import GANModelConfig
    from rnagan_tpu.eval.serving import (dcgan_int8_apply, dcgan_lax_apply,
                                         dcgan_up_lax_apply, fold_generator,
                                         fuse_up_generator_params,
                                         quantize_generator_params)
    from rnagan_tpu.models.dcgan import init_gan, make_generator
    from rnagan_tpu.ops.quantize import pallas_tanh_to_uint8

    cfg = GANModelConfig()
    key = jax.random.key(0)
    gv, _ = init_gan(cfg, key)
    gen = make_generator(cfg)
    base_vars = {"params": gv["params"], "batch_stats": gv["batch_stats"]}

    report("A baseline (BN, f32 weights, f32 out): ",
           *timed(lambda v, z: gen.apply(v, z, train=False), base_vars, key))

    module, variables = fold_generator(cfg, gv["params"], gv["batch_stats"], dtype=jnp.bfloat16)
    report("B folded BN, bf16 weights, f32 out:    ",
           *timed(lambda p, z: dcgan_lax_apply(cfg, p, z), variables["params"], key))

    report("C  + fused Pallas tanh->uint8 epilogue:",
           *timed(lambda p, z: pallas_tanh_to_uint8(
               dcgan_lax_apply(cfg, p, z, final_tanh=False), apply_tanh=True),
               variables["params"], key))

    _, var_f32 = fold_generator(cfg, gv["params"], gv["batch_stats"])
    qparams = quantize_generator_params(cfg, var_f32["params"])
    report("C8 full W8A8 int8 stack + uint8 out:   ",
           *timed(lambda p, z: pallas_tanh_to_uint8(
               dcgan_int8_apply(cfg, p, z, final_tanh=False), apply_tanh=True),
               qparams, key))

    # ---- resize-conv (dcgan_up): 3-op pipeline vs fused transposed conv
    up_cfg = GANModelConfig(arch="dcgan_up")
    gvu, _ = init_gan(up_cfg, jax.random.fold_in(key, 9))
    up_gen = make_generator(up_cfg)
    up_vars = {"params": gvu["params"], "batch_stats": gvu["batch_stats"]}

    report("D dcgan_up 3-op pipeline (BN, f32):    ",
           *timed(lambda v, z: up_gen.apply(v, z, train=False), up_vars, key))

    _, up_folded = fold_generator(up_cfg, gvu["params"], gvu["batch_stats"])
    fused_params = fuse_up_generator_params(up_cfg, up_folded["params"])

    report("E dcgan_up fused ConvT (no border fix):",
           *timed(lambda p, z: dcgan_up_lax_apply(up_cfg, p, z, exact_border=False),
                  fused_params, key))
    # exact-border threshold sweep: maps with H <= small_exact run the whole
    # two-op reference path (strip fix-up costs ~8/H of the block — ruinous at
    # small maps, negligible at large ones)
    for thr in (0, 8, 16, 32):
        report(f"F dcgan_up fused + exact border (T={thr:2d}):",
               *timed(partial(lambda thr, p, z: dcgan_up_lax_apply(
                   up_cfg, p, z, exact_border=True, small_exact=thr), thr),
                   fused_params, key))


if __name__ == "__main__":
    main()
