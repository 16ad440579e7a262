"""MFU lever sweep for the wganvae training step (VERDICT r2 item 2).

Round-3 levers, both EXACT (no training-dynamics change, tests in
tests/test_gan_trainer.py / tests/test_dcgan_models.py):

  * ``fused_critic_batch``: D(real) and D(fake) as ONE 2B-batch dispatch in
    the critic loss, with closed-form recomposition of the sequential
    batchnorm running-stats update (train/gan_trainer.py).
  * ``convt_impl='d2s'``: the generator's stride-2 4x4 ConvTranspose as a
    phase-decomposed stride-1 conv + depth-to-space (models/dcgan.py) —
    same math and parameter tree, but skips XLA's lhs_dilation lowering,
    which zero-stuffs the input and burns MXU cycles multiplying zeros.

For each (batch, levers) combo this measures the full D+GP+G step with the
chained-scan differencing method (see bench.py: naive wall-clock timing lies
on this tunneled backend) and reports:

  * step_ms and tiles/s,
  * own-program flops (XLA cost analysis of the compiled step) and the MFU
    against the chip's peak bf16 matmul rate,
  * effective_mfu: baseline-program flops / time — the honest "how much
    faster is the same algorithm" number (a lever that REMOVES wasted flops
    lowers its own-program flops, so own-MFU understates the win).

Usage:
  python tools/mfu_sweep.py --batches 8 64 --out docs/perf_sweep.json
"""

from __future__ import annotations

import argparse
import json
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

N_SHORT, N_LONG = 2, 12
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "TPU v5p": 459e12}

COMBOS = [
    ("baseline", dict(fused_critic_batch=False, convt_impl="xla")),
    ("fused_critic", dict(fused_critic_batch=True, convt_impl="xla")),
    ("d2s", dict(fused_critic_batch=False, convt_impl="d2s")),
    ("fused+d2s", dict(fused_critic_batch=True, convt_impl="d2s")),
]


def measure(batch: int, fused_critic_batch: bool, convt_impl: str, vae_cfg, vae_vars):
    from rnagan_tpu.core.config import GANConfig, GANModelConfig
    from rnagan_tpu.train.gan_trainer import GANTrainer

    cfg = GANConfig(
        model=GANModelConfig(convt_impl=convt_impl),
        loss_type="wganvae", batch_size=batch, vae=vae_cfg,
        fused_critic_batch=fused_critic_batch)
    trainer = GANTrainer(cfg, vae_variables=vae_vars)
    state = trainer.init_state()
    rng = np.random.RandomState(0)
    bd = {
        "image": jnp.asarray(rng.rand(batch, 256, 256, 3).astype(np.float32) * 2 - 1),
        "rna_data": jnp.asarray(rng.randn(batch, vae_cfg.rna_features).astype(np.float32)),
    }
    step_impl = trainer._train_step_impl

    compiled = jax.jit(step_impl).lower(state, bd, trainer.vae_variables).compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        step_flops = float(ca.get("flops", 0.0))
    except Exception:
        step_flops = 0.0

    @partial(jax.jit, static_argnums=(1,))
    def chain(state, n, vv, bd):
        def body(s, _):
            s2, m = step_impl(s, bd, vv)
            return s2, m["d_loss"]

        s, losses = jax.lax.scan(body, state, None, length=n)
        return losses[-1]

    def timed(n):
        float(chain(state, n, trainer.vae_variables, bd))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(state, n, trainer.vae_variables, bd))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short, t_long = timed(N_SHORT), timed(N_LONG)
    if t_long <= t_short:
        t_short, t_long = timed(N_SHORT), timed(N_LONG)
    if t_long <= t_short:
        return None
    step_s = (t_long - t_short) / (N_LONG - N_SHORT)
    return {"step_ms": step_s * 1e3, "flops": step_flops}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[8, 64])
    p.add_argument("--combos", nargs="+", default=None,
                   help="subset of combo names to run (default: all)")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    combos = COMBOS if args.combos is None else [c for c in COMBOS if c[0] in args.combos]

    from rnagan_tpu.core.config import VAEModelConfig
    from rnagan_tpu.models.betavae import init_betavae

    dev = jax.devices()[0]
    peak = next((v for k, v in PEAK_FLOPS.items() if k in dev.device_kind), None)
    print(f"[setup] {dev} peak={peak and peak / 1e12:.0f} TFLOP/s bf16", flush=True)
    vae_cfg = VAEModelConfig(compute_dtype="bfloat16")
    vae_vars = init_betavae(vae_cfg, jax.random.key(0))

    results = {"device": str(dev), "peak_flops": peak, "rows": []}
    for batch in args.batches:
        base_flops = None
        for name, levers in combos:
            t0 = time.time()
            r = measure(batch, vae_cfg=vae_cfg, vae_vars=vae_vars, **levers)
            if r is None:
                print(f"[b{batch}] {name}: NOISY, skipped", flush=True)
                continue
            if name == "baseline":
                base_flops = r["flops"]
            row = {"batch": batch, "name": name, **levers,
                   "step_ms": round(r["step_ms"], 2),
                   "tiles_per_s": round(batch / r["step_ms"] * 1e3, 1),
                   "gflops": round(r["flops"] / 1e9, 1)}
            if peak and r["flops"]:
                row["mfu"] = round(r["flops"] / (r["step_ms"] / 1e3) / peak, 4)
            if peak and base_flops:
                row["effective_mfu"] = round(base_flops / (r["step_ms"] / 1e3) / peak, 4)
            results["rows"].append(row)
            print(f"[b{batch}] {name}: {row['step_ms']} ms, "
                  f"mfu={row.get('mfu')}, eff_mfu={row.get('effective_mfu')} "
                  f"({time.time() - t0:.0f}s incl. compile)", flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[done] {args.out}", flush=True)


if __name__ == "__main__":
    main()
