"""Adam-at-the-roofline A/B (VERDICT r3 item 5): Pallas fused kernel vs
XLA's optax fusion, on the real parameter tree's sizes.

The stage profile puts the G+D Adam updates at ~5.5 ms/step for 156.5M
params — 7 f32 passes (read p,g,mu,nu; write p,mu,nu) = 4.38 GB, i.e.
~795 GB/s, which IS the v5e HBM roofline. This bench settles whether XLA's
per-leaf fusions actually run at the roofline (then the floor is physically
irreducible and ops/fused_adam.py is the proof), or leave gaps a single
flat-slab Pallas kernel recovers.

Three variants, identical math (tests/test_ops.py::test_fused_adam_matches_optax):
  tree   - optax.adam over the REAL GAN param tree's leaf shapes (what the
           trainer runs: ~60 leaves from 3 elements to 67M)
  flat   - optax.adam over one flat f32 buffer of the same total size
           (isolates per-leaf launch/fusion overhead from bandwidth)
  pallas - ops/fused_adam.adam_update_flat on the same flat buffer

Timing: chained lax.scan with a data-dependent carry (g is re-derived from
p each iteration), differencing two chain lengths — same method as bench.py
(naive timing lies ~10x on this tunneled async backend).

Usage: python tools/adam_bench.py [--out docs/perf/adam_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

LR, B1, B2, EPS = 1e-4, 0.5, 0.999, 1e-8
N_SHORT, N_LONG = 2, 12


def real_leaf_shapes():
    """Leaf shapes of the production G+D param trees (out_size 256), via
    eval_shape — no device compute."""
    from rnagan_tpu.core.config import GANModelConfig
    from rnagan_tpu.models.dcgan import init_gan

    cfg = GANModelConfig()  # production: out_size 256, z 2048, step 64
    gv, dv = jax.eval_shape(lambda k: init_gan(cfg, k), jax.random.key(0))
    leaves = (jax.tree_util.tree_leaves(gv["params"])
              + jax.tree_util.tree_leaves(dv["params"]))
    return [l.shape for l in leaves]


def timed(step_fn, carry0):
    """Differenced chained-scan timing; carry threads (p, mu, nu, t)."""

    def chain(carry, n):
        def body(c, _):
            return step_fn(c), None

        c, _ = jax.lax.scan(body, carry, None, length=n)
        return c

    fns = {n: jax.jit(lambda c, n=n: chain(c, n)) for n in (N_SHORT, N_LONG)}

    def probe(c):  # tiny scalar fetch blocks on the whole chain
        leaves = jax.tree_util.tree_leaves(c)
        return float(jnp.sum(leaves[0].reshape(-1)[:1]))

    for n in (N_SHORT, N_LONG):
        probe(fns[n](carry0))  # compile + warm
    ts = {}
    for n in (N_SHORT, N_LONG):
        reps = []
        for _ in range(3):
            t0 = time.time()
            probe(fns[n](carry0))
            reps.append(time.time() - t0)
        ts[n] = min(reps)
    return (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/perf/adam_bench.json")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU run (pallas in interpret mode): validates "
                        "the tool end-to-end without a chip; timings bogus")
    args = p.parse_args()

    import optax

    from rnagan_tpu.ops.fused_adam import adam_update_flat

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        import contextlib

        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        _run(args, optax, adam_update_flat)


def _run(args, optax, adam_update_flat):
    shapes = [(64, 32), (3, 3, 8, 16), (2048, 257)] if args.smoke else real_leaf_shapes()
    n_total = int(sum(np.prod(s) for s in shapes))
    gb_per_step = 7 * 4 * n_total / 1e9
    dev = jax.devices()[0]
    print(f"[setup] {dev}; {len(shapes)} leaves, {n_total / 1e6:.1f}M params, "
          f"{gb_per_step:.2f} GB/step at 7 f32 passes", flush=True)

    tx = optax.adam(LR, b1=B1, b2=B2, eps=EPS)
    results = {"meta": {"device": str(dev), "n_params": n_total,
                        "n_leaves": len(shapes), "gb_per_step": round(gb_per_step, 3),
                        "passes": "read p,g,mu,nu; write p,mu,nu"}}

    # ---- tree variant: the real leaf-shape distribution
    key = jax.random.key(0)
    tree_p = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32) * 0.02
              for i, s in enumerate(shapes)]
    tree_state = tx.init(tree_p)

    def tree_step(carry):
        p, st = carry
        g = jax.tree_util.tree_map(lambda x: x * 1e-9, p)  # data-dependent
        upd, st = tx.update(g, st, p)
        return optax.apply_updates(p, upd), st

    s = timed(tree_step, (tree_p, tree_state))
    results["optax_tree"] = {"ms": round(s * 1e3, 3), "gb_s": round(gb_per_step / s, 1)}
    print(f"[optax tree ] {s * 1e3:7.2f} ms  {gb_per_step / s:6.1f} GB/s", flush=True)

    # ---- flat variants share one buffer set
    del tree_p, tree_state
    flat_p = jax.random.normal(key, (n_total,), jnp.float32) * 0.02
    flat_state = tx.init(flat_p)

    def flat_step(carry):
        p, st = carry
        upd, st = tx.update(p * 1e-9, st, p)
        return optax.apply_updates(p, upd), st

    s = timed(flat_step, (flat_p, flat_state))
    results["optax_flat"] = {"ms": round(s * 1e3, 3), "gb_s": round(gb_per_step / s, 1)}
    print(f"[optax flat ] {s * 1e3:7.2f} ms  {gb_per_step / s:6.1f} GB/s", flush=True)

    def pallas_step(carry):
        p, mu, nu, t = carry
        p, mu, nu = adam_update_flat(p, p * 1e-9, mu, nu, t,
                                     lr=LR, b1=B1, b2=B2, eps=EPS)
        return p, mu, nu, t + 1

    zeros = jnp.zeros_like(flat_p)
    s = timed(pallas_step, (flat_p, zeros, zeros, jnp.asarray(0, jnp.int32)))
    results["pallas_flat"] = {"ms": round(s * 1e3, 3), "gb_s": round(gb_per_step / s, 1)}
    print(f"[pallas flat] {s * 1e3:7.2f} ms  {gb_per_step / s:6.1f} GB/s", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[done] {args.out}", flush=True)


if __name__ == "__main__":
    main()
