"""Root-cause the BigGAN TPU-worker crash (VERDICT r4 missing #2).

``tools/quality_run.py --arch biggan`` killed the TPU worker twice
(``docs/perf/logs/ab_biggan.log``: ``UNAVAILABLE: TPU worker process crashed
or restarted``) on the FIRST execution of the scanned epoch program, while
the same settings train fine for dcgan and sagan. Reproducible twice =>
not infra flake. Hypothesis: HBM exhaustion — BigGAN-256 is ~16x wider than
the DCGAN taper at low resolutions (1024-channel residual blocks,
``models/biggan.py:171``) and the WGAN-GP double-backward holds the full
activation chain of D(interpolates) at batch 32 / 256x256; when an XLA:TPU
program's allocations exceed device HBM the runtime can take the worker
down instead of raising RESOURCE_EXHAUSTED (the tunnel then reports the
generic kernel-fault UNAVAILABLE).

This tool proves or refutes that WITHOUT touching the chip's execution
stream: it AOT-lowers and compiles the exact train-step program
(``jit(...).lower(...).compile()`` — remote compilation is a separate
service on this backend) and prints ``compiled.memory_analysis()`` for a
grid of (arch, batch, remat) cells. If biggan-b32 needs more than the
~16 GB HBM of a v5e chip and sagan/dcgan do not, the crash is explained,
and the smallest batch (or remat variant) that fits is the workaround.

Usage:
  python tools/biggan_rootcause.py --out docs/perf/biggan_rootcause.json
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

try:  # noqa: E402 — cache config must precede first compile
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

GIB = float(1 << 30)


def analyze(arch: str, batch: int, size: int, remat: bool) -> dict:
    """AOT-compile one wgan train step (the quality_run config: no clip,
    unconditional, n_critic=1) and return its device-memory breakdown."""
    from rnagan_tpu.core.config import GANConfig, GANModelConfig
    from rnagan_tpu.train.gan_trainer import GANTrainer

    model = GANModelConfig(out_size=size, arch=arch, encoding_dims=2048,
                           remat=remat)
    cfg = GANConfig(model=model, loss_type="wgan", batch_size=batch, clip=None)
    trainer = GANTrainer(cfg)
    state = jax.eval_shape(trainer.init_state)
    batch_dict = {
        "image": jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32),
        "rng": jax.ShapeDtypeStruct((), jax.random.key(0).dtype),
    }
    t0 = time.time()
    lowered = jax.jit(trainer._train_step_impl, donate_argnums=(0,)).lower(
        state, batch_dict, None)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    row = {
        "arch": arch, "batch": batch, "size": size, "remat": remat,
        "compile_s": round(time.time() - t0, 1),
        "argument_gib": round(mem.argument_size_in_bytes / GIB, 3),
        "output_gib": round(mem.output_size_in_bytes / GIB, 3),
        "temp_gib": round(mem.temp_size_in_bytes / GIB, 3),
        # donation aliases state in/out, so peak ~= max(arg, out) + temp
        "peak_gib": round((max(mem.argument_size_in_bytes,
                               mem.output_size_in_bytes)
                           + mem.temp_size_in_bytes) / GIB, 3),
    }
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--hbm_gib", type=float, default=16.0,
                   help="per-chip HBM budget used for the fits/oom verdict")
    p.add_argument("--out", default="docs/perf/biggan_rootcause.json")
    p.add_argument("--cells", default=None,
                   help="comma list of arch:batch[:remat] cells; default grid")
    args = p.parse_args()

    print(f"[setup] backend: {jax.devices()[0]}", flush=True)
    if args.cells:
        cells = []
        for c in args.cells.split(","):
            parts = c.split(":")
            cells.append((parts[0], int(parts[1]),
                          len(parts) > 2 and parts[2] == "remat"))
    else:
        cells = [
            ("dcgan", 32, False),   # control: known-good
            ("sagan", 32, False),   # control: known-good (trained 10 epochs)
            ("biggan", 32, False),  # the crashing cell
            ("biggan", 16, False),
            ("biggan", 8, False),
            ("biggan", 32, True),   # remat workaround at the original batch
        ]
    rows = []
    for arch, batch, remat in cells:
        try:
            row = analyze(arch, batch, args.size, remat)
        except Exception as e:  # compile-time failure is itself a finding
            row = {"arch": arch, "batch": batch, "size": args.size,
                   "remat": remat, "error": f"{type(e).__name__}: {e}"[:500]}
        if "peak_gib" in row:
            row["fits_hbm"] = row["peak_gib"] <= args.hbm_gib
        print(f"[cell] {row}", flush=True)
        rows.append(row)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"hbm_gib": args.hbm_gib,
                       "device": str(jax.devices()[0]), "cells": rows}, f,
                      indent=1)
    print(f"[done] {args.out}", flush=True)


if __name__ == "__main__":
    main()
