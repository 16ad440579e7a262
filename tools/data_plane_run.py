"""Production data-plane proof: train wganvae through the LMDB store path.

VERDICT r2 item 3: the quality runs render tiles on device; the path the
reference actually exercises per step — store decode -> host batch -> device
(``read_data.py:248-253``, ``histopathology_gan.py:163-168``) — had never fed
a training run beyond smoke scale. This drives exactly that path at reference
scale against the corpus from tools/make_lmdb_corpus.py:

  store (lz4+LMDB, native bulk decode) -> StreamingPatchBatches (uint8,
  background Prefetcher) -> device_put -> jitted wganvae step (on-device
  [-1,1] normalization)

and reports, separately:
  * host-pipeline-only throughput (decode+batch, no device),
  * device-only step time (resident batch, no host pipeline),
  * the overlapped end-to-end step time and its inflation vs device-only,
  * host->device transfer time for uint8 vs float32 batches (why uint8
    ingest is the production default: 4x less tunnel/PCIe traffic).

Usage:
  python tools/data_plane_run.py --corpus runs/corpus --epochs 2 --batch 32 \
      --out docs/quality/data_plane.json
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


def pretrain_vae(expr_norm: np.ndarray, epochs: int):
    """Short on-device beta-VAE pretrain on the corpus expression (same
    resident-matrix scan as tools/quality_run.train_vae)."""
    from functools import partial

    from rnagan_tpu.core.config import VAEConfig, VAEModelConfig
    from rnagan_tpu.train.vae_trainer import VAETrainer

    model_cfg = VAEModelConfig(rna_features=expr_norm.shape[1], compute_dtype="bfloat16")
    trainer = VAETrainer(VAEConfig(model=model_cfg, num_epochs=epochs, batch_size=64))
    train_dev = jnp.asarray(expr_norm)
    batch = min(64, len(expr_norm))
    steps_per_epoch = max(len(expr_norm) // batch, 1)
    ones = jnp.ones((batch,), jnp.float32)

    @partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def run(state, key, n_steps):
        def body(st, i):
            idx = jax.random.randint(jax.random.fold_in(key, i), (batch,), 0, train_dev.shape[0])
            st, losses = trainer._train_step_impl(st, train_dev[idx], ones)
            return st, losses["total_loss"]

        state, tl = jax.lax.scan(body, state, jnp.arange(n_steps))
        return state, jnp.mean(tl)

    state = trainer.init_state()
    state, tl = run(state, jax.random.key(11), epochs * steps_per_epoch)
    print(f"[vae] {epochs} epochs, final train loss {float(tl):.4f}", flush=True)
    return {"params": state.params, "batch_stats": state.batch_stats}, model_cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default="runs/corpus")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--max_patches_total", type=int, default=600)
    p.add_argument("--vae_epochs", type=int, default=40)
    p.add_argument("--loss_type", default="wganvae", choices=["wganvae", "wgan"])
    p.add_argument("--host_probe_batches", type=int, default=150,
                   help="batches for the host-pipeline-only throughput probe")
    p.add_argument("--resident_steps", type=int, default=60,
                   help="steps for the device-only (resident batch) baseline")
    p.add_argument("--limit_slides", type=int, default=None,
                   help="use only the first N corpus slides (smoke runs)")
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    p.add_argument("--prewarm", action="store_true",
                   help="sequentially fault the corpus into page cache before "
                        "the probes (random cold reads are disk-seek-bound)")
    p.add_argument("--probe_only", action="store_true",
                   help="host-pipeline probe only (no device work), then exit "
                        "— for measuring warm-vs-cold host throughput")
    p.add_argument("--overlap_ab", type=int, default=0, metavar="STEPS",
                   help="bounded A/B of the transfer-overlap modes (no hook / "
                        "async device_put in the prefetch thread / blocking "
                        "device_put), interleaved x2 in ONE process so tunnel "
                        "bandwidth drift between runs cannot masquerade as a "
                        "mode effect")
    p.add_argument("--slides", type=int, default=200,
                   help="corpus scale used when the corpus must be (re)built")
    p.add_argument("--tiles_per_slide", type=int, default=600)
    p.add_argument("--out", default="docs/quality/data_plane.json")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    elif args.probe_only:
        # the host probe never executes device work — stay off the chip
        jax.config.update("jax_platforms", "cpu")

    # the corpus lives in gitignored scratch: a wiped workdir must not take the
    # measurement down (round-3 overlap A/B died on exactly this; same survival
    # rule as tools/ml_experiment_run.py). Rebuild is deterministic in the seed
    # and resumable per slide; subprocess because make_lmdb_corpus pins the
    # whole importing process to the CPU platform.
    if not os.path.exists(os.path.join(args.corpus, "expression.csv")):
        import subprocess
        print(f"[setup] corpus missing at {args.corpus}; rebuilding "
              f"({args.slides}x{args.tiles_per_slide}, host CPU)", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                          "make_lmdb_corpus.py"),
             "--out", args.corpus, "--slides", str(args.slides),
             "--tiles_per_slide", str(args.tiles_per_slide)],
            check=True)

    import pandas as pd

    from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
    from rnagan_tpu.data.patches import StreamingPatchBatches
    from rnagan_tpu.data.rna import Scaler, log_transform, rna_columns
    from rnagan_tpu.train.gan_trainer import GANTrainer

    print(f"[setup] backend: {jax.devices()[0]}", flush=True)
    df = pd.read_csv(os.path.join(args.corpus, "expression.csv"))
    if args.limit_slides:
        df = df.iloc[: args.limit_slides].reset_index(drop=True)
    df["patch_data_path"] = args.corpus
    cols = rna_columns(df)

    # normalize expression exactly like the training-data path
    # (reference read_data.py:467-495)
    logged = log_transform(df[cols].values.astype(np.float32))
    scaler = Scaler.fit(logged, "standard")
    df[cols] = scaler.transform(logged).astype(np.float32)

    with_rna = args.loss_type == "wganvae"
    vae_vars, vae_cfg = (None, VAEModelConfig(rna_features=len(cols)))
    if with_rna and not args.probe_only:
        vae_vars, vae_cfg = pretrain_vae(df[cols].values.astype(np.float32), args.vae_epochs)

    t0 = time.time()
    batches = StreamingPatchBatches(
        df, batch_size=args.batch, max_patches_total=args.max_patches_total,
        with_rna=with_rna, emit_uint8=True, prefetch_depth=4,
        prewarm=args.prewarm)
    n_tiles = len(batches) * args.batch
    build_s = time.time() - t0
    print(f"[setup] streaming index: {n_tiles} tiles, {len(batches)} batches/epoch "
          f"({build_s:.1f}s)", flush=True)
    if args.prewarm:
        t0 = time.time()
        batches.wait_prewarm()
        print(f"[setup] corpus prewarm: {time.time() - t0:.1f}s", flush=True)

    # ---- host-pipeline-only probe (decode + batch assembly, no device)
    t0 = time.time()
    n = 0
    it = iter(batches.epoch(999))
    for batch in it:
        n += 1
        if n >= args.host_probe_batches:
            break
    host_s_per_batch = (time.time() - t0) / n
    host_tiles_s = args.batch / host_s_per_batch
    print(f"[host] pipeline-only: {host_tiles_s:.0f} tiles/s "
          f"({host_s_per_batch * 1e3:.1f} ms/batch of {args.batch})", flush=True)
    if args.probe_only:
        batches.close()
        return

    # ---- trainer
    cfg = GANConfig(model=GANModelConfig(), loss_type=args.loss_type,
                    batch_size=args.batch, vae=vae_cfg)
    trainer = GANTrainer(cfg, vae_variables=vae_vars)
    state = trainer.init_state()

    # ---- host->device transfer probe: uint8 vs float32 batch
    sample = next(iter(batches.epoch(998)))
    xfer = {}
    for name, arr in (("uint8", sample["image"]),
                      ("float32", sample["image"].astype(np.float32) / 127.5 - 1.0)):
        jax.block_until_ready(jax.device_put(arr))  # warm
        t0 = time.time()
        for _ in range(4):
            jax.block_until_ready(jax.device_put(arr))
        xfer[name] = (time.time() - t0) / 4
    print(f"[xfer] device_put per batch: uint8 {xfer['uint8'] * 1e3:.1f} ms, "
          f"float32 {xfer['float32'] * 1e3:.1f} ms", flush=True)

    # overlap host->device transfer with device compute: the Prefetcher
    # thread device_puts batch N+1 while the chip runs batch N (on tunneled
    # backends the transfer RPC can dominate the step, so this converts
    # transfer+compute into max(transfer, compute))
    batches.transfer = jax.device_put

    # ---- device-only baseline: resident batch, same jitted step
    resident = {k: jnp.asarray(v) for k, v in sample.items()}
    state, _ = trainer._train_step(state, resident, trainer.vae_variables)  # compile
    jax.block_until_ready(state.g_params)
    t0 = time.time()
    for _ in range(args.resident_steps):
        state, m = trainer._train_step(state, resident, trainer.vae_variables)
    jax.block_until_ready(m["d_loss"])
    resident_ms = (time.time() - t0) / args.resident_steps * 1e3
    print(f"[device] resident-batch step: {resident_ms:.1f} ms", flush=True)

    # ---- optional bounded overlap A/B (one process, interleaved reps)
    overlap_ab = {}
    if args.overlap_ab:
        modes = {
            "none": None,
            "async_put": jax.device_put,
            "blocking_put": lambda x: jax.block_until_ready(jax.device_put(x)),
        }
        ab = {k: [] for k in modes}
        for rep in range(2):
            for mname, hook in modes.items():
                batches.transfer = hook
                it = iter(batches.epoch(100 + rep))
                state, m = trainer._train_step(state, next(it), trainer.vae_variables)
                jax.block_until_ready(m["d_loss"])
                t0 = time.time()
                n = 0
                for b in it:
                    state, m = trainer._train_step(state, b, trainer.vae_variables)
                    n += 1
                    if n >= args.overlap_ab:
                        break
                jax.block_until_ready(m["d_loss"])
                ab[mname].append((time.time() - t0) / max(n, 1) * 1e3)
                print(f"[overlap-ab rep{rep}] {mname}: {ab[mname][-1]:.1f} ms/step",
                      flush=True)
        overlap_ab = {k: [round(v, 1) for v in vs] for k, vs in ab.items()}
        batches.transfer = jax.device_put

    # ---- end-to-end: epochs through the streaming pipeline
    epochs = []
    for epoch in range(args.epochs):
        t0 = time.time()
        count = 0
        for batch in batches.epoch(epoch):
            state, m = trainer._train_step(state, batch, trainer.vae_variables)
            count += 1
        jax.block_until_ready(m["d_loss"])
        dt = time.time() - t0
        rec = {"epoch": epoch, "steps": count, "wall_s": round(dt, 2),
               "step_ms": round(dt / count * 1e3, 2),
               "tiles_per_s": round(count * args.batch / dt, 1),
               "d_loss": float(m["d_loss"]), "g_loss": float(m["g_loss"])}
        epochs.append(rec)
        print(f"[epoch {epoch}] " + " ".join(f"{k}={v}" for k, v in rec.items()), flush=True)

    e2e_ms = epochs[-1]["step_ms"] if epochs else None
    result = {
        "meta": {"corpus": args.corpus, "slides": len(df), "tiles": n_tiles,
                 "batch": args.batch, "loss_type": args.loss_type,
                 "device": str(jax.devices()[0]),
                 "host_cores": os.cpu_count()},
        "host_pipeline_tiles_per_s": round(host_tiles_s, 1),
        "host_ms_per_batch": round(host_s_per_batch * 1e3, 2),
        "device_put_ms": {k: round(v * 1e3, 2) for k, v in xfer.items()},
        "resident_step_ms": round(resident_ms, 2),
        "e2e_step_ms": e2e_ms,
        "inflation_vs_resident": round(e2e_ms / resident_ms, 3) if e2e_ms else None,
        "epochs": epochs,
    }
    if overlap_ab:
        result["overlap_ab_ms"] = overlap_ab
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[done] {args.out}", flush=True)
    batches.close()


if __name__ == "__main__":
    main()
