"""Conditioning proof: per-patient representation analysis at corpus scale.

VERDICT r2 item 5: demonstrate the RNA-GAN's *point* — that tiles generated
from a patient's expression profile are closer (in inception feature space)
to THAT patient's real tiles than to other patients' — on the procedural
corpus, end-to-end through the production APIs. This drives
``eval/representation.compute_representations`` (the reference's
``compute_representation.py:149-170`` equivalent) with:

  * real tiles: held-out renders per slide (never seen in training),
  * RNA-GAN tiles: the wganvae best checkpoint conditioned on each patient,
  * GAN tiles: the plain-wgan best checkpoint (unconditional control),

then reports the distance statistics: for each patient, is the RNA-GAN mean
activation closer to its own patient's real mean activation than to other
patients'? (The unconditional GAN is the chance-level control — one shared
distribution, no patient identity.)

Generation runs in BOTH condition modes: 'population' (conditioning-
preserving z-population standardization — the headline) and 'reference'
(the reference's per-batch standardization, which cancels a single
patient's broadcast z exactly; measuring it documents that discovered
property — it should land at chance level, like the unconditional GAN).

Inputs come from a finished quality run (tools/quality_run.py) in --workdir:
``wganvae_best.model``, ``wgan_best.model`` (or _last fallbacks) and
``vae_pretrain.msgpack``.

Usage:
  python tools/representation_run.py --workdir runs/quality \
      --out docs/quality/representations
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

try:  # noqa: E402
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def pick_ckpt(workdir: str, name: str) -> str:
    for suffix in ("best", "last"):
        path = os.path.join(workdir, f"{name}_{suffix}.model")
        if os.path.exists(path):
            return path
    raise FileNotFoundError(f"no {name}_best/_last.model in {workdir} — run tools/quality_run.py first")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="runs/quality",
                   help="quality-run output dir holding the checkpoints + VAE")
    p.add_argument("--slides", type=int, default=200)
    p.add_argument("--tiles_per_slide", type=int, default=600)
    p.add_argument("--genes", type=int, default=19198)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--corpus_seed", type=int, default=0)
    p.add_argument("--patients", type=int, default=50,
                   help="number of corpus slides treated as patients")
    p.add_argument("--tiles_per_patient", type=int, default=64)
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    p.add_argument("--gan_name", default="wgan",
                   help="checkpoint basename of the unconditional control arm")
    p.add_argument("--rna_name", default="wganvae",
                   help="checkpoint basename of the conditional arm (a "
                        "quality_run --tag), e.g. wganvae_proj")
    p.add_argument("--critic", default="unconditional",
                   choices=["unconditional", "projection"],
                   help="critic config the --rna_name checkpoint was trained "
                        "with (its D param tree must match to load)")
    p.add_argument("--out", default="docs/quality/representations")
    p.add_argument("--ceiling_only", action="store_true",
                   help="skip generation; compute the real-vs-real ceiling + the "
                        "z-sensitivity diagnostic and merge them into an existing "
                        "<out>/distance_stats.json")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from quality_run import build_corpus, normalized_expression

    from rnagan_tpu.core.checkpoint import load_bundle
    from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
    from rnagan_tpu.eval.fid import InceptionExtractor
    from rnagan_tpu.eval.generate import generate_images
    from rnagan_tpu.eval.representation import compute_representations
    from rnagan_tpu.train.gan_trainer import GANTrainer

    print(f"[setup] backend: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    corpus = build_corpus(args)
    expr_norm, _ = normalized_expression(corpus)
    print(f"[setup] corpus + normalization {time.time() - t0:.0f}s", flush=True)

    trees, meta = load_bundle(os.path.join(args.workdir, "vae_pretrain.msgpack"))
    vae_vars = trees["vae"]
    vae_cfg = VAEModelConfig(rna_features=args.genes, compute_dtype="bfloat16")
    print(f"[setup] VAE pretrain loaded ({meta})", flush=True)

    rna_cfg = GANConfig(model=GANModelConfig(out_size=args.size, encoding_dims=vae_cfg.z_dim,
                                             critic=args.critic),
                        loss_type="wganvae", vae=vae_cfg)
    gan_cfg = GANConfig(model=GANModelConfig(out_size=args.size), loss_type="wgan")
    rna_trainer = GANTrainer(rna_cfg, vae_variables=vae_vars)
    gan_trainer = GANTrainer(gan_cfg)
    rna_path = pick_ckpt(args.workdir, args.rna_name)
    gan_path = pick_ckpt(args.workdir, args.gan_name)
    rna_state = rna_trainer.load_model(rna_path)
    if not args.ceiling_only:
        gan_state = gan_trainer.load_model(gan_path)
    print(f"[setup] GAN states: {rna_path}, {gan_path}", flush=True)

    patients = [f"slide{i:04d}" for i in range(args.patients)]
    pidx = {name: i for i, name in enumerate(patients)}
    import jax.numpy as jnp

    def _render_heldout(i: int, offset: int, count: int) -> np.ndarray:
        sl = jnp.full((count,), i, jnp.int32)
        # held-out tile indices (never trained on; same range the FID probe uses)
        ti = corpus.tiles_per_slide + (offset + jnp.arange(count, dtype=jnp.int32)) % corpus.HELDOUT_SPAN
        return np.asarray(corpus.render(sl, ti))  # [-1,1]; to_unit_range handles it

    def real_tiles_fn(patient: str) -> np.ndarray:
        return _render_heldout(pidx[patient], 0, args.tiles_per_patient)

    def gene_fn(patient: str) -> np.ndarray:
        return expr_norm[pidx[patient]]

    # conditioning-preserving generation needs z-population statistics over
    # the training expression matrix (losses/rna_infusion.z_population_stats)
    rna_trainer.set_z_population(expr_norm)

    weights = os.environ.get("INCEPTION_WEIGHTS")
    if weights:  # trained-weights parity path (docs/FID_WEIGHTS_RUNBOOK.md)
        from rnagan_tpu.cli.common import load_inception_extractor

        extractor = load_inception_extractor(weights)
        print(f"[features] trained InceptionV3 from {weights}", flush=True)
    else:
        extractor = InceptionExtractor(seed=0, dtype=jnp.float32)
    # distance statistics (eval/representation.distance_statistics: whitened
    # by the real set's per-dim stats — random-init inception features are
    # ~1e-4 scale; one affine map applied to every source keeps distances
    # well-conditioned without changing ranks within a source pair)
    from rnagan_tpu.eval.representation import distance_statistics, mean_activation

    tissue = np.asarray(corpus.slides.tissue)[: args.patients]
    stats_path = os.path.join(args.out, "distance_stats.json")

    if args.ceiling_only:
        with open(stats_path) as f:
            result = json.load(f)  # merge into the existing full run
    else:
        t0 = time.time()
        reps = compute_representations(
            patients, real_tiles_fn, gene_fn,
            rna_trainer, rna_state, gan_trainer, gan_state,
            key=jax.random.key(1234), tiles_per_patient=args.tiles_per_patient,
            extractor=extractor, save_dir=args.out, condition_mode="population")
        print(f"[reps population] {args.patients} patients x 3 sources "
              f"in {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        reps_ref = compute_representations(
            patients, real_tiles_fn, gene_fn,
            rna_trainer, rna_state, gan_trainer, gan_state,
            key=jax.random.key(1234), tiles_per_patient=args.tiles_per_patient,
            extractor=extractor, save_dir=os.path.join(args.out, "reference_mode"),
            condition_mode="reference")
        print(f"[reps reference-mode] in {time.time() - t0:.0f}s", flush=True)

        def stats(fake_reps):
            return distance_statistics(reps["real"], fake_reps, labels=tissue)

        result = {
            "meta": {"patients": args.patients, "tiles_per_patient": args.tiles_per_patient,
                     "rna_ckpt": rna_path, "gan_ckpt": gan_path,
                     "device": str(jax.devices()[0])},
            "rnagan_population": stats(reps["rnagan"]),
            "rnagan_reference_mode": stats(reps_ref["rnagan"]),
            "gan_control": stats(reps["gan"]),
        }

    # ---- real-vs-real ceiling: two DISJOINT held-out halves per patient.
    # This is the upper bound any generator could reach under this feature
    # space + tile count: if half-B of a patient's own real tiles cannot be
    # matched to half-A, no fake set can be expected to either. Halves use
    # tiles_per_patient//2 tiles each, so the ceiling is measured at slightly
    # HIGHER per-rep noise than the fake rows (which average the full count).
    half = max(args.tiles_per_patient // 2, 1)
    t0 = time.time()
    real_a = np.stack([mean_activation(
        (_render_heldout(i, 0, half) + 1.0) / 2.0, extractor) for i in range(args.patients)])
    real_b = np.stack([mean_activation(
        (_render_heldout(i, half, half) + 1.0) / 2.0, extractor) for i in range(args.patients)])
    ceiling = distance_statistics(real_a, real_b, labels=tissue)
    print(f"[ceiling] real-vs-real (disjoint halves of {half}) in {time.time() - t0:.0f}s",
          flush=True)
    result["real_vs_real_ceiling"] = ceiling

    # ---- z-sensitivity: does the trained generator's output actually move
    # with the conditioning input? Pixel-space, no feature extractor in the
    # way. Same key => identical uniform noise draws, so the cross-patient
    # delta isolates the z effect; the same-patient/different-key delta is
    # the scale of ordinary noise-driven variation to compare against.
    # (The WGAN critic is UNCONDITIONAL — nothing in training aligns the
    # z->morphology map with the TRUE patient morphology, so output
    # sensitivity to z is necessary but not sufficient for identity.)
    t0 = time.time()
    zkey = jax.random.key(77)
    n_zp, n_zt = min(8, args.patients), 16
    per_patient = [generate_images(rna_trainer, rna_state, n_zt, zkey,
                                   gene=gene_fn(patients[i]), condition_mode="population")
                   for i in range(n_zp)]
    cross = [float(np.mean(np.abs(per_patient[i] - per_patient[j])))
             for i in range(n_zp) for j in range(i + 1, n_zp)]
    rerun = generate_images(rna_trainer, rna_state, n_zt, jax.random.fold_in(zkey, 1),
                            gene=gene_fn(patients[0]), condition_mode="population")
    noise_delta = float(np.mean(np.abs(per_patient[0] - rerun)))
    result["z_sensitivity"] = {
        "cross_patient_pixel_delta_same_noise": round(float(np.mean(cross)), 5),
        "same_patient_pixel_delta_fresh_noise": round(noise_delta, 5),
        "ratio": round(float(np.mean(cross)) / max(noise_delta, 1e-12), 4),
        "patients": n_zp, "tiles": n_zt,
    }
    print(f"[z-sensitivity] in {time.time() - t0:.0f}s", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(stats_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()
