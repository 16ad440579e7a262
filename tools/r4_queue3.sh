#!/bin/bash
# Round-4 TPU queue part 3 — replaces the tail of r4_queue.sh + r4_queue2.sh
# after the s0 pair landed. Changes vs the original tail: curve-only quality
# runs use --no_ckpt (each .model save is ~2.7 GB over a ~7 MB/s tunnel and
# was dominating run wall time), and the Pallas Adam A/B runs early so the
# PERF story completes even if the round ends mid-queue.
set -u
cd /root/repo
PLOG=docs/perf/logs
ALOG=docs/quality/ab
mkdir -p "$PLOG" "$ALOG"
log() { echo "[r4q3 $(date +%H:%M:%S)] $*" | tee -a "$PLOG/queue.log"; }

AB="--slides 100 --tiles_per_slide 300 --epochs 30 --batch 32 --workdir runs/q_ab"

# --- 1. downstream ML experiment (VERDICT missing #1)
log "ml_experiment"
timeout 7200 python tools/ml_experiment_run.py --workdir runs/q_ab \
    --slides 100 --tiles_per_slide 300 --tiles_per_slide_cls 50 \
    --test_tiles_per_slide 10 --epochs 40 \
    --out docs/quality/ml_experiment.json > "$PLOG/ml_experiment.log" 2>&1

# --- 2. Adam roofline A/B (short; completes the PERF.md claim)
log "adam_bench"
timeout 2400 python tools/adam_bench.py --out docs/perf/adam_bench.json \
    > "$PLOG/adam_bench.log" 2>&1

# --- 3. remaining A/B seeds (curve-only, no checkpoints)
for s in 1 2; do
  log "A/B wganvae seed$s"
  timeout 3600 python tools/quality_run.py $AB --loss_type wganvae --seed $s \
      --tag wganvae_s$s --no_ckpt \
      --out "$ALOG/wganvae_s$s.json" > "$PLOG/ab_wganvae_s$s.log" 2>&1
  log "A/B wgan(no-clip) seed$s"
  timeout 3600 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed $s \
      --tag wgan_s$s --no_ckpt \
      --out "$ALOG/wgan_s$s.json" > "$PLOG/ab_wgan_s$s.log" 2>&1
done

# --- 4. stabilizer pairs at seed 0 (curve-only)
log "A/B wganvae ema"
timeout 3600 python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --g_ema_decay 0.999 --tag wganvae_ema --no_ckpt \
    --out "$ALOG/wganvae_ema.json" > "$PLOG/ab_wganvae_ema.log" 2>&1
log "A/B wgan ema"
timeout 3600 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 \
    --g_ema_decay 0.999 --tag wgan_ema --no_ckpt \
    --out "$ALOG/wgan_ema.json" > "$PLOG/ab_wgan_ema.log" 2>&1
log "A/B wganvae n_critic=5 (12 epochs)"
timeout 3600 python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --n_critic 5 --epochs 12 --tag wganvae_nc5 --no_ckpt \
    --out "$ALOG/wganvae_nc5.json" > "$PLOG/ab_wganvae_nc5.log" 2>&1
log "A/B wgan n_critic=5 (12 epochs)"
timeout 3600 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 \
    --n_critic 5 --epochs 12 --tag wgan_nc5 --no_ckpt \
    --out "$ALOG/wgan_nc5.json" > "$PLOG/ab_wgan_nc5.log" 2>&1

# --- 5. data-plane transfer A/B (corpus prebuilt at runs/dp_corpus)
log "data_plane overlap A/B"
timeout 5400 python tools/data_plane_run.py --corpus runs/dp_corpus \
    --slides 60 --tiles_per_slide 300 --prewarm --overlap_ab 80 \
    --out docs/quality/data_plane_ab.json > "$PLOG/data_plane_ab.log" 2>&1

# --- 6. projection-critic arm (checkpoint KEPT — representation needs it)
log "quality wganvae projection-critic"
timeout 4200 python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --critic projection --tag wganvae_proj --save_every 30 \
    --out "$ALOG/wganvae_proj.json" > "$PLOG/ab_wganvae_proj.log" 2>&1

# --- 7. representation analysis at the A/B scale: unconditional baseline,
# then the projection arm — same corpus/controls, directly comparable.
REP="--slides 100 --tiles_per_slide 300 --patients 50 --tiles_per_patient 64 --workdir runs/q_ab"
log "representation: unconditional arm"
timeout 4800 python tools/representation_run.py $REP --gan_name wgan_s0 \
    --rna_name wganvae --out docs/quality/representations_ab \
    > "$PLOG/rep_uncond.log" 2>&1
log "representation: projection arm"
timeout 4800 python tools/representation_run.py $REP --gan_name wgan_s0 \
    --rna_name wganvae_proj --critic projection \
    --out docs/quality/representations_proj > "$PLOG/rep_proj.log" 2>&1

# --- 8. SAGAN / BigGAN short quality runs
for arch in sagan biggan; do
  log "quality $arch 10 epochs"
  timeout 4200 python tools/quality_run.py --slides 100 --tiles_per_slide 300 \
      --batch 32 --workdir runs/q_ab --epochs 10 --no_ckpt \
      --loss_type wgan --no_clip --arch $arch --seed 0 --tag $arch \
      --out "$ALOG/$arch.json" > "$PLOG/ab_$arch.log" 2>&1
done

log "queue3 complete"
