#!/bin/bash
# Round-4 TPU queue — ONE job at a time (the tunnel serves one chip).
# All logs + JSON land in COMMITTED paths (docs/perf/logs, docs/quality) —
# round 3 lost its landed numbers to a wiped gitignored runs/.
#
# Order = VERDICT r3 priority: profiles (feed the Pallas work) -> infusion
# A/B seed0 pair (also produces the wganvae checkpoint the ML experiment
# needs) -> ML experiment (missing #1) -> remaining A/B seeds (missing #2)
# -> EMA / n_critic pairs -> data-plane overlap A/B (weak #2).
set -u
cd /root/repo
PLOG=docs/perf/logs
ALOG=docs/quality/ab
mkdir -p "$PLOG" "$ALOG"
log() { echo "[r4q $(date +%H:%M:%S)] $*" | tee -a "$PLOG/queue.log"; }

# --- 1. stage profiles (b8 floor, b64 target batch, mu_bf16 lever at b64)
log "step_profile b8"
timeout 1800 python tools/step_profile.py 8  > "$PLOG/profile_b8.log" 2>&1
log "step_profile b64"
timeout 1800 python tools/step_profile.py 64 > "$PLOG/profile_b64.log" 2>&1
log "step_profile b64 --mu_bf16"
timeout 1800 python tools/step_profile.py 64 --mu_bf16 > "$PLOG/profile_b64_mubf16.log" 2>&1

# --- 2. serving A/B (re-lands the exact-border number lost with runs/)
log "serve_bench"
timeout 3600 python tools/serve_bench.py > "$PLOG/serve_bench.log" 2>&1

# --- 3. controlled infusion A/B (VERDICT missing #2): both arms pure
# WGAN-GP (no clip anywhere), identical corpus/VAE/protocol, seeds vary only
# GAN init + training stochasticity. Reduced scale (100x300, 30 epochs,
# 937 steps/epoch) so 6 base runs + 2 pairs fit one chip-day; the scale is
# identical across every run so the comparison stays controlled.
AB="--slides 100 --tiles_per_slide 300 --epochs 30 --batch 32 --workdir runs/q_ab --save_every 10"
log "A/B wganvae seed0"
timeout 4200 python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --out "$ALOG/wganvae_s0.json" > "$PLOG/ab_wganvae_s0.log" 2>&1
log "A/B wgan(no-clip) seed0"
timeout 4200 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 --tag wgan_s0 \
    --out "$ALOG/wgan_s0.json" > "$PLOG/ab_wgan_s0.log" 2>&1

# --- 4. downstream ML experiment (VERDICT missing #1): real / RNA-GAN
# synthetic / mixed, 5-fold stratified CV, ResNet50, acc + weighted F1.
# Corpus args MUST match the A/B runs (checkpoint + VAE bundle reuse).
log "ml_experiment"
timeout 7200 python tools/ml_experiment_run.py --workdir runs/q_ab \
    --slides 100 --tiles_per_slide 300 --tiles_per_slide_cls 50 \
    --test_tiles_per_slide 10 --epochs 40 \
    --out docs/quality/ml_experiment.json > "$PLOG/ml_experiment.log" 2>&1

# --- 5. remaining A/B seeds
for s in 1 2; do
  log "A/B wganvae seed$s"
  timeout 4200 python tools/quality_run.py $AB --loss_type wganvae --seed $s --tag wganvae_s$s \
      --out "$ALOG/wganvae_s$s.json" > "$PLOG/ab_wganvae_s$s.log" 2>&1
  log "A/B wgan(no-clip) seed$s"
  timeout 4200 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed $s --tag wgan_s$s \
      --out "$ALOG/wgan_s$s.json" > "$PLOG/ab_wgan_s$s.log" 2>&1
done

# --- 6. stabilizer pairs at seed 0 (the knobs built in r3, never run at scale)
log "A/B wganvae ema seed0"
timeout 4200 python tools/quality_run.py $AB --loss_type wganvae --seed 0 --g_ema_decay 0.999 \
    --tag wganvae_ema --out "$ALOG/wganvae_ema.json" > "$PLOG/ab_wganvae_ema.log" 2>&1
log "A/B wgan ema seed0"
timeout 4200 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 --g_ema_decay 0.999 \
    --tag wgan_ema --out "$ALOG/wgan_ema.json" > "$PLOG/ab_wgan_ema.log" 2>&1
log "A/B wganvae n_critic=5 seed0 (12 epochs: 5x D work per step)"
timeout 4200 python tools/quality_run.py $AB --loss_type wganvae --seed 0 --n_critic 5 --epochs 12 \
    --tag wganvae_nc5 --out "$ALOG/wganvae_nc5.json" > "$PLOG/ab_wganvae_nc5.log" 2>&1
log "A/B wgan n_critic=5 seed0"
timeout 4200 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 --n_critic 5 --epochs 12 \
    --tag wgan_nc5 --out "$ALOG/wgan_nc5.json" > "$PLOG/ab_wgan_nc5.log" 2>&1

# --- 7. data-plane transfer A/B (VERDICT weak #2): interleaved 3-mode in one
# process; tool rebuilds its corpus if the scratch dir was wiped.
log "data_plane overlap A/B"
timeout 5400 python tools/data_plane_run.py --corpus runs/dp_corpus \
    --slides 60 --tiles_per_slide 300 --prewarm --overlap_ab 80 \
    --out docs/quality/data_plane_ab.json > "$PLOG/data_plane_ab.log" 2>&1

log "queue complete"
