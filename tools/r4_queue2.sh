#!/bin/bash
# Round-4 TPU queue part 2 — run AFTER tools/r4_queue.sh drains.
# Items: VERDICT r3 #5 (Adam roofline A/B), #6 (projection critic +
# representation rerun), #7 (SAGAN/BigGAN committed quality runs).
set -u
cd /root/repo
PLOG=docs/perf/logs
ALOG=docs/quality/ab
mkdir -p "$PLOG" "$ALOG"
log() { echo "[r4q2 $(date +%H:%M:%S)] $*" | tee -a "$PLOG/queue.log"; }

# --- 1. Adam roofline A/B (Pallas fused kernel vs XLA's optax fusion)
log "adam_bench"
timeout 2400 python tools/adam_bench.py --out docs/perf/adam_bench.json \
    > "$PLOG/adam_bench.log" 2>&1

# --- 2. projection-critic arm (same A/B protocol as part 1 section 3)
AB="--slides 100 --tiles_per_slide 300 --epochs 30 --batch 32 --workdir runs/q_ab --save_every 10"
log "quality wganvae projection-critic seed0"
timeout 4200 python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --critic projection --tag wganvae_proj \
    --out "$ALOG/wganvae_proj.json" > "$PLOG/ab_wganvae_proj.log" 2>&1

# --- 3. representation analysis at the A/B scale: unconditional arm
# (baseline at THIS scale) then the projection arm — same corpus, same
# controls (ceiling + z-sensitivity), so the two stats files are directly
# comparable. Control arm = wgan_s0 (no-clip baseline from part 1).
REP="--slides 100 --tiles_per_slide 300 --patients 50 --tiles_per_patient 64 --workdir runs/q_ab"
log "representation: unconditional wganvae arm"
timeout 4800 python tools/representation_run.py $REP --gan_name wgan_s0 \
    --rna_name wganvae --out docs/quality/representations_ab \
    > "$PLOG/rep_uncond.log" 2>&1
log "representation: projection-critic arm"
timeout 4800 python tools/representation_run.py $REP --gan_name wgan_s0 \
    --rna_name wganvae_proj --critic projection \
    --out docs/quality/representations_proj > "$PLOG/rep_proj.log" 2>&1

# --- 4. SAGAN / BigGAN short quality runs (10 epochs, FID probe on):
# evidence the reference's declared-but-broken archs actually train.
for arch in sagan biggan; do
  log "quality $arch 10 epochs"
  timeout 4200 python tools/quality_run.py --slides 100 --tiles_per_slide 300 \
      --batch 32 --workdir runs/q_ab --save_every 10 --epochs 10 \
      --loss_type wgan --no_clip --arch $arch --seed 0 --tag $arch \
      --out "$ALOG/$arch.json" > "$PLOG/ab_$arch.log" 2>&1
done

log "queue2 complete"
