#!/bin/bash
# Round-4 TPU queue part 4 — resumable replacement for r4_queue3.sh after
# the mid-round tunnel outage (remote_compile broken pipe at 11:3x).
# Every job: (a) waits for the tunnel to answer a tiny jitted op first,
# (b) is skipped when its output already exists, so the queue can be
# restarted any number of times and only runs what is missing.
set -u
cd /root/repo
PLOG=docs/perf/logs
ALOG=docs/quality/ab
mkdir -p "$PLOG" "$ALOG"
log() { echo "[r4q4 $(date +%H:%M:%S)] $*" | tee -a "$PLOG/queue.log"; }

wait_tunnel() {
  local n=0
  while true; do
    if timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jax.jit(lambda x: x.sum())(jnp.ones((128, 128)))) == 16384.0
assert jax.devices()[0].platform != "cpu"
EOF
    then log "tunnel OK"; return 0; fi
    n=$((n+1)); log "tunnel down (probe $n failed); sleeping 120s"
    sleep 120
  done
}

run_job() {  # run_job <name> <output-file> <timeout-s> <cmd...>
  local name="$1" out="$2" tmo="$3"; shift 3
  if [ -s "$out" ]; then log "$name: output exists, skip"; return 0; fi
  wait_tunnel
  log "$name"
  timeout "$tmo" "$@" > "$PLOG/$name.log" 2>&1
  local rc=$?
  [ $rc -ne 0 ] && log "$name EXIT=$rc"
  return 0
}

AB="--slides 100 --tiles_per_slide 300 --epochs 30 --batch 32 --workdir runs/q_ab"

# --- 1. downstream ML experiment (resumes finished variants from its JSON)
if ! grep -q '"mixed"' docs/quality/ml_experiment.json 2>/dev/null; then
  wait_tunnel
  log "ml_experiment"
  timeout 7200 python tools/ml_experiment_run.py --workdir runs/q_ab \
      --slides 100 --tiles_per_slide 300 --tiles_per_slide_cls 50 \
      --test_tiles_per_slide 10 --epochs 40 \
      --out docs/quality/ml_experiment.json > "$PLOG/ml_experiment.log" 2>&1 \
      || log "ml_experiment EXIT=$?"
else
  log "ml_experiment: output complete, skip"
fi

# --- 2. Adam roofline A/B
run_job adam_bench docs/perf/adam_bench.json 2400 \
  python tools/adam_bench.py --out docs/perf/adam_bench.json

# --- 3. remaining A/B seeds (curve-only)
for s in 1 2; do
  run_job ab_wganvae_s$s "$ALOG/wganvae_s$s.json" 3600 \
    python tools/quality_run.py $AB --loss_type wganvae --seed $s \
      --tag wganvae_s$s --no_ckpt --out "$ALOG/wganvae_s$s.json"
  run_job ab_wgan_s$s "$ALOG/wgan_s$s.json" 3600 \
    python tools/quality_run.py $AB --loss_type wgan --no_clip --seed $s \
      --tag wgan_s$s --no_ckpt --out "$ALOG/wgan_s$s.json"
done

# --- 4. stabilizer pairs
run_job ab_wganvae_ema "$ALOG/wganvae_ema.json" 3600 \
  python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --g_ema_decay 0.999 --tag wganvae_ema --no_ckpt --out "$ALOG/wganvae_ema.json"
run_job ab_wgan_ema "$ALOG/wgan_ema.json" 3600 \
  python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 \
    --g_ema_decay 0.999 --tag wgan_ema --no_ckpt --out "$ALOG/wgan_ema.json"
run_job ab_wganvae_nc5 "$ALOG/wganvae_nc5.json" 3600 \
  python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --n_critic 5 --epochs 12 --tag wganvae_nc5 --no_ckpt --out "$ALOG/wganvae_nc5.json"
run_job ab_wgan_nc5 "$ALOG/wgan_nc5.json" 3600 \
  python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 \
    --n_critic 5 --epochs 12 --tag wgan_nc5 --no_ckpt --out "$ALOG/wgan_nc5.json"

# --- 5. data-plane transfer A/B
run_job data_plane_ab docs/quality/data_plane_ab.json 5400 \
  python tools/data_plane_run.py --corpus runs/dp_corpus \
    --slides 60 --tiles_per_slide 300 --prewarm --overlap_ab 80 \
    --out docs/quality/data_plane_ab.json

# --- 6. projection-critic arm (checkpoint kept for representation)
run_job ab_wganvae_proj "$ALOG/wganvae_proj.json" 4200 \
  python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --critic projection --tag wganvae_proj --save_every 30 \
    --out "$ALOG/wganvae_proj.json"

# --- 7. representation analyses (unconditional baseline, then projection)
REP="--slides 100 --tiles_per_slide 300 --patients 50 --tiles_per_patient 64 --workdir runs/q_ab"
run_job rep_uncond docs/quality/representations_ab/distance_stats.json 4800 \
  python tools/representation_run.py $REP --gan_name wgan_s0 \
    --rna_name wganvae --out docs/quality/representations_ab
run_job rep_proj docs/quality/representations_proj/distance_stats.json 4800 \
  python tools/representation_run.py $REP --gan_name wgan_s0 \
    --rna_name wganvae_proj --critic projection \
    --out docs/quality/representations_proj

# --- 8. SAGAN / BigGAN short quality runs
for arch in sagan biggan; do
  run_job ab_$arch "$ALOG/$arch.json" 4200 \
    python tools/quality_run.py --slides 100 --tiles_per_slide 300 \
      --batch 32 --workdir runs/q_ab --epochs 10 --no_ckpt \
      --loss_type wgan --no_clip --arch $arch --seed 0 --tag $arch \
      --out "$ALOG/$arch.json"
done

log "queue4 complete"
