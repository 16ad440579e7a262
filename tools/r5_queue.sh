#!/bin/bash
# Round-5 TPU queue — closes the VERDICT r4 list:
#   1. (safety net) re-issues the r4_queue5 tail with COMPLETENESS-validated
#      skips (ADVICE r4 medium: a partial JSON must not be treated as final)
#   2. BigGAN with the remat fix for the b32 HBM blowup that crashed the TPU
#      worker twice (docs/perf/biggan_rootcause.json)
#   3. ML synthetic-transfer from the projection-critic checkpoint
#      (the third leg of the conditioning-evidence chain)
#   4. data-scarce ML augmentation variant (5 real vs 5 real + 50 synthetic)
#   5. infusion A/B power seeds 3-6 for both arms, interleaved so partial
#      completion keeps the arms balanced
#   6. full 30-epoch wgan_ema rerun (the round-4 one was cut at 25)
#
# Waits for the still-running r4_queue5.sh (if any) to release the chip.
# Restartable any number of times: every job is skipped only when its output
# passes tools/run_complete.py for its kind.
set -u
cd /root/repo
PLOG=docs/perf/logs
ALOG=docs/quality/ab
mkdir -p "$PLOG" "$ALOG"
log() { echo "[r5q $(date +%H:%M:%S)] $*" | tee -a "$PLOG/queue.log"; }

# -- wait for the round-4 queue to finish before touching the chip
if [ -f /tmp/queue5.pid ] && kill -0 "$(cat /tmp/queue5.pid)" 2>/dev/null; then
  log "waiting for r4_queue5 (pid $(cat /tmp/queue5.pid))"
  while kill -0 "$(cat /tmp/queue5.pid)" 2>/dev/null; do sleep 60; done
  log "r4_queue5 exited"
fi

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

run_job() {  # run_job <name> <timeout-s> <kind> <out> [kind-args...] -- <cmd...>
  local name="$1" tmo="$2"; shift 2
  local check=()
  while [ "$1" != "--" ]; do check+=("$1"); shift; done
  shift  # drop --
  local out="${check[1]}"
  if python tools/run_complete.py "${check[@]}" 2>/dev/null; then
    log "$name: output complete, skip"; return 0
  fi
  wait_tunnel
  log "$name"
  timeout "$tmo" "$@" > "$PLOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    log "$name FAILED rc=$rc (output left for restart-retry: $out)"
  elif ! python tools/run_complete.py "${check[@]}" 2>/dev/null; then
    log "$name rc=0 but output INCOMPLETE: $out"
  else
    log "$name done"
  fi
  return 0
}

AB="--slides 100 --tiles_per_slide 300 --batch 32 --workdir runs/q_ab"
Q=runs/q_ab
ML="--slides 100 --tiles_per_slide 300 --workdir runs/q_ab"

# --- 1. r4_queue5 tail, re-issued with completeness checks (no-ops if done)
run_job ab_wganvae_proj 4200 quality_ckpt "$ALOG/wganvae_proj.json" 30 "$Q/wganvae_proj_last.model" -- \
  python tools/quality_run.py $AB --epochs 30 --loss_type wganvae --seed 0 \
    --critic projection --tag wganvae_proj --save_every 30 --resume \
    --out "$ALOG/wganvae_proj.json"
run_job ab_wgan_ckpt 3600 quality_ckpt "$ALOG/wgan_ckpt.json" 30 "$Q/wgan_last.model" -- \
  python tools/quality_run.py $AB --epochs 30 --loss_type wgan --no_clip --seed 2 \
    --tag wgan --save_every 30 --resume --out "$ALOG/wgan_ckpt.json"
run_job ab_wganvae_ckpt 3600 quality_ckpt "$ALOG/wganvae_ckpt.json" 30 "$Q/wganvae_last.model" -- \
  python tools/quality_run.py $AB --epochs 30 --loss_type wganvae --seed 0 \
    --tag wganvae --save_every 30 --resume --out "$ALOG/wganvae_ckpt.json"

REP="--slides 100 --tiles_per_slide 300 --patients 50 --tiles_per_patient 64 --workdir runs/q_ab"
run_job rep_proj 4800 exists docs/quality/representations_proj/distance_stats.json -- \
  python tools/representation_run.py $REP --gan_name wgan \
    --rna_name wganvae_proj --critic projection \
    --out docs/quality/representations_proj
run_job rep_uncond 4800 exists docs/quality/representations_ab/distance_stats.json -- \
  python tools/representation_run.py $REP --gan_name wgan \
    --rna_name wganvae --out docs/quality/representations_ab

# --- 2. BigGAN with the remat HBM fix (VERDICT r4 missing #2)
run_job ab_biggan_remat 5400 quality "$ALOG/biggan.json" 10 -- \
  python tools/quality_run.py $AB --epochs 10 --no_ckpt \
    --loss_type wgan --no_clip --arch biggan --remat --seed 0 --tag biggan \
    --out "$ALOG/biggan.json"

# --- 3. ML synthetic-transfer from the projection checkpoint (VERDICT #1)
run_job ml_proj 5400 keys docs/quality/ml_experiment_proj.json rnagan_synthetic -- \
  python tools/ml_experiment_run.py $ML --tiles_per_slide_cls 50 \
    --ckpt_name wganvae_proj --skip_real \
    --out docs/quality/ml_experiment_proj.json

# --- 4. data-scarce augmentation variant (VERDICT r4 weak #5 / item 6)
run_job ml_scarce 7200 keys docs/quality/ml_experiment_scarce.json real,rnagan_synthetic,mixed -- \
  python tools/ml_experiment_run.py $ML --tiles_per_slide_cls 5 \
    --synth_tiles_per_slide 50 --test_tiles_per_slide 10 \
    --out docs/quality/ml_experiment_scarce.json

# --- 5. infusion A/B power seeds 3-6, arms interleaved (VERDICT #4)
for s in 3 4 5 6; do
  run_job ab_wganvae_s$s 3600 quality "$ALOG/wganvae_s$s.json" 30 -- \
    python tools/quality_run.py $AB --epochs 30 --loss_type wganvae --seed $s \
      --tag wganvae_s$s --no_ckpt --out "$ALOG/wganvae_s$s.json"
  run_job ab_wgan_s$s 3600 quality "$ALOG/wgan_s$s.json" 30 -- \
    python tools/quality_run.py $AB --epochs 30 --loss_type wgan --no_clip --seed $s \
      --tag wgan_s$s --no_ckpt --out "$ALOG/wgan_s$s.json"
done

# --- 6. full 30-epoch wgan_ema rerun (ADVICE r4: round-4 run cut at 25/30)
run_job ab_wgan_ema 3600 quality "$ALOG/wgan_ema.json" 30 -- \
  python tools/quality_run.py $AB --epochs 30 --loss_type wgan --no_clip --seed 0 \
    --g_ema_decay 0.999 --tag wgan_ema --no_ckpt --out "$ALOG/wgan_ema.json"

log "r5 queue complete"
