#!/bin/bash
# Round-4 TPU queue part 5 — continuation after the 17:06 snapshot cut
# r4_queue4.sh mid-run. Reordered by verdict value: quick wins first
# (adam_bench post-VMEM-fix, data-plane transfer A/B), then the SAGAN/
# BigGAN quality runs, the n_critic=5 stabilizer pairs, and finally the
# projection-critic chain (checkpointed arms + representation reruns).
# Same contract as queue4: every job waits for the tunnel, skips itself
# when its output exists, so the queue is restartable any number of times.
set -u
cd /root/repo
PLOG=docs/perf/logs
ALOG=docs/quality/ab
mkdir -p "$PLOG" "$ALOG"
log() { echo "[r4q5 $(date +%H:%M:%S)] $*" | tee -a "$PLOG/queue.log"; }

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

# --- 1. Adam roofline A/B (the 15:16 failure predates the 15:27 VMEM fix)
run_job adam_bench docs/perf/adam_bench.json 2400 \
  python tools/adam_bench.py --out docs/perf/adam_bench.json

# --- 2. data-plane transfer A/B (verdict r3 item 4)
run_job data_plane_ab docs/quality/data_plane_ab.json 5400 \
  python tools/data_plane_run.py --corpus runs/dp_corpus \
    --slides 60 --tiles_per_slide 300 --prewarm --overlap_ab 80 \
    --out docs/quality/data_plane_ab.json

# --- 3. SAGAN / BigGAN short quality runs (verdict r3 item 7)
for arch in sagan biggan; do
  run_job ab_$arch "$ALOG/$arch.json" 4200 \
    python tools/quality_run.py --slides 100 --tiles_per_slide 300 \
      --batch 32 --workdir runs/q_ab --epochs 10 --no_ckpt \
      --loss_type wgan --no_clip --arch $arch --seed 0 --tag $arch \
      --out "$ALOG/$arch.json"
done

# --- 4. n_critic=5 stabilizer pairs (verdict r3 item 2, last missing knob)
run_job ab_wganvae_nc5 "$ALOG/wganvae_nc5.json" 3600 \
  python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --n_critic 5 --epochs 12 --tag wganvae_nc5 --no_ckpt --out "$ALOG/wganvae_nc5.json"
run_job ab_wgan_nc5 "$ALOG/wgan_nc5.json" 3600 \
  python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 \
    --n_critic 5 --epochs 12 --tag wgan_nc5 --no_ckpt --out "$ALOG/wgan_nc5.json"

# --- 5. projection-critic chain (verdict r3 item 6): checkpointed arms,
#        then the representation reruns on the same corpus/protocol.
run_job ab_wganvae_proj "$ALOG/wganvae_proj.json" 4200 \
  python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --critic projection --tag wganvae_proj --save_every 30 \
    --out "$ALOG/wganvae_proj.json"
run_job ab_wgan_ckpt "$ALOG/wgan_ckpt.json" 3600 \
  python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 2 \
    --tag wgan --save_every 30 --out "$ALOG/wgan_ckpt.json"
run_job ab_wganvae_ckpt "$ALOG/wganvae_ckpt.json" 3600 \
  python tools/quality_run.py $AB --loss_type wganvae --seed 0 \
    --tag wganvae --save_every 30 --out "$ALOG/wganvae_ckpt.json"

REP="--slides 100 --tiles_per_slide 300 --patients 50 --tiles_per_patient 64 --workdir runs/q_ab"
run_job rep_proj docs/quality/representations_proj/distance_stats.json 4800 \
  python tools/representation_run.py $REP --gan_name wgan \
    --rna_name wganvae_proj --critic projection \
    --out docs/quality/representations_proj
run_job rep_uncond docs/quality/representations_ab/distance_stats.json 4800 \
  python tools/representation_run.py $REP --gan_name wgan \
    --rna_name wganvae --out docs/quality/representations_ab

log "queue5 complete"
