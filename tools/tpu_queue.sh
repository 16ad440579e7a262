#!/bin/bash
# Serial TPU measurement queue (round 3). The axon tunnel went down mid-round;
# this runs the whole backlog unattended the moment it recovers, one job at a
# time (the tunnel serves ONE chip - concurrent jobs corrupt each other's
# timings). Logs land in runs/tpu_queue/.
set -u
cd /root/repo
mkdir -p runs/tpu_queue

log() { echo "[tpu_queue $(date +%H:%M:%S)] $*"; }

# 0. gate: wait for the tunnel to answer a device listing (indefinitely -
# the whole queue is useless without it, and the driver bounds the session)
log "probing TPU tunnel..."
i=0
while true; do
  i=$((i + 1))
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    log "tunnel is up (probe $i)"; break
  fi
  [ $((i % 10)) = 0 ] && log "still down after $i probes"
  sleep 60
done

# 1. stage-level step profile at the reference batch and the scaled batch
log "step_profile b8"
timeout 2400 python tools/step_profile.py 8  2>&1 | tee runs/tpu_queue/profile_b8.log
log "step_profile b64"
timeout 2400 python tools/step_profile.py 64 2>&1 | tee runs/tpu_queue/profile_b64.log

# 2. transfer-overlap A/B through the production data plane (warm cache,
#    interleaved modes in ONE process so tunnel drift can't fake a win)
log "data_plane overlap A/B"
timeout 3600 python tools/data_plane_run.py --prewarm --epochs 0 \
    --host_probe_batches 40 --resident_steps 40 --overlap_ab 30 \
    --out docs/quality/data_plane_ab.json 2>&1 | tee runs/tpu_queue/overlap_ab.log

# 3. serving A/B incl. the narrowed exact-border dcgan_up row (README TBD_R3)
log "serve_bench"
timeout 3600 python tools/serve_bench.py 2>&1 | tee runs/tpu_queue/serve_bench.log


# 5. bench sanity (the driver also runs this at round end)
log "bench.py"
timeout 3600 python bench.py 2>&1 | tee runs/tpu_queue/bench.log

log "queue complete"

# 6. (appended mid-round) Adam bf16-first-moment A/B on the batch-independent
#    optimizer floor — compare adam_updates + FULL_STEP vs jobs 1's f32 rows
log "step_profile b8 --mu_bf16"
timeout 2400 python tools/step_profile.py 8 --mu_bf16 2>&1 | tee runs/tpu_queue/profile_b8_mubf16.log
log "step_profile b64 --mu_bf16"
timeout 2400 python tools/step_profile.py 64 --mu_bf16 2>&1 | tee runs/tpu_queue/profile_b64_mubf16.log

# 4. downstream ML experiment at reference scale (longest job last)
log "ml_experiment"
timeout 14400 python tools/ml_experiment_run.py \
    --out docs/quality/ml_experiment.json 2>&1 | tee runs/tpu_queue/ml_experiment.log

log "queue complete (appended jobs)"
