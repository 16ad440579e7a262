#!/bin/bash
# Serial TPU measurement queue, part 3 (round 3). Supersedes tpu_queue2.sh:
# the round-3 b8 profile exposed a timed_chain artifact (whole-leaf host
# fetch through the ~20 MB/s tunnel swamped the differencing for the
# optimizer/FULL_STEP stages — 488 ms "adam_updates" vs a 33 ms full step),
# so step_profile.py now returns a 4-byte scalar probe and all profile rows
# are re-measured with the fixed tool. One job at a time: the tunnel serves
# ONE chip and concurrent jobs corrupt each other's timings.
set -u
cd /root/repo
mkdir -p runs/tpu_queue

log() { echo "[tpu_queue3 $(date +%H:%M:%S)] $*"; }

log "step_profile b8"
timeout 2400 python tools/step_profile.py 8  2>&1 | tee runs/tpu_queue/profile_b8.log
log "step_profile b64"
timeout 2400 python tools/step_profile.py 64 2>&1 | tee runs/tpu_queue/profile_b64.log
log "step_profile b8 --mu_bf16"
timeout 2400 python tools/step_profile.py 8 --mu_bf16 2>&1 | tee runs/tpu_queue/profile_b8_mubf16.log
log "step_profile b64 --mu_bf16"
timeout 2400 python tools/step_profile.py 64 --mu_bf16 2>&1 | tee runs/tpu_queue/profile_b64_mubf16.log

log "data_plane overlap A/B"
timeout 3600 python tools/data_plane_run.py --prewarm --epochs 0 \
    --host_probe_batches 40 --resident_steps 40 --overlap_ab 30 \
    --out docs/quality/data_plane_ab.json 2>&1 | tee runs/tpu_queue/overlap_ab.log

log "serve_bench"
timeout 3600 python tools/serve_bench.py 2>&1 | tee runs/tpu_queue/serve_bench.log

log "bench.py"
timeout 3600 python bench.py 2>&1 | tee runs/tpu_queue/bench.log

# mlprep: re-create the wganvae checkpoint + VAE bundle the ML experiment's
# synthetic variant loads (best-FID state is written at run end, so the
# epochs must COMPLETE inside the timeout)
log "mlprep quality_run wganvae 6 epochs"
timeout 5400 python tools/quality_run.py --loss_type wganvae --epochs 6 \
    --fid_every 2 --save_every 6 --workdir runs/quality \
    2>&1 | tee runs/tpu_queue/mlprep.log

log "ml_experiment"
timeout 14400 python tools/ml_experiment_run.py \
    --out docs/quality/ml_experiment.json 2>&1 | tee runs/tpu_queue/ml_experiment.log

log "queue3 complete"
