#!/bin/bash
# Round-4 TPU queue part 1: timing-sensitive measurements (profiles, serving).
# One job at a time — the tunnel serves ONE chip. Logs land in docs/perf/logs/
# (COMMITTED — round 3 lost its landed numbers to a wiped gitignored runs/).
set -u
cd /root/repo
log() { echo "[r4q1 $(date +%H:%M:%S)] $*"; }

log "step_profile b8"
timeout 2400 python tools/step_profile.py 8  > docs/perf/logs/profile_b8.log 2>&1
log "step_profile b64"
timeout 2400 python tools/step_profile.py 64 > docs/perf/logs/profile_b64.log 2>&1
log "step_profile b8 --mu_bf16"
timeout 2400 python tools/step_profile.py 8 --mu_bf16  > docs/perf/logs/profile_b8_mubf16.log 2>&1
log "step_profile b64 --mu_bf16"
timeout 2400 python tools/step_profile.py 64 --mu_bf16 > docs/perf/logs/profile_b64_mubf16.log 2>&1
log "serve_bench"
timeout 3600 python tools/serve_bench.py > docs/perf/logs/serve_bench.log 2>&1
log "queue1 complete"
