#!/bin/bash
# End-of-round chip guard. The axon tunnel serializes clients, so the
# driver's end-of-round bench.py would block behind whatever quality run the
# r5 queue has in flight. Run this ~1h before the expected round end:
#   * if the queue's CURRENT job is a nice-to-have (infusion power seed /
#     wgan_ema rerun), kill the queue process group now — the job's partial
#     JSON fails tools/run_complete.py validation, so a restart re-runs it
#     and nothing downstream publishes it as final;
#   * if it is a high-value job (biggan / ml_proj / ml_scarce / rep_uncond),
#     leave it to finish but kill the QUEUE SCRIPT itself so no further jobs
#     start after it; the chip frees when the job exits.
# Partial seed JSONs left behind are deleted so ab_summary.py cannot pick
# them up (ADVICE r4 medium: a partial JSON must never be treated as final).
set -u
cd /root/repo
PLOG=docs/perf/logs
log() { echo "[guard $(date +%H:%M:%S)] $*" | tee -a "$PLOG/queue.log"; }

QPID=$(cat /tmp/r5q.pid 2>/dev/null || true)
if [ -z "$QPID" ] || ! kill -0 "$QPID" 2>/dev/null; then
  log "queue not running; nothing to guard"; exit 0
fi

current=$(grep -oE '\[r5q [0-9:]+\] [a-z0-9_]+$' "$PLOG/queue.log" | tail -1 | awk '{print $3}')
log "queue pid $QPID alive; current job: ${current:-unknown}"

# FORCE=1: final sweep right before round end — kill whatever is running
[ "${FORCE:-0}" = "1" ] && current=""

case "$current" in
  ab_wganvae_s*|ab_wgan_s*|ab_wgan_ema|"")
    # kill queue + its children (timeout + python) via the process tree
    kids=$(ps -o pid= --ppid "$QPID" | tr -d ' ')
    kill "$QPID" 2>/dev/null
    for k in $kids; do
      gk=$(ps -o pid= --ppid "$k" | tr -d ' ')
      kill "$k" 2>/dev/null
      for g in $gk; do kill "$g" 2>/dev/null; done
    done
    log "killed queue + current job ($current) to free the chip for bench"
    # drop partials that fail completeness validation
    for f in docs/quality/ab/wganvae_s*.json docs/quality/ab/wgan_s*.json \
             docs/quality/ab/wgan_ema.json; do
      [ -e "$f" ] || continue
      if ! python tools/run_complete.py quality "$f" 30 >/dev/null 2>&1; then
        log "removing incomplete $f"
        rm -f "$f"
      fi
    done
    ;;
  *)
    kill "$QPID" 2>/dev/null
    log "killed queue script only; letting high-value job '$current' finish"
    ;;
esac
