#!/bin/bash
# Concurrent compile warmer: AOT-compiles every upcoming queue-4 program
# into .jax_cache while the measurement queue owns the chip. Remote
# compilation is a separate service from execution, so this overlaps
# cleanly; the few small eager setup ops it runs interleave harmlessly.
set -u
cd /root/repo
PLOG=docs/perf/logs
log() { echo "[warm $(date +%H:%M:%S)] $*" | tee -a "$PLOG/warm.log"; }
AB="--slides 100 --tiles_per_slide 300 --epochs 30 --batch 32 --workdir /tmp/warm_wd --compile_only"

log "wganvae (rng-program)"
timeout 2400 python tools/quality_run.py $AB --loss_type wganvae --seed 1 >> "$PLOG/warm.log" 2>&1
log "wgan (rng-program)"
timeout 2400 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 1 >> "$PLOG/warm.log" 2>&1
log "wganvae ema"
timeout 2400 python tools/quality_run.py $AB --loss_type wganvae --seed 0 --g_ema_decay 0.999 >> "$PLOG/warm.log" 2>&1
log "wgan ema"
timeout 2400 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 --g_ema_decay 0.999 >> "$PLOG/warm.log" 2>&1
log "wganvae nc5"
timeout 2400 python tools/quality_run.py $AB --loss_type wganvae --seed 0 --n_critic 5 >> "$PLOG/warm.log" 2>&1
log "wgan nc5"
timeout 2400 python tools/quality_run.py $AB --loss_type wgan --no_clip --seed 0 --n_critic 5 >> "$PLOG/warm.log" 2>&1
log "wganvae projection"
timeout 2400 python tools/quality_run.py $AB --loss_type wganvae --seed 0 --critic projection >> "$PLOG/warm.log" 2>&1
log "sagan"
timeout 2400 python tools/quality_run.py $AB --loss_type wgan --no_clip --arch sagan --seed 0 >> "$PLOG/warm.log" 2>&1
log "biggan"
timeout 2400 python tools/quality_run.py $AB --loss_type wgan --no_clip --arch biggan --seed 0 >> "$PLOG/warm.log" 2>&1
log "warm complete"
