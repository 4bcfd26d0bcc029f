#!/bin/bash
# Round-3 queue 14: train-step device profile at the round-3 recipe
# (bs 64 + stage remat, 480px) — the training MFU is ~7% and no profile
# of the TRAIN step exists at this config; find where the step time goes.
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q14] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }

log "waiting on Q13_DONE"
while [ ! -f "$OUT/Q13_DONE" ]; do sleep 60; done
log "queue13 done; starting"

log "1/1 train profile bs64 remat 480px"
timeout 2400 python -u tools/profile_train.py --batch 64 --size 480 --remat \
    > "$OUT/profile_train_q14.log" 2>&1
log "profile_train rc=$? (tail follows)"
tail -25 "$OUT/profile_train_q14.log" | tee -a "$OUT/queue.log"

echo done > "$OUT/Q14_DONE"
log "Q14 ALL DONE"
