#!/bin/bash
# Round-3 queue 12: leftovers after the wave-3 knob measurements.
#   1. monolithic bs-128 train retry through _jit_plain (no compiler
#      options — the earlier failures had the scoped-VMEM option applied)
#      with the shortest possible chain (n1=1, n2=2)
#   2. fresh device profile of the shipping inference config (batch 128,
#      baked defaults) for the round-3 "where the time goes" table
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q12] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }
metric() { grep -h '"metric"' "$1" 2>/dev/null | tail -1; }

log "waiting on Q11_DONE"
while [ ! -f "$OUT/Q11_DONE" ]; do sleep 60; done
log "queue11 done; starting"

log "1/2 monolithic bs-128 remat-fine retry (plain jit, n1=1 n2=2)"
timeout 3600 python -u bench.py --mode train --size 480 --remat-fine \
    --batches 128 --n1 1 --n2 2 > "$OUT/train_bs128_mono_q12.log" 2>&1
log "train_bs128_mono rc=$? $(metric "$OUT/train_bs128_mono_q12.log")"

log "2/2 device profile at the shipping config"
timeout 2400 python -u tools/profile_egm.py --batch 128 \
    > "$OUT/profile_q12.log" 2>&1
log "profile rc=$? (trace under /tmp/jax_trace_egm)"

echo done > "$OUT/Q12_DONE"
log "Q12 ALL DONE"
