#!/bin/bash
# Round-3 measurement queue #4 (restart after session loss):
#   1. XLA flags probe (scoped-VMEM fusion budget, LHS toggle)
#   2. EGM_GATE_MATH=native headline
#   3. training table: bs8 / bs64+remat / bs128+remat-fine
#   4. batch-192 / batch-256 inference probes
# The long bs64 proof resume + final bench_all run in queue5 once these
# results pick the shipping config.
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q4] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }

log "1/4 XLA flags probe"
bash tools/xla_flags_probe.sh "$OUT/xla_flags"
log "flags probe finished"

log "2/4 EGM_GATE_MATH=native headline"
EGM_GATE_MATH=native timeout 2400 python -u bench.py --mode inference \
    --batches 128 > "$OUT/gate_native.log" 2>&1
log "gate_native rc=$? $(grep -h '"metric"' "$OUT/gate_native.log" | tail -1)"

log "3/4 training table"
timeout 2400 python -u bench.py --mode train --size 480 \
    --batches 8 > "$OUT/train_bs8.log" 2>&1
log "train_bs8 rc=$? $(grep -h '"metric"' "$OUT/train_bs8.log" | tail -1)"
timeout 2400 python -u bench.py --mode train --size 480 --remat \
    --batches 64 > "$OUT/train_bs64_remat.log" 2>&1
log "train_bs64 rc=$? $(grep -h '"metric"' "$OUT/train_bs64_remat.log" | tail -1)"
timeout 3600 python -u bench.py --mode train --size 480 --remat-fine \
    --batches 128 > "$OUT/train_bs128_rematfine.log" 2>&1
log "train_bs128 rc=$? $(grep -h '"metric"' "$OUT/train_bs128_rematfine.log" | tail -1)"

log "4/4 batch probes"
timeout 2400 python -u bench.py --mode inference --batches 192 \
    > "$OUT/bs192.log" 2>&1
log "bs192 rc=$? $(grep -h '"metric"' "$OUT/bs192.log" | tail -1)"
timeout 2400 python -u bench.py --mode inference --batches 256 \
    > "$OUT/bs256.log" 2>&1
log "bs256 rc=$? $(grep -h '"metric"' "$OUT/bs256.log" | tail -1)"

echo done > "$OUT/Q4_DONE"
log "Q4 ALL DONE"
