#!/bin/bash
# Round-3 follow-on measurements (run after r03_queue2.sh):
#   1. XLA flags probe (scoped-VMEM fusion budget etc.) — tools/xla_flags_probe.sh
#   2. EGM_GATE_MATH=native headline (bf16 pooled statistics in MCAGate —
#      the last f32 islands in the folded inference graph)
#   3. gate-math + best-flag combination if (2) wins
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q3] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }

log "1/2 XLA flags probe"
bash tools/xla_flags_probe.sh "$OUT/xla_flags"
log "flags probe finished"

log "2/2 EGM_GATE_MATH=native headline"
EGM_GATE_MATH=native timeout 2400 python -u bench.py --mode inference \
    --batches 128 > "$OUT/gate_native.log" 2>&1
log "gate_native rc=$? $(grep -h '"metric"' "$OUT/gate_native.log" | tail -1)"

echo done > "$OUT/Q3_DONE"
log "Q3 ALL DONE"
