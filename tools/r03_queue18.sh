#!/bin/bash
# Round-3 queue 18: int8-dataflow measurements (the one remaining lever the
# round-3 analysis named toward the 2000 img/s north star — int8 tensors
# BETWEEN ops, not just int8 MXU convs; ops/quant.py requant_store).
#   1) int8df  (8-bit stored activations, bf16 convs) @ batch 128 + agreement
#   2) int8full (int8df storage + int8 MXU convs)
#   3) EGM_UP_SPLIT=1 bf16 (decoder concat replaced by split-conv, exact)
#   4) EGM_UP_SPLIT=1 + int8df combined
#   5) int8df batch 256 (8-bit activations halve the working set — the
#      batch sweet spot may move)
set -u
OUT=/root/repo/runs/r03_master
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q18] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue18.log"; }

log "waiting for tunnel health"
healthy=0
for i in $(seq 1 30); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1; then
    log "tunnel healthy after probe $i"; healthy=1; break
  fi
  sleep 120
done
[ "$healthy" = 1 ] || { log "tunnel never recovered; giving up"; exit 1; }

log "1/5 int8df batch 128 (+mask agreement)"
timeout 2400 python -u bench.py --mode int8df --headline-batches 128 \
    > "$OUT/int8df_q18.log" 2>&1
log "rc=$?"; grep -E '"metric"|agreement|batch' "$OUT/int8df_q18.log" | tail -4 | tee -a "$OUT/queue18.log"

log "2/5 int8full batch 128"
timeout 2400 python -u bench.py --mode int8full --headline-batches 128 --no-agreement \
    > "$OUT/int8full_q18.log" 2>&1
log "rc=$?"; grep -E '"metric"|batch' "$OUT/int8full_q18.log" | tail -3 | tee -a "$OUT/queue18.log"

log "3/5 bf16 + EGM_UP_SPLIT=1 (split-conv decoder, exact)"
EGM_UP_SPLIT=1 timeout 2400 python -u bench.py --mode inference --batches 128 \
    > "$OUT/upsplit_bf16_q18.log" 2>&1
log "rc=$?"; grep -E '"metric"|batch' "$OUT/upsplit_bf16_q18.log" | tail -3 | tee -a "$OUT/queue18.log"

log "4/5 int8df + EGM_UP_SPLIT=1"
EGM_UP_SPLIT=1 timeout 2400 python -u bench.py --mode int8df --headline-batches 128 --no-agreement \
    > "$OUT/int8df_upsplit_q18.log" 2>&1
log "rc=$?"; grep -E '"metric"|batch' "$OUT/int8df_upsplit_q18.log" | tail -3 | tee -a "$OUT/queue18.log"

log "5/5 int8df batch 256"
timeout 2400 python -u bench.py --mode int8df --headline-batches 256 --no-agreement \
    > "$OUT/int8df_b256_q18.log" 2>&1
log "rc=$?"; grep -E '"metric"|batch' "$OUT/int8df_b256_q18.log" | tail -3 | tee -a "$OUT/queue18.log"

echo done > "$OUT/Q18_DONE"
log "Q18 ALL DONE"
