#!/bin/bash
# Round-3 queue 18c: greedy site additions on top of the q18b winner
# W = mca:,egrfb:,:pool (532.4 img/s vs 519.2 bf16).
#   1) W + fusion:out        (FusionConv 1x1 output inside each EGRFB)
#   2) W + conv1/conv2 outs  (encoder-stage ConvBNReLU outputs)
#   3) W + ConvBNReLU_ outs  (stem + decoder ConvBNReLU outputs)
set -u
OUT=/root/repo/runs/r03_master
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q18c] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue18c.log"; }

log "waiting for Q18B_DONE"
for i in $(seq 1 120); do
  [ -f "$OUT/Q18B_DONE" ] && break
  sleep 60
done
[ -f "$OUT/Q18B_DONE" ] || { log "q18b never finished; aborting"; exit 1; }

W="mca:,egrfb:,:pool"
run() {  # run <tag> <sites>
  log "int8df sites=$2"
  EGM_QSTORE_SITES="$2" timeout 2400 python -u bench.py --mode int8df \
      --headline-batches 128 --no-agreement > "$OUT/int8df_$1_q18c.log" 2>&1
  log "rc=$?"
  grep -E '"metric"|batch 128' "$OUT/int8df_$1_q18c.log" | tail -2 | tee -a "$OUT/queue18c.log"
}

run w_fusion "$W,fusion:out"
run w_encconv "$W,conv1:out,conv2:out"
run w_stemdec "$W,ConvBNReLU_"

echo done > "$OUT/Q18C_DONE"
log "Q18C ALL DONE"
