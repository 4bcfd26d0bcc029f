#!/bin/bash
# Round-3 queue 18b: SELECTIVE int8-dataflow sites.  All-sites int8df
# measured -7% (it inherits the barrier-all penalty).  These configs only
# quantize tensors that are materialized ANYWAY at the shipping defaults:
# the MCA combine + EGRFB gate chains (EGM_MCA_BARRIER=1 default) and the
# encoder pools (EGM_POOL_BARRIER measured neutral = XLA already
# materializes them) — there the 8-bit store is a pure traffic halving.
set -u
OUT=/root/repo/runs/r03_master
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q18b] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue18b.log"; }

log "waiting for tunnel health"
for i in $(seq 1 30); do
  timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1 && { log "healthy ($i)"; break; }
  sleep 120
done

run() {  # run <tag> <sites>
  log "int8df sites=$2"
  EGM_QSTORE_SITES="$2" timeout 2400 python -u bench.py --mode int8df \
      --headline-batches 128 --no-agreement > "$OUT/int8df_$1_q18b.log" 2>&1
  log "rc=$?"
  grep -E '"metric"|batch 128' "$OUT/int8df_$1_q18b.log" | tail -2 | tee -a "$OUT/queue18b.log"
}

run barrier_sites "mca:,egrfb:"
run pools ":pool"
run barrier_plus_pools "mca:,egrfb:,:pool"

log "agreement check at the best config (barrier_plus_pools)"
EGM_QSTORE_SITES="mca:,egrfb:,:pool" timeout 2400 python -u bench.py \
    --mode int8df --headline-batches 128 > "$OUT/int8df_bpp_agree_q18b.log" 2>&1
log "rc=$?"
grep -E '"metric"|agreement' "$OUT/int8df_bpp_agree_q18b.log" | tail -2 | tee -a "$OUT/queue18b.log"

echo done > "$OUT/Q18B_DONE"
log "Q18B ALL DONE"
