#!/bin/bash
# Round-3 queue 15: retry the measurements lost to the axon-tunnel outage
# (the bs-128 monolithic compile crashed the remote compile service ~23:54;
# everything TPU hung after).  Gates on actual tunnel health — a trivial
# on-device op completing — before spending any run.
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q15] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }
metric() { grep -h '"metric"' "$1" 2>/dev/null | tail -1; }

log "waiting on Q14_DONE"
while [ ! -f "$OUT/Q14_DONE" ]; do sleep 60; done

log "waiting for tunnel health (trivial op, probe every 5 min, max 6 h)"
for i in $(seq 1 72); do
  if timeout 60 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1; then
    log "tunnel healthy after probe $i"
    break
  fi
  [ "$i" = 72 ] && { log "tunnel never recovered; giving up"; exit 1; }
  sleep 300
done

log "1/3 fusion eval direct run (q13 redo)"
timeout 1800 python -u -c "
from egm_unet_tpu.cli.eval_clipseg import main
main(['--synthetic','--model','egm_unet','--base-c','32',
      '--clip-batch','16','--unet-batch','8',
      '--save-result','/tmp/bench_fusion',
      '--alpha-file','/tmp/bench_fusion_alpha.txt'])
" > "$OUT/fusion_direct_q15.log" 2>&1
log "fusion_direct rc=$?"
tail -4 "$OUT/fusion_direct_q15.log" | tee -a "$OUT/queue.log"

log "2/3 inference profile at shipping config (q12 redo)"
timeout 2400 python -u tools/profile_egm.py --batch 128 \
    > "$OUT/profile_q15.log" 2>&1
log "profile rc=$?"
tail -20 "$OUT/profile_q15.log" | tee -a "$OUT/queue.log"

log "3/3 train profile bs64 remat 480px (q14 redo)"
timeout 2400 python -u tools/profile_train.py --batch 64 --size 480 --remat \
    > "$OUT/profile_train_q15.log" 2>&1
log "profile_train rc=$?"
tail -25 "$OUT/profile_train_q15.log" | tee -a "$OUT/queue.log"

echo done > "$OUT/Q15_DONE"
log "Q15 ALL DONE"
