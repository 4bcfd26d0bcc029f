#!/bin/bash
# Round-3 queue 13: debug the on-chip fusion-eval failure (bench_all.log
# showed fusion_eval ok=false with an empty stderr tail) by running the
# exact bench_fusion subprocess directly with full output captured.
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q13] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }

log "waiting on Q12_DONE"
while [ ! -f "$OUT/Q12_DONE" ]; do sleep 60; done
log "queue12 done; starting"

log "1/1 fusion eval direct run (full output)"
timeout 1800 python -u -c "
from egm_unet_tpu.cli.eval_clipseg import main
main(['--synthetic','--model','egm_unet','--base-c','32',
      '--clip-batch','16','--unet-batch','8',
      '--save-result','/tmp/bench_fusion',
      '--alpha-file','/tmp/bench_fusion_alpha.txt'])
" > "$OUT/fusion_direct_q13.log" 2>&1
log "fusion_direct rc=$? (tail follows)"
tail -5 "$OUT/fusion_direct_q13.log" | tee -a "$OUT/queue.log"

echo done > "$OUT/Q13_DONE"
log "Q13 ALL DONE"
