#!/bin/bash
# Remainder of the round-3 measurement queue (after conv microbench).
set -u
OUT=/root/repo/runs/r03_master
PROOF=/root/repo/runs/r03_train_proof
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q2] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }

log "1/6 kernel parity re-run (mca DMA width fixed)"
timeout 2400 python -u bench.py --verify-kernels --mode inference \
    --batches 16 > "$OUT/verify2.log" 2>&1
log "verify2 rc=$?"

log "2/6 bs64+remat proof run, 48 epochs (lr 0.16 linear scaling)"
timeout 14000 python -u -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '64',
      '--epochs', '48', '--lr', '0.16', '--amp', '--remat',
      '--steps-per-dispatch', '13', '--wire-uint8',
      '--print-freq', '13',
      '--save-dir', '$PROOF/bs64_ckpt',
      '--results-file', '$PROOF/bs64_results.txt'])
" > "$PROOF/bs64_log.txt" 2>&1
log "bs64 run rc=$?"

log "3/6 training table: bs8 / bs64+remat / bs128+remat-fine"
timeout 2400 python -u bench.py --mode train --size 480 \
    --batches 8 > "$OUT/train_bs8.log" 2>&1
log "train_bs8 rc=$?"
timeout 2400 python -u bench.py --mode train --size 480 --remat \
    --batches 64 > "$OUT/train_bs64_remat.log" 2>&1
log "train_bs64 rc=$?"
timeout 3600 python -u bench.py --mode train --size 480 --remat-fine \
    --batches 128 > "$OUT/train_bs128_rematfine.log" 2>&1
log "train_bs128 rc=$?"

log "4/6 batch-256 headline probe"
timeout 2400 python -u bench.py --mode inference --batches 256 \
    > "$OUT/bs256.log" 2>&1
log "bs256 rc=$?"

log "5/6 batch-192 headline probe"
timeout 2400 python -u bench.py --mode inference --batches 192 \
    > "$OUT/bs192.log" 2>&1
log "bs192 rc=$?"

log "6/6 full default bench capture"
timeout 4500 python -u bench.py > "$OUT/bench_all.log" 2>&1
log "bench_all rc=$?"

echo done > "$OUT/DONE"
log "Q2 ALL DONE"
