#!/bin/bash
# Round-3 master measurement queue (chip-serial).  Order: high-information
# conv-kernel measurements first (they decide the shipping default), then
# the bs64 large-batch proof run (matched to the bs8 proof's 48-epoch
# budget so the curves are comparable), then the training table and the
# full bench capture.
set -u
EPOCHS=${1:-48}
OUT=${2:-/root/repo/runs/r03_master}
PROOF=/root/repo/runs/r03_train_proof
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p "$OUT"
log() { echo "[master] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }

log "1/8 conv kernel compile probe (fail-fast)"
timeout 1800 python -u tools/conv_compile_probe.py > "$OUT/conv_probe.log" 2>&1
log "conv_probe rc=$?"

log "2/8 kernel parity (compiled Mosaic vs XLA)"
timeout 2400 python -u bench.py --verify-kernels --mode inference \
    --batches 16 > "$OUT/verify.log" 2>&1
log "verify rc=$?"

log "3/8 conv3x3 implicit-GEMM headline vs control"
EGM_CONV_IMPL=pallas timeout 3000 python -u bench.py --mode inference \
    --batches 128 > "$OUT/conv_pallas.log" 2>&1
log "conv_pallas rc=$?"
EGM_CONV_IMPL=pallas-pair timeout 3000 python -u bench.py --mode inference \
    --batches 128 > "$OUT/conv_pair.log" 2>&1
log "conv_pair rc=$?"
EGM_CONV_IMPL=pallas-both timeout 3000 python -u bench.py --mode inference \
    --batches 128 > "$OUT/conv_both.log" 2>&1
log "conv_both rc=$?"
timeout 3000 python -u bench.py --mode inference \
    --batches 128 > "$OUT/conv_xla_control.log" 2>&1
log "conv_xla_control rc=$?"

log "4/8 per-site conv3x3 microbench"
timeout 3600 python -u tools/conv_bench.py --batch 128 \
    > "$OUT/conv_sites.log" 2>&1
log "conv_sites rc=$?"

log "5/8 bs64+remat proof run, ${EPOCHS} epochs (lr 0.16 linear scaling)"
timeout 14000 python -u -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '64',
      '--epochs', '$EPOCHS', '--lr', '0.16', '--amp', '--remat',
      '--steps-per-dispatch', '13', '--wire-uint8',
      '--print-freq', '13',
      '--save-dir', '$PROOF/bs64_ckpt',
      '--results-file', '$PROOF/bs64_results.txt'])
" > "$PROOF/bs64_log.txt" 2>&1
log "bs64 run rc=$?"

log "6/8 training table: bs8 / bs64+remat / bs128+remat-fine"
timeout 2400 python -u bench.py --mode train --size 480 \
    --batches 8 > "$OUT/train_bs8.log" 2>&1
log "train_bs8 rc=$?"
timeout 2400 python -u bench.py --mode train --size 480 --remat \
    --batches 64 > "$OUT/train_bs64_remat.log" 2>&1
log "train_bs64 rc=$?"
timeout 3600 python -u bench.py --mode train --size 480 --remat-fine \
    --batches 128 > "$OUT/train_bs128_rematfine.log" 2>&1
log "train_bs128 rc=$?"

log "7/8 batch-256 headline probe"
timeout 2400 python -u bench.py --mode inference --batches 256 \
    > "$OUT/bs256.log" 2>&1
log "bs256 rc=$?"

log "8/8 full default bench capture"
timeout 4500 python -u bench.py > "$OUT/bench_all.log" 2>&1
log "bench_all rc=$?"

echo done > "$OUT/DONE"
log "ALL DONE"
