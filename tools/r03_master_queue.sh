#!/bin/bash
# Round-3 manual master queue (replaces the tail of train_proof.sh plus
# r03_chip_queue{,2}.sh after the bs8 proof run was cut at a compressed
# epoch budget — the tunnel-dominated ~100 s/epoch wall clock made the
# scripted 2x200-epoch plan exceed the session budget; see PERF.md).
#
#  1. bs64+remat large-batch proof run, lr 0.16 (linear scaling), 60 epochs,
#     steps-per-dispatch 13 (= exactly one scan program per epoch: 876/64
#     -> 13 full steps, no partial-dispatch second compile)
#  2. compiled Pallas kernel parity on the live backend (--verify-kernels)
#  3. EGM inference with EGM_CONV_IMPL=pallas vs same-session XLA control
#  4. per-site conv3x3 microbench (picks EGM_CONV_SITES)
#  5. training-throughput refresh: bs8 / bs64+remat / bs128+remat-fine
#  6. batch-256 headline probe
#  7. full default bench capture
#
# Usage: tools/r03_master_queue.sh [epochs_bs64] [outdir]
set -u
EPOCHS=${1:-60}
OUT=${2:-/root/repo/runs/r03_master}
PROOF=/root/repo/runs/r03_train_proof
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p "$OUT"
log() { echo "[master] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }

log "1/7 bs64+remat proof run, ${EPOCHS} epochs"
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

log "2a/7 conv kernel compile probe (fail-fast)"
timeout 1800 python -u tools/conv_compile_probe.py > "$OUT/conv_probe.log" 2>&1
log "conv_probe rc=$?"

log "2/7 kernel parity (compiled Mosaic vs XLA)"
timeout 2400 python -u bench.py --verify-kernels --mode inference \
    --batches 16 > "$OUT/verify.log" 2>&1
log "verify rc=$?"

log "3/7 conv3x3 implicit-GEMM headline vs control"
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

log "4/7 per-site conv3x3 microbench"
timeout 3600 python -u tools/conv_bench.py --batch 128 \
    > "$OUT/conv_sites.log" 2>&1
log "conv_sites rc=$?"

log "5/7 training table: bs8 / bs64+remat / bs128+remat-fine"
timeout 2400 python -u bench.py --mode train --size 480 \
    --batches 8 > "$OUT/train_bs8.log" 2>&1
log "train_bs8 rc=$?"
timeout 2400 python -u bench.py --mode train --size 480 --remat \
    --batches 64 > "$OUT/train_bs64_remat.log" 2>&1
log "train_bs64 rc=$?"
timeout 3600 python -u bench.py --mode train --size 480 --remat-fine \
    --batches 128 > "$OUT/train_bs128_rematfine.log" 2>&1
log "train_bs128 rc=$?"

log "6/7 batch-256 headline probe"
timeout 2400 python -u bench.py --mode inference --batches 256 \
    > "$OUT/bs256.log" 2>&1
log "bs256 rc=$?"

log "7/7 full default bench capture"
timeout 4500 python -u bench.py > "$OUT/bench_all.log" 2>&1
log "bench_all rc=$?"

echo done > "$OUT/DONE"
log "ALL DONE"
