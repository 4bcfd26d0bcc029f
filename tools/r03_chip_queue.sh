#!/bin/bash
# Round-3 post-training chip-measurement queue.  Waits for the on-chip
# training proof (tools/train_proof.sh, pid $1) to release the TPU, then
# runs the remaining chip-gated round-3 measurements back to back so no
# chip time is idle:
#   1. compiled Pallas kernel parity on the live backend (--verify-kernels)
#      incl. the new implicit-GEMM conv3x3 kernel
#   2. EGM inference with EGM_CONV_IMPL=pallas (the untested headline lever;
#      VERDICT r2 "next round" #1)
#   3. training-throughput table refresh: bs 8/64 (+remat) and the bs-128
#      remat-fine row (VERDICT r2 #3)
#   4. a full default `python bench.py` capture for PERF.md
#
# Usage: tools/r03_chip_queue.sh <train_proof_pid> [outdir]
set -u
PROOF_PID=${1:?pid of the running train_proof.sh}
OUT=${2:-/root/repo/runs/r03_chip}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p "$OUT"

echo "[queue] waiting on train_proof pid $PROOF_PID" | tee "$OUT/queue.log"
while kill -0 "$PROOF_PID" 2>/dev/null; do sleep 60; done
# settle: let the tunnel release the device
sleep 30
echo "[queue] chip free at $(date -u +%H:%M:%S); starting" | tee -a "$OUT/queue.log"

echo "[queue] 1/4 kernel parity (compiled Mosaic vs XLA)" | tee -a "$OUT/queue.log"
timeout 2400 python bench.py --verify-kernels --mode inference \
    --batches 16 > "$OUT/verify.log" 2>&1
echo "[queue] verify rc=$?" | tee -a "$OUT/queue.log"

echo "[queue] 2/4 conv3x3 implicit-GEMM headline measurement" | tee -a "$OUT/queue.log"
EGM_CONV_IMPL=pallas timeout 3000 python bench.py --mode inference \
    --batches 128 > "$OUT/conv_pallas.log" 2>&1
echo "[queue] conv_pallas rc=$?" | tee -a "$OUT/queue.log"
# control run, same session, for tunnel-variance-free comparison
timeout 3000 python bench.py --mode inference \
    --batches 128 > "$OUT/conv_xla_control.log" 2>&1
echo "[queue] conv_xla_control rc=$?" | tee -a "$OUT/queue.log"

echo "[queue] 3/4 training table: bs8/bs64(remat) + bs128 remat-fine" | tee -a "$OUT/queue.log"
timeout 3000 python bench.py --mode train --size 480 \
    --batches 8 > "$OUT/train_bs8.log" 2>&1
echo "[queue] train_bs8 rc=$?" | tee -a "$OUT/queue.log"
timeout 3000 python bench.py --mode train --size 480 --remat \
    --batches 64 > "$OUT/train_bs64_remat.log" 2>&1
echo "[queue] train_bs64 rc=$?" | tee -a "$OUT/queue.log"
timeout 3600 python bench.py --mode train --size 480 --remat-fine \
    --batches 128 > "$OUT/train_bs128_rematfine.log" 2>&1
echo "[queue] train_bs128 rc=$?" | tee -a "$OUT/queue.log"

echo "[queue] 4/4 full default bench capture" | tee -a "$OUT/queue.log"
timeout 4500 python bench.py > "$OUT/bench_all.log" 2>&1
echo "[queue] bench_all rc=$?" | tee -a "$OUT/queue.log"

echo "[queue] done" > "$OUT/DONE"
