#!/bin/bash
# Round-3 second chip-measurement queue: runs after tools/r03_chip_queue.sh
# (waits on its DONE sentinel).  Gathers the data needed to pick the final
# shipping config for BENCH_r03:
#   1. per-site conv3x3 microbenchmark (xla vs dots vs implicit-GEMM pallas)
#      at batch 128 — decides EGM_CONV_SITES for the headline
#   2. batch-256 probe of the bf16 inference headline (amortizes fixed
#      overhead further if HBM fits: 256*512^2*32ch bf16 activations)
#
# Usage: tools/r03_chip_queue2.sh [queue1_outdir] [outdir]
set -u
Q1=${1:-/root/repo/runs/r03_chip}
OUT=${2:-/root/repo/runs/r03_chip2}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p "$OUT"

echo "[queue2] waiting on $Q1/DONE" | tee "$OUT/queue.log"
while [ ! -f "$Q1/DONE" ]; do sleep 60; done
sleep 30
echo "[queue2] chip free at $(date -u +%H:%M:%S); starting" | tee -a "$OUT/queue.log"

echo "[queue2] 1/2 per-site conv3x3 microbench" | tee -a "$OUT/queue.log"
timeout 3600 python -u tools/conv_bench.py --batch 128 \
    > "$OUT/conv_sites.log" 2>&1
echo "[queue2] conv_sites rc=$?" | tee -a "$OUT/queue.log"

echo "[queue2] 2/2 batch-256 headline probe" | tee -a "$OUT/queue.log"
timeout 2400 python -u bench.py --mode inference --batches 256 \
    > "$OUT/bs256.log" 2>&1
echo "[queue2] bs256 rc=$?" | tee -a "$OUT/queue.log"

echo "[queue2] done" > "$OUT/DONE"
