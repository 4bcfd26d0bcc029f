#!/bin/bash
# Round-4 queue 3 (optional, end of session): CLIPSeg compiler-options
# mini-sweep (VERDICT r3 next #6c) — the EGM-tuned options HURT CLIPSeg
# (1232 vs 1357 img/s, q9 logs), so its own optimum has never been probed.
set -u
OUT=/root/repo/runs/r04
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "[q3] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue3.log"; }

run_cs() {  # run_cs <tag> <opts>
  log "clipseg opts=$2"
  EGM_COMPILER_OPTIONS="$2" JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    timeout 900 python -u bench.py --mode clipseg --size 352 \
      --attn-impls pallas --batches 16,64 --n2 8 \
      > "$OUT/clipseg_opts_$1.log" 2>&1
  log "rc=$? $(grep -h '\"value\"' "$OUT/clipseg_opts_$1.log" | sed 's/.*\"value\": \([0-9.]*\).*/\1/' | tail -1)"
}
run_cs baseline "none"
run_cs vmem32 "xla_tpu_scoped_vmem_limit_kib=32768"
run_cs vmem98 "xla_tpu_scoped_vmem_limit_kib=98304"
run_cs rwb "xla_tpu_rwb_fusion=false"
run_cs vmem32_rwb "xla_tpu_scoped_vmem_limit_kib=32768,xla_tpu_rwb_fusion=false"

echo done > "$OUT/Q3_DONE"
log "Q3 ALL DONE"
