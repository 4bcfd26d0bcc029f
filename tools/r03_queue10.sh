#!/bin/bash
# Round-3 queue 10: lock in the round-3 shipping configuration.
#   1. wave-3 compiler-options probe (fail-fast acceptance)
#   2. EGM headline with the NEW baked defaults (vmem-64M + rwb_fusion=false,
#      env unset) — the BENCH_r03-representative capture
#   3. compiled-kernel parity at the new defaults
#   4. clipseg + text through the new per-program scoping (env unset; the
#      plain jit path should reproduce the options=none numbers)
#   5. any wave-3 accepts that look promising get measured on top of the
#      new defaults (manual follow-up)
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q10] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }
metric() { grep -h '"metric"' "$1" 2>/dev/null | tail -1; }

log "1/4 wave-3 compiler-options probe"
timeout 2400 python -u tools/compiler_options_probe.py > "$OUT/probe3.log" 2>&1
log "probe3 rc=$?"
grep -E '^(ACCEPT|REJECT)' "$OUT/probe3.log" | tail -14 | tee -a "$OUT/queue.log"

log "2/4 EGM headline with new baked defaults (env unset)"
timeout 2400 python -u bench.py --mode inference --batches 128 \
    > "$OUT/headline_r03_final.log" 2>&1
log "headline_r03_final rc=$? $(metric "$OUT/headline_r03_final.log")"

log "3/4 compiled-kernel parity at new defaults"
timeout 2400 python -u bench.py --verify-kernels --mode inference \
    --batches 16 --n1 1 --n2 2 > "$OUT/verify_q10.log" 2>&1
log "verify rc=$? (details in verify_q10.log)"

log "4/4 clipseg + text via the per-program scoping (env unset)"
timeout 2400 python -u bench.py --mode clipseg --size 352 \
    --attn-impls pallas --batches 16 --n2 8 > "$OUT/clipseg_q10.log" 2>&1
log "clipseg rc=$? $(metric "$OUT/clipseg_q10.log")"
timeout 1800 python -u bench.py --mode text --batches 64 \
    > "$OUT/text_q10.log" 2>&1
log "text rc=$? $(metric "$OUT/text_q10.log")"

echo done > "$OUT/Q10_DONE"
log "Q10 ALL DONE"
