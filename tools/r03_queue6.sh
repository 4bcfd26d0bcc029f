#!/bin/bash
# Round-3 queue 6: compiler-option exploitation pass.  Waits for queue5
# (bs64 proof resume) so the chip is uncontended, then:
#   1. extended compiler-options probe (second-wave candidates)
#   2. headline benches: baked-in default (vmem 64M) reproduction, then
#      each accepted promising combo on top of it
#   3. batch sweep at the best option set
#   4. int8 / clipseg / text pillars with the new defaults
#   5. train-table spot checks (bs8, bs64+remat) with the new defaults
#   6. compiled-kernel parity with the new defaults
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q6] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }
metric() { grep -h '"metric"' "$1" 2>/dev/null | tail -1; }

log "waiting on Q5_DONE"
while [ ! -f "$OUT/Q5_DONE" ]; do sleep 60; done
log "queue5 done; starting"

log "1/6 extended compiler-options probe"
timeout 2400 python -u tools/compiler_options_probe.py \
    > "$OUT/probe2.log" 2>&1
log "probe2 rc=$?"
grep -E '^(ACCEPT|REJECT)' "$OUT/probe2.log" | tee -a "$OUT/queue.log"

log "2/6 headline with baked-in default options (env unset)"
timeout 2400 python -u bench.py --mode inference --batches 128 \
    > "$OUT/headline_default.log" 2>&1
log "headline_default rc=$? $(metric "$OUT/headline_default.log")"

# combos on top of the 64M scoped-vmem win — only accepted options get run
run_combo() {  # name, options-string
  if grep -q "^ACCEPT ${2##*,}" "$OUT/probe2.log" || \
     grep -q "ACCEPT.*${2##*,}" "$OUT/probe2.log"; then
    EGM_COMPILER_OPTIONS="$2" timeout 2400 python -u bench.py \
        --mode inference --batches 128 > "$OUT/combo_$1.log" 2>&1
    log "combo_$1 rc=$? $(metric "$OUT/combo_$1.log")"
  else
    log "combo_$1 skipped (option rejected)"
  fi
}
run_combo layoutopt "xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"
run_combo nolhs     "xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_enable_latency_hiding_scheduler=false"
run_combo vmem48    "xla_tpu_scoped_vmem_limit_kib=49152"
run_combo vmem80    "xla_tpu_scoped_vmem_limit_kib=81920"
run_combo vmem128   "xla_tpu_scoped_vmem_limit_kib=131072"

log "3/6 batch sweep at default options"
timeout 3600 python -u bench.py --mode inference --batches 96,160 \
    > "$OUT/batch_sweep_q6.log" 2>&1
log "batch_sweep rc=$? $(metric "$OUT/batch_sweep_q6.log")"

log "4/6 int8 + clipseg + text pillars with default options"
timeout 2400 python -u bench.py --mode int8 --no-agreement \
    > "$OUT/int8_q6.log" 2>&1
log "int8 rc=$? $(metric "$OUT/int8_q6.log")"
timeout 2400 python -u bench.py --mode clipseg --size 352 \
    --attn-impls pallas --batches 16,64 --n2 8 > "$OUT/clipseg_q6.log" 2>&1
log "clipseg rc=$? $(metric "$OUT/clipseg_q6.log")"
timeout 1800 python -u bench.py --mode text --batches 64,256 \
    > "$OUT/text_q6.log" 2>&1
log "text rc=$? $(metric "$OUT/text_q6.log")"

log "5/6 train-table spot checks with default options"
timeout 2400 python -u bench.py --mode train --size 480 --batches 8 \
    > "$OUT/train_bs8_q6.log" 2>&1
log "train_bs8 rc=$? $(metric "$OUT/train_bs8_q6.log")"
timeout 3600 python -u bench.py --mode train --size 480 --remat --batches 64 \
    > "$OUT/train_bs64_q6.log" 2>&1
log "train_bs64 rc=$? $(metric "$OUT/train_bs64_q6.log")"
# bs 128 via gradient accumulation (2 x 64 microbatches, one optimizer
# update): the monolithic bs-128 backward OOMs even with per-conv remat
timeout 3600 python -u bench.py --mode train --size 480 --remat \
    --grad-accum 2 --batches 128 --n1 1 --n2 4 \
    > "$OUT/train_bs128_accum_q6.log" 2>&1
log "train_bs128_accum rc=$? $(metric "$OUT/train_bs128_accum_q6.log")"

log "6/6 compiled-kernel parity with default options"
timeout 2400 python -u bench.py --verify-kernels --mode inference \
    --batches 16 --n1 1 --n2 2 > "$OUT/verify_q6.log" 2>&1
log "verify rc=$? (details in verify_q6.log)"

echo done > "$OUT/Q6_DONE"
log "Q6 ALL DONE"
