#!/bin/bash
# Round-3 queue 9: exploitation of the queue-6/8 compiler-option findings.
#   1. stack the three individually-positive knobs (rwb_fusion=false,
#      aggressive loop-fusion layout opt, licm inflation 2.0) on top of the
#      vmem-64M default and confirm the single-knob rwb_off win
#   2. train-table rows with the _jit_train fix (train programs compile
#      with compiler defaults — the scoped-VMEM option was SIGKILLing the
#      remote compile helper on the unrolled train chains, queue-6 logs)
#   3. CLIPSeg + text pillars with EGM_COMPILER_OPTIONS=none — the vmem-64M
#      default was tuned on the EGM program; check it isn't taxing the
#      other pillars (clipseg_q6 measured 1232 vs 1392 earlier)
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q9] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }
metric() { grep -h '"metric"' "$1" 2>/dev/null | tail -1; }

V=xla_tpu_scoped_vmem_limit_kib=65536
R=xla_tpu_rwb_fusion=false
L=xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
I=xla_tpu_licm_size_inflation_ratio=2.0

log "1/3 stacked compiler-option combos (batch 128)"
for combo in \
  "rwb_confirm:$V,$R" \
  "rwb_layout:$V,$R,$L" \
  "rwb_layout_licm:$V,$R,$L,$I" \
  ; do
  tag=${combo%%:*}; opts=${combo#*:}
  EGM_COMPILER_OPTIONS="$opts" timeout 2400 python -u bench.py \
      --mode inference --batches 128 > "$OUT/stack_${tag}.log" 2>&1
  log "stack_$tag rc=$? $(metric "$OUT/stack_${tag}.log")"
done

log "2/3 train table with the _jit_train fix (compiler defaults)"
timeout 2400 python -u bench.py --mode train --size 480 --batches 8 \
    > "$OUT/train_bs8_q9.log" 2>&1
log "train_bs8 rc=$? $(metric "$OUT/train_bs8_q9.log")"
timeout 3600 python -u bench.py --mode train --size 480 --remat --batches 64 \
    > "$OUT/train_bs64_q9.log" 2>&1
log "train_bs64 rc=$? $(metric "$OUT/train_bs64_q9.log")"
timeout 3600 python -u bench.py --mode train --size 480 --remat \
    --grad-accum 2 --batches 128 --n1 1 --n2 4 \
    > "$OUT/train_bs128_accum_q9.log" 2>&1
log "train_bs128_accum rc=$? $(metric "$OUT/train_bs128_accum_q9.log")"

log "3/3 clipseg + text with options=none"
EGM_COMPILER_OPTIONS=none timeout 2400 python -u bench.py --mode clipseg \
    --size 352 --attn-impls pallas --batches 16 --n2 8 \
    > "$OUT/clipseg_noopts_q9.log" 2>&1
log "clipseg_noopts rc=$? $(metric "$OUT/clipseg_noopts_q9.log")"
EGM_COMPILER_OPTIONS=none timeout 1800 python -u bench.py --mode text \
    --batches 64 > "$OUT/text_noopts_q9.log" 2>&1
log "text_noopts rc=$? $(metric "$OUT/text_noopts_q9.log")"

echo done > "$OUT/Q9_DONE"
log "Q9 ALL DONE"
