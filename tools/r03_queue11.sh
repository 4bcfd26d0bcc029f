#!/bin/bash
# Round-3 queue 11: measure the wave-3 probe accepts on top of the shipping
# defaults (vmem-64M + rwb_fusion=false).  Candidates chosen because they
# target the two known profile costs — decoder layout copies (copy fusion,
# memory scheduler) and window-tap recompute duplication (fusion-dup
# reduction), plus VMEM/MSA knobs adjacent to the measured vmem-64M win.
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q11] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }
metric() { grep -h '"metric"' "$1" 2>/dev/null | tail -1; }

log "waiting on Q10_DONE"
while [ ! -f "$OUT/Q10_DONE" ]; do sleep 60; done
log "queue10 done; starting"

D="xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_rwb_fusion=false"
for combo in \
  "scavenge:$D,xla_tpu_scavenge_vmem_for_fusions=true" \
  "copyfuse:$D,xla_tpu_enable_copy_fusion=true" \
  "nodupfuse:$D,xla_tpu_reduce_loop_fusion_dup_with_unfusable_user=true" \
  "memloop:$D,xla_tpu_memory_bound_loop_optimizer_options=enabled:true" \
  "optbarrier:$D,xla_tpu_aggressive_opt_barrier_removal=true" \
  "memsched:$D,xla_memory_scheduler=list" \
  "vmemoffset:$D,xla_tpu_allocate_scoped_vmem_at_same_offset=false" \
  ; do
  tag=${combo%%:*}; opts=${combo#*:}
  EGM_COMPILER_OPTIONS="$opts" timeout 2400 python -u bench.py \
      --mode inference --batches 128 > "$OUT/w3_${tag}.log" 2>&1
  log "w3_$tag rc=$? $(metric "$OUT/w3_${tag}.log")"
done

echo done > "$OUT/Q11_DONE"
log "Q11 ALL DONE"
