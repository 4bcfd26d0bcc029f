#!/bin/bash
# Round-3 queue 8: waits for queue6 (compiler-options exploitation), then
#   1. EGM_UP_LAYOUT sweep — pin the decoder resize-output layout via
#      with_layout_constraint (ops/resize.py knob) at the headline shape:
#      conv-preferred C-minor-major ("1,2,0,3") and W-minor ("0,1,3,2")
#      vs the XLA-chosen default, on top of the best compiler options
#   2. resume the bs64 training proof to a bounded target (epoch 30;
#      the 48-epoch target is host/tunnel-bound at ~20 min/epoch and the
#      curve saturated by epoch 13 — dice 0.993)
set -u
OUT=/root/repo/runs/r03_master
PROOF=/root/repo/runs/r03_train_proof
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q8] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }
metric() { grep -h '"metric"' "$1" 2>/dev/null | tail -1; }

log "waiting on Q6_DONE"
while [ ! -f "$OUT/Q6_DONE" ]; do sleep 60; done
log "queue6 done; starting"

log "1/3 fusion-knob sweep on top of the vmem-64M default (probe2 accepts)"
V=xla_tpu_scoped_vmem_limit_kib=65536
for combo in \
  "rwb_off:$V,xla_tpu_rwb_fusion=false" \
  "mlnest:$V,xla_tpu_enable_multi_level_nested_loop_fusion=true" \
  "bundle:$V,xla_tpu_use_bundle_aware_cost_model_for_fusions=true" \
  "expcost:$V,xla_tpu_enable_experimental_fusion_cost_model=true" \
  "v2vdma:$V,xla_tpu_enable_vmem_to_vmem_dmas=true" \
  "licm2:$V,xla_tpu_licm_size_inflation_ratio=2.0" \
  "copybw:$V,xla_tpu_async_copy_bandwidth_scaling_factor=1.5" \
  ; do
  tag=${combo%%:*}; opts=${combo#*:}
  EGM_COMPILER_OPTIONS="$opts" timeout 2400 python -u bench.py \
      --mode inference --batches 128 > "$OUT/fuse_${tag}.log" 2>&1
  log "fuse_$tag rc=$? $(metric "$OUT/fuse_${tag}.log")"
done

log "2/3 EGM_UP_LAYOUT sweep (batch 128 headline)"
for spec in "1,2,0,3" "0,1,3,2"; do
  tag=$(echo "$spec" | tr ',' '_')
  EGM_UP_LAYOUT="$spec" timeout 2400 python -u bench.py --mode inference \
      --batches 128 > "$OUT/uplayout_${tag}.log" 2>&1
  log "uplayout_$tag rc=$? $(metric "$OUT/uplayout_${tag}.log")"
done

log "3/3 bs64 proof resume (latest ckpt -> epoch 30)"
LATEST=$(ls "$PROOF/bs64_ckpt" | grep -E '^[0-9]+$' | sort -n | tail -1)
log "resuming from checkpoint epoch $LATEST"
python - "$LATEST" <<'EOF'
import sys
resume_from = int(sys.argv[1]) + 1
p = "/root/repo/runs/r03_train_proof/bs64_results.txt"
txt = open(p).read()
cut = txt.find(f"[epoch: {resume_from}]")
if cut != -1:
    open(p, "w").write(txt[:cut])
    print(f"trimmed results at epoch {resume_from}")
EOF
timeout 21000 python -u -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '64',
      '--epochs', '30', '--lr', '0.16', '--amp', '--remat',
      '--steps-per-dispatch', '13', '--wire-uint8',
      '--print-freq', '13',
      '--resume', '$PROOF/bs64_ckpt',
      '--save-dir', '$PROOF/bs64_ckpt',
      '--results-file', '$PROOF/bs64_results.txt'])
" >> "$PROOF/bs64_log.txt" 2>&1
log "bs64 resume rc=$?"

echo done > "$OUT/Q8_DONE"
log "Q8 ALL DONE"
