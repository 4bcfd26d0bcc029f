#!/bin/bash
# Round-3 final queue.  Waits for queue2 (bs64 proof attempt + training
# table + batch probes + bench_all) to finish, then:
#   1. compiler-options probe (jax.jit(compiler_options=...) — the only
#      channel to the remote TPU compiler; client XLA_FLAGS is fatal)
#   2. if accepted: scoped-VMEM headline benches via EGM_COMPILER_OPTIONS
#   3. resume the bs64 training proof from its latest checkpoint to 48
#      epochs (queue2's attempt dies at its 14000s timeout ~epoch 20)
set -u
OUT=/root/repo/runs/r03_master
PROOF=/root/repo/runs/r03_train_proof
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q5] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }

log "waiting on queue2 DONE"
while [ ! -f "$OUT/DONE" ]; do sleep 60; done
log "queue2 done; starting"

log "1/3 compiler-options probe"
timeout 1200 python -u tools/compiler_options_probe.py \
    > "$OUT/compiler_options_probe.log" 2>&1
PROBE_RC=$?
log "probe rc=$PROBE_RC"
cat "$OUT/compiler_options_probe.log" >> "$OUT/queue.log"

if [ "$PROBE_RC" -eq 0 ]; then
  log "2/3 scoped-VMEM headline benches"
  for kib in 65536 98304; do
    EGM_COMPILER_OPTIONS="xla_tpu_scoped_vmem_limit_kib=$kib" \
      timeout 2400 python -u bench.py --mode inference --batches 128 \
      > "$OUT/vmem_${kib}.log" 2>&1
    log "vmem_$kib rc=$? $(grep -h '"metric"' "$OUT/vmem_${kib}.log" | tail -1)"
  done
else
  log "2/3 skipped (no compiler option accepted)"
fi

log "2.5/3 bs128 remat-fine retry with short timing chain"
# the default 2/12-step chained program OOM-kills the REMOTE COMPILER
# (tpu_compile_helper SIGKILL, runs/r03_master/train_bs128_rematfine.log)
# — per-conv remat at bs128 x 12 unrolled steps is too big a module to
# compile; a 1/3-step chain quarters the program size
timeout 3600 python -u bench.py --mode train --size 480 --remat-fine \
    --batches 128 --n1 1 --n2 3 > "$OUT/train_bs128_short.log" 2>&1
log "bs128_short rc=$? $(grep -h '"metric"' "$OUT/train_bs128_short.log" | tail -1)"

log "3/3 bs64 proof resume (latest ckpt -> 48 epochs)"
# the killed run re-appends epochs from ckpt+1: drop any blocks at or past
# the resume point so the results file stays one monotonic sequence
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
timeout 28000 python -u -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '64',
      '--epochs', '48', '--lr', '0.16', '--amp', '--remat',
      '--steps-per-dispatch', '13', '--wire-uint8',
      '--print-freq', '13',
      '--resume', '$PROOF/bs64_ckpt',
      '--save-dir', '$PROOF/bs64_ckpt',
      '--results-file', '$PROOF/bs64_results.txt'])
" >> "$PROOF/bs64_log.txt" 2>&1
log "bs64 resume rc=$?"

echo done > "$OUT/Q5_DONE"
log "Q5 ALL DONE"
