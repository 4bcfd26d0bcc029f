#!/bin/bash
# Round-3 queue 7: relaunch after session restart killed queue5 mid-proof.
#   1. resume the bs64 training proof from its latest checkpoint (epoch 12)
#      to 48 epochs, trimming any re-appended results blocks first
#   2. write Q5_DONE so queue6 (compiler-option exploitation) proceeds
set -u
OUT=/root/repo/runs/r03_master
PROOF=/root/repo/runs/r03_train_proof
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q7] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue.log"; }

log "1/2 bs64 proof resume (latest ckpt -> 48 epochs)"
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
log "2/2 Q5_DONE written; queue6 may proceed"
