#!/bin/bash
# Round-3 queue 19: the on-chip proof artifacts.
#   1) CLIPSeg decoder fine-tune proof — fixed 64-sample synthetic
#      PhraseCut, 50 epochs: decreasing loss + rising fgIoU.
#   2) Long-CLIP fine-tune proof — FIXED 32-triple set (memorizable),
#      lr 1e-4: demonstrably decreasing contrastive loss.
#   3) FULL 200-epoch bs8 reference-recipe training proof.
#   4) FULL 200-epoch bs64+remat lr-scaled proof (whatever epochs fit the
#      remaining wall-clock — the results-txt records each epoch as it
#      completes).
set -u
OUT=/root/repo/runs/r03_master
PROOF=/root/repo/runs/r03_train_proof_full
mkdir -p "$OUT" "$PROOF"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q19] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue19.log"; }

log "waiting for tunnel health"
for i in $(seq 1 30); do
  timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1 && { log "healthy ($i)"; break; }
  sleep 120
done

log "1/4 CLIPSeg decoder fine-tune proof (64 fixed samples, 50 epochs)"
timeout 5400 python -u -c "
from egm_unet_tpu.cli.train_clipseg import main
main(['--synthetic', '--synthetic-n', '64', '--epochs', '50', '--steps', '200',
      '-b', '16', '--print-freq', '1',
      '--save-dir', '$PROOF/clipseg_ckpt'])
" > "$PROOF/clipseg_ft_log.txt" 2>&1
log "clipseg_ft rc=$?"
grep -E "fgIoU" "$PROOF/clipseg_ft_log.txt" | head -3 | tee -a "$OUT/queue19.log"
grep -E "fgIoU" "$PROOF/clipseg_ft_log.txt" | tail -3 | tee -a "$OUT/queue19.log"
sleep 60

log "2/4 Long-CLIP fine-tune proof (32 fixed triples, lr 1e-4)"
timeout 5400 python -u -c "
from egm_unet_tpu.cli.train_longclip import main
main(['--synthetic', '--synthetic-fixed', '32', '--steps', '300',
      '--lr', '1e-4', '--warmup-steps', '20', '-b', '16', '--print-freq', '10',
      '--save-dir', '$PROOF/longclip_ckpt'])
" > "$PROOF/longclip_ft_log.txt" 2>&1
log "longclip_ft rc=$?"
grep -E "^step" "$PROOF/longclip_ft_log.txt" | head -3 | tee -a "$OUT/queue19.log"
grep -E "^step" "$PROOF/longclip_ft_log.txt" | tail -3 | tee -a "$OUT/queue19.log"
sleep 60

log "3/4 FULL 200-epoch bs8 reference-recipe proof"
timeout 15000 python -u -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '8',
      '--epochs', '200', '--lr', '0.02', '--amp',
      '--steps-per-dispatch', '10', '--wire-uint8',
      '--print-freq', '50',
      '--save-dir', '$PROOF/bs8_ckpt',
      '--results-file', '$PROOF/bs8_results.txt'])
" > "$PROOF/bs8_log.txt" 2>&1
log "bs8 full200 rc=$?"
tail -8 "$PROOF/bs8_log.txt" | tee -a "$OUT/queue19.log"
timeout 600 python tools/train_curves.py "$PROOF/bs8_results.txt" > "$PROOF/bs8_curve_summary.md" 2>&1
sleep 120

log "4/4 FULL 200-epoch bs64+remat lr-scaled proof"
timeout 12000 python -u -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '64',
      '--epochs', '200', '--lr', '0.16', '--amp', '--remat',
      '--steps-per-dispatch', '10', '--wire-uint8',
      '--print-freq', '10',
      '--save-dir', '$PROOF/bs64_ckpt',
      '--results-file', '$PROOF/bs64_results.txt'])
" > "$PROOF/bs64_log.txt" 2>&1
log "bs64 full200 rc=$?"
tail -8 "$PROOF/bs64_log.txt" | tee -a "$OUT/queue19.log"
timeout 600 python tools/train_curves.py "$PROOF/bs64_results.txt" > "$PROOF/bs64_curve_summary.md" 2>&1

echo done > "$OUT/Q19_DONE"
log "Q19 ALL DONE"
