#!/bin/bash
# Round-3 queue 17: the queue-16 items that needed the fine-tune fixes
# (commit 6098d4d) plus the FULL 200-epoch on-chip proofs that queue 16
# lost to a session restart (bs8 SIGKILLed at epoch 117) and to stale HBM
# from that kill (bs64 ResourceExhausted 22 s after it).
# Order: the missing artifacts first (fine-tune proofs), then the long runs.
set -u
OUT=/root/repo/runs/r03_master
PROOF=/root/repo/runs/r03_train_proof_full
mkdir -p "$OUT" "$PROOF"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q17] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue17.log"; }

log "waiting for tunnel health (trivial op, probe every 2 min, max 2 h)"
healthy=0
for i in $(seq 1 60); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1; then
    log "tunnel healthy after probe $i"
    healthy=1
    break
  fi
  sleep 120
done
[ "$healthy" = 1 ] || { log "tunnel never recovered; giving up"; exit 1; }

log "1/4 CLIPSeg decoder fine-tune proof (synthetic PhraseCut, full ViT-B/16)"
timeout 7200 python -u -c "
from egm_unet_tpu.cli.train_clipseg import main
main(['--synthetic', '--steps', '200', '-b', '16', '--print-freq', '10',
      '--save-dir', '$PROOF/clipseg_ckpt'])
" > "$PROOF/clipseg_ft_log.txt" 2>&1
log "clipseg_ft rc=$?"
tail -8 "$PROOF/clipseg_ft_log.txt" | tee -a "$OUT/queue17.log"
sleep 60

log "2/4 Long-CLIP fine-tune proof (synthetic triples, full ViT-B/16, 248 ctx)"
timeout 7200 python -u -c "
from egm_unet_tpu.cli.train_longclip import main
main(['--synthetic', '--steps', '200', '-b', '16', '--print-freq', '10',
      '--save-dir', '$PROOF/longclip_ckpt'])
" > "$PROOF/longclip_ft_log.txt" 2>&1
log "longclip_ft rc=$?"
tail -8 "$PROOF/longclip_ft_log.txt" | tee -a "$OUT/queue17.log"
sleep 120

log "3/4 FULL 200-epoch bs8 reference-recipe proof (fresh start)"
timeout 16000 python -u -c "
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
tail -8 "$PROOF/bs8_log.txt" | tee -a "$OUT/queue17.log"
sleep 120

log "4/4 FULL 200-epoch bs64+remat lr-scaled proof (fresh start)"
timeout 16000 python -u -c "
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
tail -8 "$PROOF/bs64_log.txt" | tee -a "$OUT/queue17.log"

log "curves"
timeout 600 python tools/train_curves.py "$PROOF/bs8_results.txt" > /dev/null 2>&1
timeout 600 python tools/train_curves.py "$PROOF/bs64_results.txt" > /dev/null 2>&1

echo done > "$OUT/Q17_DONE"
log "Q17 ALL DONE"
