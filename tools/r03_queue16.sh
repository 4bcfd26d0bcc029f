#!/bin/bash
# Round-3 queue 16 (new session): gate on tunnel health, then
#   1) the queue-15 redos lost to the compile-service outage
#      (fusion-eval direct wall-clock, inference profile, train profile),
#   2) the FULL 200-epoch on-chip training proofs (VERDICT r2 item 2 asked
#      for the complete reference recipe; the prior session committed 48
#      epochs bs8 / 30 epochs bs64 before the outage),
#   3) on-chip fine-tune proofs for the other two pillars (CLIPSeg decoder
#      BCE loop, Long-CLIP contrastive loop) — loss-decreasing artifacts,
#   4) a fresh full bench capture at the shipping config.
set -u
OUT=/root/repo/runs/r03_master
PROOF=/root/repo/runs/r03_train_proof_full
mkdir -p "$OUT" "$PROOF"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q16] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue16.log"; }

log "waiting for tunnel health (trivial op, probe every 5 min, max 10 h)"
healthy=0
for i in $(seq 1 120); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1; then
    log "tunnel healthy after probe $i"
    healthy=1
    break
  fi
  sleep 300
done
[ "$healthy" = 1 ] || { log "tunnel never recovered; giving up"; exit 1; }

log "1/8 fusion eval direct run (q15 redo)"
timeout 2400 python -u -c "
from egm_unet_tpu.cli.eval_clipseg import main
main(['--synthetic','--model','egm_unet','--base-c','32',
      '--clip-batch','16','--unet-batch','8',
      '--save-result','/tmp/bench_fusion',
      '--alpha-file','/tmp/bench_fusion_alpha.txt'])
" > "$OUT/fusion_direct_q16.log" 2>&1
log "fusion_direct rc=$?"
tail -4 "$OUT/fusion_direct_q16.log" | tee -a "$OUT/queue16.log"

log "2/8 inference profile at shipping config (q15 redo)"
timeout 2400 python -u tools/profile_egm.py --batch 128 \
    > "$OUT/profile_q16.log" 2>&1
log "profile rc=$?"
tail -20 "$OUT/profile_q16.log" | tee -a "$OUT/queue16.log"

log "3/8 train profile bs64 remat 480px (q15 redo)"
timeout 2400 python -u tools/profile_train.py --batch 64 --size 480 --remat \
    > "$OUT/profile_train_q16.log" 2>&1
log "profile_train rc=$?"
tail -25 "$OUT/profile_train_q16.log" | tee -a "$OUT/queue16.log"

log "4/8 FULL 200-epoch bs8 reference-recipe proof"
timeout 18000 python -u -c "
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
tail -6 "$PROOF/bs8_log.txt" | tee -a "$OUT/queue16.log"

log "5/8 FULL 200-epoch bs64+remat lr-scaled proof"
timeout 18000 python -u -c "
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
tail -6 "$PROOF/bs64_log.txt" | tee -a "$OUT/queue16.log"

log "6/8 CLIPSeg decoder fine-tune proof (synthetic PhraseCut, full ViT-B/16)"
timeout 7200 python -u -c "
from egm_unet_tpu.cli.train_clipseg import main
main(['--synthetic', '--steps', '200', '-b', '16', '--print-freq', '10',
      '--save-dir', '$PROOF/clipseg_ckpt'])
" > "$PROOF/clipseg_ft_log.txt" 2>&1
log "clipseg_ft rc=$?"
tail -8 "$PROOF/clipseg_ft_log.txt" | tee -a "$OUT/queue16.log"

log "7/8 Long-CLIP fine-tune proof (synthetic triples, full ViT-B/16, 248 ctx)"
timeout 7200 python -u -c "
from egm_unet_tpu.cli.train_longclip import main
main(['--synthetic', '--steps', '200', '-b', '16', '--print-freq', '10',
      '--save-dir', '$PROOF/longclip_ckpt'])
" > "$PROOF/longclip_ft_log.txt" 2>&1
log "longclip_ft rc=$?"
tail -8 "$PROOF/longclip_ft_log.txt" | tee -a "$OUT/queue16.log"

log "8/8 fresh full bench capture at the shipping config"
timeout 7200 python -u bench.py --mode all > "$OUT/bench_all_q16.log" 2>&1
log "bench rc=$?"
grep '"metric"' "$OUT/bench_all_q16.log" | tee -a "$OUT/queue16.log"

echo done > "$OUT/Q16_DONE"
log "Q16 ALL DONE"
