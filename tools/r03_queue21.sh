#!/bin/bash
# Round-3 queue 21: lean re-run of the q20 items that never executed (the VM
# restarted before q20 started), bounded for a ~1h session:
#   1) int8df selective-site wave (the int8-dataflow serving mode from
#      a6c1028 has never been chip-measured) + agreement at the best config
#   2) Long-CLIP fine-tune proof (validates the decay_steps guard on chip)
#   3) CLIPSeg decoder fine-tune proof (validates the differentiable-CSA fix)
#   4) fresh EGM headline capture
# The FULL 200-epoch proofs are dropped: they cannot fit this session and the
# committed 118-epoch bs8 artifact (dice 0.996) already proves the recipe.
set -u
OUT=/root/repo/runs/r03_master
PROOF=/root/repo/runs/r03_train_proof_full
mkdir -p "$OUT" "$PROOF"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q21] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue21.log"; }

wait_healthy() {
  for i in $(seq 1 20); do
    if timeout 300 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1; then
      log "tunnel healthy (probe $i)"; return 0
    fi
    sleep 60
  done
  log "tunnel never recovered"; return 1
}

wait_healthy || exit 1

run_int8df() {  # run_int8df <tag> <sites> <extra...>
  local tag=$1 sites=$2; shift 2
  log "int8df sites=$sites"
  EGM_QSTORE_SITES="$sites" timeout 1500 python -u bench.py --mode int8df \
      --headline-batches 128 "$@" > "$OUT/int8df_${tag}_q21.log" 2>&1
  log "rc=$?"
  grep -E '"metric"' "$OUT/int8df_${tag}_q21.log" | tail -1 | tee -a "$OUT/queue21.log"
}

log "1/4 int8df selective-site wave"
run_int8df barrier_sites "mca:,egrfb:" --no-agreement
run_int8df pools ":pool" --no-agreement
run_int8df barrier_plus_pools "mca:,egrfb:,:pool" --no-agreement
best=$(grep -h '"value"' "$OUT"/int8df_*_q21.log 2>/dev/null \
       | sed 's/.*"value": \([0-9.]*\).*/\1/' | sort -g | tail -1)
log "best selective int8df: ${best:-none}"
log "agreement check at barrier_plus_pools"
EGM_QSTORE_SITES="mca:,egrfb:,:pool" timeout 1500 python -u bench.py \
    --mode int8df --headline-batches 128 > "$OUT/int8df_bpp_agree_q21.log" 2>&1
log "rc=$?"
grep -E '"metric"|agreement' "$OUT/int8df_bpp_agree_q21.log" | tail -2 | tee -a "$OUT/queue21.log"
sleep 30

log "2/4 Long-CLIP fine-tune proof (32 fixed triples, lr 1e-4)"
timeout 2400 python -u -c "
from egm_unet_tpu.cli.train_longclip import main
main(['--synthetic', '--synthetic-fixed', '32', '--steps', '300',
      '--lr', '1e-4', '--warmup-steps', '20', '-b', '16', '--print-freq', '10',
      '--save-dir', '$PROOF/longclip_ckpt'])
" > "$PROOF/longclip_ft_log.txt" 2>&1
log "longclip_ft rc=$?"
grep -E "^step" "$PROOF/longclip_ft_log.txt" | head -3 | tee -a "$OUT/queue21.log"
grep -E "^step" "$PROOF/longclip_ft_log.txt" | tail -3 | tee -a "$OUT/queue21.log"
sleep 30

log "3/4 CLIPSeg decoder fine-tune proof (64 fixed samples, 200 steps)"
timeout 2400 python -u -c "
from egm_unet_tpu.cli.train_clipseg import main
main(['--synthetic', '--synthetic-n', '64', '--epochs', '50', '--steps', '200',
      '-b', '16', '--print-freq', '1',
      '--save-dir', '$PROOF/clipseg_ckpt'])
" > "$PROOF/clipseg_ft_log.txt" 2>&1
log "clipseg_ft rc=$?"
grep -E "fgIoU|loss" "$PROOF/clipseg_ft_log.txt" | head -3 | tee -a "$OUT/queue21.log"
grep -E "fgIoU|loss" "$PROOF/clipseg_ft_log.txt" | tail -3 | tee -a "$OUT/queue21.log"
sleep 30

wait_healthy || exit 1
log "4/4 fresh EGM headline capture (shipping config)"
timeout 1500 python -u bench.py --mode inference --batches 128 \
    > "$OUT/headline_q21.log" 2>&1
log "rc=$?"
grep -E '"metric"' "$OUT/headline_q21.log" | tee -a "$OUT/queue21.log"

echo done > "$OUT/Q21_DONE"
log "Q21 ALL DONE"
