#!/bin/bash
# Round-3 queue 20: the consolidated run of everything queues 17-19 were
# written to capture but never executed (the VM restarted first):
#   1) CLIPSeg decoder fine-tune proof  (fixed 64-sample synthetic PhraseCut,
#      50 epochs — validates the 6098d4d differentiable-CSA fix on chip)
#   2) Long-CLIP fine-tune proof        (fixed 32-triple set, lr 1e-4 —
#      validates the schedule guard on chip)
#   3) FULL 200-epoch bs8 reference-recipe proof   (retry resumes from ckpt)
#   4) FULL 200-epoch bs64+remat lr-scaled proof   (retry resumes from ckpt)
#   5) int8df selective-site wave (q18b): barrier sites / pools / both,
#      + mask agreement at the winner
#   6) int8df greedy additions   (q18c): only if (5) beat the bf16 headline
#   7) fresh full-pillar bench capture (--mode all --verify-kernels)
set -u
OUT=/root/repo/runs/r03_master
PROOF=/root/repo/runs/r03_train_proof_full
mkdir -p "$OUT" "$PROOF"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q20] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue20.log"; }

wait_healthy() {
  for i in $(seq 1 60); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1; then
      log "tunnel healthy (probe $i)"; return 0
    fi
    sleep 120
  done
  log "tunnel never recovered"; return 1
}

wait_healthy || exit 1

log "1/7 CLIPSeg decoder fine-tune proof (64 fixed samples, 50 epochs)"
timeout 5400 python -u -c "
from egm_unet_tpu.cli.train_clipseg import main
main(['--synthetic', '--synthetic-n', '64', '--epochs', '50', '--steps', '200',
      '-b', '16', '--print-freq', '1',
      '--save-dir', '$PROOF/clipseg_ckpt'])
" > "$PROOF/clipseg_ft_log.txt" 2>&1
log "clipseg_ft rc=$?"
grep -E "fgIoU" "$PROOF/clipseg_ft_log.txt" | head -3 | tee -a "$OUT/queue20.log"
grep -E "fgIoU" "$PROOF/clipseg_ft_log.txt" | tail -3 | tee -a "$OUT/queue20.log"
sleep 60

log "2/7 Long-CLIP fine-tune proof (32 fixed triples, lr 1e-4)"
timeout 5400 python -u -c "
from egm_unet_tpu.cli.train_longclip import main
main(['--synthetic', '--synthetic-fixed', '32', '--steps', '300',
      '--lr', '1e-4', '--warmup-steps', '20', '-b', '16', '--print-freq', '10',
      '--save-dir', '$PROOF/longclip_ckpt'])
" > "$PROOF/longclip_ft_log.txt" 2>&1
log "longclip_ft rc=$?"
grep -E "^step" "$PROOF/longclip_ft_log.txt" | head -3 | tee -a "$OUT/queue20.log"
grep -E "^step" "$PROOF/longclip_ft_log.txt" | tail -3 | tee -a "$OUT/queue20.log"
sleep 60

run_train() {  # run_train <tag> <batch> <lr> <extra...>
  local tag=$1 bs=$2 lr=$3; shift 3
  local extra=("$@")
  log "FULL 200-epoch $tag proof (bs $bs, lr $lr ${extra[*]:-})"
  timeout 15000 python -u -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '$bs',
      '--epochs', '200', '--lr', '$lr', '--amp',
      '--steps-per-dispatch', '10', '--wire-uint8',
      '--print-freq', '50'] + '${extra[*]:-}'.split() +
     ['--save-dir', '$PROOF/${tag}_ckpt',
      '--results-file', '$PROOF/${tag}_results.txt'])
" > "$PROOF/${tag}_log.txt" 2>&1
  local rc=$?
  log "$tag full200 rc=$rc"
  local done_ep
  done_ep=$(grep -c "^\[epoch:" "$PROOF/${tag}_results.txt" 2>/dev/null || echo 0)
  log "$tag epochs recorded: $done_ep"
  if [ "$rc" != 0 ] && [ "$done_ep" -lt 195 ]; then
    log "$tag retry: resume from checkpoint"
    sleep 180; wait_healthy || return 1
    timeout 10000 python -u -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '$bs',
      '--epochs', '200', '--lr', '$lr', '--amp',
      '--steps-per-dispatch', '10', '--wire-uint8',
      '--print-freq', '50'] + '${extra[*]:-}'.split() +
     ['--resume', '$PROOF/${tag}_ckpt',
      '--save-dir', '$PROOF/${tag}_ckpt',
      '--results-file', '$PROOF/${tag}_results.txt'])
" >> "$PROOF/${tag}_log.txt" 2>&1
    log "$tag resume rc=$?"
  fi
  tail -8 "$PROOF/${tag}_log.txt" | tee -a "$OUT/queue20.log"
  timeout 600 python tools/train_curves.py "$PROOF/${tag}_results.txt" \
      > "$PROOF/${tag}_curve_summary.md" 2>&1
}

log "3/7 FULL 200-epoch bs8 reference-recipe proof"
run_train bs8 8 0.02
sleep 120

log "4/7 FULL 200-epoch bs64+remat lr-scaled proof"
run_train bs64 64 0.16 --remat
sleep 120

wait_healthy || exit 1
log "5/7 int8df selective-site wave"
run_int8df() {  # run_int8df <tag> <sites>
  log "int8df sites=$2"
  EGM_QSTORE_SITES="$2" timeout 2400 python -u bench.py --mode int8df \
      --headline-batches 128 --no-agreement > "$OUT/int8df_$1_q20.log" 2>&1
  log "rc=$?"
  grep -E '"metric"' "$OUT/int8df_$1_q20.log" | tail -1 | tee -a "$OUT/queue20.log"
}
run_int8df barrier_sites "mca:,egrfb:"
run_int8df pools ":pool"
run_int8df barrier_plus_pools "mca:,egrfb:,:pool"
log "agreement check at barrier_plus_pools"
EGM_QSTORE_SITES="mca:,egrfb:,:pool" timeout 2400 python -u bench.py \
    --mode int8df --headline-batches 128 > "$OUT/int8df_bpp_agree_q20.log" 2>&1
log "rc=$?"
grep -E '"metric"|agreement' "$OUT/int8df_bpp_agree_q20.log" | tail -2 | tee -a "$OUT/queue20.log"

# 6/7 greedy additions only if the best selective config beat 519.2
best=$(grep -h '"value"' "$OUT"/int8df_*_q20.log 2>/dev/null \
       | sed 's/.*"value": \([0-9.]*\).*/\1/' | sort -g | tail -1)
log "best int8df value: ${best:-none}"
if python -c "import sys; sys.exit(0 if float('${best:-0}') > 519.2 else 1)"; then
  log "6/7 int8df greedy additions on top of mca:,egrfb:,:pool"
  W="mca:,egrfb:,:pool"
  run_int8df w_fusion "$W,fusion:out"
  run_int8df w_encconv "$W,conv1:out,conv2:out"
  run_int8df w_stemdec "$W,ConvBNReLU_"
else
  log "6/7 skipped: selective int8df did not beat the bf16 headline"
fi
sleep 60

wait_healthy || exit 1
log "7/7 fresh full-pillar bench capture"
timeout 5400 python -u bench.py --mode all --verify-kernels \
    > "$OUT/bench_all_q20.log" 2>&1
log "rc=$?"
grep -E '"metric"' "$OUT/bench_all_q20.log" | tee -a "$OUT/queue20.log"

echo done > "$OUT/Q20_DONE"
log "Q20 ALL DONE"
