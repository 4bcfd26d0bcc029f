#!/bin/bash
# Round-4 training proof (VERDICT r3 "Next round" #3 + #4):
#
#   (probe dropped: the CPU smoke showed epoch-1 dice 0.28 on the hard
#    task vs 0.991 on the easy one; main's first eval blocks give the
#    full-scale check within minutes of launch.)
#   main     : the reference recipe (EGM A+B+C, bs8 480^2 crops, 200 epochs,
#              SGD lr .02 warmup-poly, CE[1,2]+dice+edge losses — ref:
#              train.py:115-118,135-164) on hard synthetic 876/52 (val split
#              DISJOINT by seed offset).  Checkpoints every 10 epochs; the
#              first invocation is deliberately KILLED after ~18 min and the
#              loop auto-resumes from the latest orbax checkpoint — the
#              restart-proof demonstration r03 lacked (epoch numbering must
#              continue in the results-txt).
#   ctl_ce   : wrong recipe #1 — CE only (--no-aux-losses), 48 epochs.
#   ctl_lr   : wrong recipe #2 — lr 0.2 (10x reference), 48 epochs.
#   ctl_unet : vanilla UNet (no A/B/C modules), reference recipe, 48 epochs.
#
# Expected outcome (the on-TPU analogue of the reference's ablation ordering,
# record/TP-Dataset-928: A+B+C best at mIoU 93.8): recipe > controls, EGM >=
# UNet, visible in the per-epoch dice curves.
set -u
OUT=${1:-/root/repo/runs/r04_proof}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[proof] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/proof.log"; }

# serialize behind queue 2 (single chip): wait up to 3h for Q2_DONE
for i in $(seq 1 360); do
  [ -f /root/repo/runs/r04/Q2_DONE ] && break
  sleep 30
done

COMMON="'--synthetic', '--synthetic-hard', '--synthetic-n', '876',
        '--synthetic-val-n', '52', '--synthetic-size', '480',
        '--eval-size', '565', '--val-batch-size', '4',
        '--base-c', '32', '--batch-size', '8', '--amp',
        '--steps-per-dispatch', '10', '--wire-uint8', '--print-freq', '50'"

run_train() {  # run_train <timeout> <logfile> <extra python-list items...>
  local to=$1 lf=$2; shift 2
  timeout "$to" python -u -c "
from egm_unet_tpu.cli.train import main
main([$COMMON, $*])
" >> "$lf" 2>&1
  return $?
}

epochs_done() {  # count eval blocks in a results file
  grep -c "^\[epoch:" "$1" 2>/dev/null || echo 0
}

# ---- main: 200-epoch restart-proof run
MAIN="'--model', 'egm_unet', '--epochs', '200', '--lr', '0.02', '--save-every', '10', '--save-dir', '$OUT/main_ckpt', '--results-file', '$OUT/main_results.txt'"
log "main: first invocation (deliberate kill after 1500s)"
run_train 1500 "$OUT/main_log.txt" "$MAIN"
log "main first rc=$? (124/137 = the deliberate kill); epochs so far: $(epochs_done "$OUT/main_results.txt")"

for attempt in 1 2 3 4 5; do
  done_n=$(epochs_done "$OUT/main_results.txt")
  if [ "$done_n" -ge 200 ]; then break; fi
  log "main: resume attempt $attempt from $done_n epochs"
  run_train 10000 "$OUT/main_log.txt" "$MAIN, '--resume', '$OUT/main_ckpt'"
  log "main resume rc=$?; epochs: $(epochs_done "$OUT/main_results.txt")"
done
log "main finished with $(epochs_done "$OUT/main_results.txt") epochs"

# ---- controls (48 epochs each)
log "ctl_ce: CE-only control"
run_train 4800 "$OUT/ctl_ce_log.txt" "'--model', 'egm_unet', '--epochs', '40', '--lr', '0.02', '--no-aux-losses', '--save-dir', '$OUT/ctl_ce_ckpt', '--results-file', '$OUT/ctl_ce_results.txt'"
log "ctl_ce rc=$?"

log "ctl_unet: vanilla UNet"
run_train 4800 "$OUT/ctl_unet_log.txt" "'--model', 'unet', '--epochs', '40', '--lr', '0.02', '--save-dir', '$OUT/ctl_unet_ckpt', '--results-file', '$OUT/ctl_unet_results.txt'"
log "ctl_unet rc=$?"

log "ctl_lr: lr 0.2 control"
run_train 4800 "$OUT/ctl_lr_log.txt" "'--model', 'egm_unet', '--epochs', '40', '--lr', '0.2', '--save-dir', '$OUT/ctl_lr_ckpt', '--results-file', '$OUT/ctl_lr_results.txt'"
log "ctl_lr rc=$?"

# ---- curve artifacts
for tag in main ctl_ce ctl_lr ctl_unet; do
  python tools/train_curves.py "$OUT/${tag}_results.txt" 2>>"$OUT/proof.log" || true
done

echo done > "$OUT/DONE"
log "PROOF ALL DONE"
