#!/bin/bash
# Round-4 proof finisher (replaces the tail of tools/r04_proof.sh).
#
# The original runner's 3x40-epoch controls (~2h + compiles) would overrun
# the round window and leave the chip busy when the driver benches.  This
# finisher completes the SAME plan under a hard deadline:
#   - wait for the in-flight main invocation (PID arg) to exit
#     (the 10000s timeout kill at ~epoch 160 doubles as a second
#     unplanned kill/resume demonstration),
#   - resume main until 200 epochs (VERDICT r3 next #4),
#   - controls at reduced epochs (the discriminative window on the hard
#     task is epochs 0-15; main's curve plateaus ~0.99 by epoch 10):
#       ctl_unet 25 ep  (UNet-vs-EGM comparison),
#       ctl_ce   25 ep  (wrong recipe #1: CE only, no dice/edge losses),
#       ctl_lr   10 ep  (wrong recipe #2: lr 10x, bonus if time),
#   - curve artifacts, DONE marker.
# Every stage is guarded by an absolute deadline (chip must be free before
# the driver's end-of-round bench).
set -u
OUT=${1:-/root/repo/runs/r04_proof}
WAIT_PID=${2:-21646}
DEADLINE=$(date -u -d "19:35" +%s)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[proof-fin] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/proof.log"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
epochs_done() { local c; c=$(grep -c "^\[epoch:" "$1" 2>/dev/null); echo "${c:-0}"; }

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

# ---- 1. wait out the in-flight main invocation
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
log "in-flight main exited; epochs: $(epochs_done "$OUT/main_results.txt")"

# ---- 2. resume main to 200 epochs, reserving ~4200s for the controls
MAIN="'--model', 'egm_unet', '--epochs', '200', '--lr', '0.02', '--save-every', '10', '--save-dir', '$OUT/main_ckpt', '--results-file', '$OUT/main_results.txt'"
for attempt in 2 3 4; do
  n=$(epochs_done "$OUT/main_results.txt")
  [ "$n" -ge 200 ] && break
  if [ "$(left)" -lt 2000 ]; then log "skip main resume: $(left)s left"; break; fi
  mto=$(( $(left) - 4200 )); [ "$mto" -lt 600 ] && mto=600
  log "main resume attempt $attempt from $n epochs (timeout ${mto}s)"
  run_train "$mto" "$OUT/main_log.txt" "$MAIN, '--resume', '$OUT/main_ckpt'"
  log "main resume rc=$?; epochs: $(epochs_done "$OUT/main_results.txt")"
done
log "main finished with $(epochs_done "$OUT/main_results.txt") epochs"

# ---- 3. controls (deadline-guarded; each killed at the deadline at worst)
ctl() {  # ctl <name> <need_s> <python-list items...>
  local name=$1 need=$2; shift 2
  if [ "$(left)" -lt "$need" ]; then log "skip $name: $(left)s left (< ${need}s)"; return; fi
  log "$name: start (timeout $(left)s)"
  run_train "$(left)" "$OUT/${name}_log.txt" "$@"
  log "$name rc=$?; epochs: $(epochs_done "$OUT/${name}_results.txt")"
}
ctl ctl_unet 1500 "'--model', 'unet', '--epochs', '25', '--lr', '0.02', '--save-dir', '$OUT/ctl_unet_ckpt', '--results-file', '$OUT/ctl_unet_results.txt'"
ctl ctl_ce 1500 "'--model', 'egm_unet', '--epochs', '25', '--lr', '0.02', '--no-aux-losses', '--save-dir', '$OUT/ctl_ce_ckpt', '--results-file', '$OUT/ctl_ce_results.txt'"
ctl ctl_lr 900 "'--model', 'egm_unet', '--epochs', '10', '--lr', '0.2', '--save-dir', '$OUT/ctl_lr_ckpt', '--results-file', '$OUT/ctl_lr_results.txt'"

# ---- 4. curve artifacts
for tag in main ctl_ce ctl_lr ctl_unet; do
  [ -f "$OUT/${tag}_results.txt" ] && python tools/train_curves.py "$OUT/${tag}_results.txt" 2>>"$OUT/proof.log" || true
done

echo done > "$OUT/DONE"
log "PROOF FINISHER DONE"
