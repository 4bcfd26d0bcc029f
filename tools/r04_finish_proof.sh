#!/bin/bash
# Round-4 proof finisher v2 (replaces the tail of tools/r04_proof.sh).
#
# v1's control-time reservation (mto = left-4200) would have killed the
# main resume at ~epoch 182 and burned two more 10-min recompile cycles
# advancing nothing (each kill/resume costs ~10-12 min of train+eval
# recompiles; measured pace ~62 s/epoch incl. per-epoch eval).  v2:
#   - wait for the in-flight main invocation (PID arg) to exit (its
#     runner-inherited 10000s timeout kill at ~epoch 144 doubles as a
#     second, unplanned kill/resume demonstration),
#   - ONE long main resume sized to complete all 200 epochs (VERDICT r3
#     next #4), reserving 45 min for the controls,
#   - controls in guaranteed-value order at reduced epochs (the
#     discriminative window on the hard task is epochs 0-15):
#       ctl_unet 18 ep  (UNet-vs-EGM comparison — the required ablation),
#       ctl_lr    8 ep  (wrong recipe: lr 10x — same program shape as main,
#                        so the disk compile cache can shorten its startup),
#       ctl_ce   12 ep  (wrong recipe: CE only, no dice/edge — bonus),
#   - curve artifacts, DONE marker.
# Hard deadline 19:35 UTC: the chip must be free before the driver's
# end-of-round bench.
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

# ---- 2. ONE long main resume to 200 epochs (reserve ~2700s for controls)
MAIN="'--model', 'egm_unet', '--epochs', '200', '--lr', '0.02', '--save-every', '10', '--save-dir', '$OUT/main_ckpt', '--results-file', '$OUT/main_results.txt'"
n=$(epochs_done "$OUT/main_results.txt")
if [ "$n" -lt 200 ] && [ "$(left)" -gt 1800 ]; then
  mto=$(( $(left) - 2700 )); [ "$mto" -lt 600 ] && mto=600
  log "main final resume from $n epochs (timeout ${mto}s)"
  run_train "$mto" "$OUT/main_log.txt" "$MAIN, '--resume', '$OUT/main_ckpt'"
  log "main final resume rc=$?; epochs: $(epochs_done "$OUT/main_results.txt")"
fi
log "main finished with $(epochs_done "$OUT/main_results.txt") epochs"

# ---- 3. controls (deadline-guarded; each killed at the deadline at worst)
ctl() {  # ctl <name> <need_s> <python-list items...>
  local name=$1 need=$2; shift 2
  if [ "$(left)" -lt "$need" ]; then log "skip $name: $(left)s left (< ${need}s)"; return; fi
  log "$name: start (timeout $(left)s)"
  run_train "$(left)" "$OUT/${name}_log.txt" "$@"
  log "$name rc=$?; epochs: $(epochs_done "$OUT/${name}_results.txt")"
}
ctl ctl_unet 1100 "'--model', 'unet', '--epochs', '18', '--lr', '0.02', '--save-dir', '$OUT/ctl_unet_ckpt', '--results-file', '$OUT/ctl_unet_results.txt'"
ctl ctl_lr 700 "'--model', 'egm_unet', '--epochs', '8', '--lr', '0.2', '--save-dir', '$OUT/ctl_lr_ckpt', '--results-file', '$OUT/ctl_lr_results.txt'"
ctl ctl_ce 800 "'--model', 'egm_unet', '--epochs', '12', '--lr', '0.02', '--no-aux-losses', '--save-dir', '$OUT/ctl_ce_ckpt', '--results-file', '$OUT/ctl_ce_results.txt'"

# ---- 4. curve artifacts
for tag in main ctl_ce ctl_lr ctl_unet; do
  [ -f "$OUT/${tag}_results.txt" ] && python tools/train_curves.py "$OUT/${tag}_results.txt" 2>>"$OUT/proof.log" || true
done

echo done > "$OUT/DONE"
log "PROOF FINISHER DONE"
