#!/bin/bash
# Round-5 equal-budget control (VERDICT r4 next #7): extend ctl_unet —
# vanilla UNet, reference recipe, SAME hard synthetic task/transforms/eval
# as the r04 200-epoch main run — from its r04 checkpoint (18 epochs) as
# far as the wall allows, so the EGM-vs-UNet plateau comparison is
# apples-to-apples per-epoch (main's per-epoch curve already exists in
# runs/r04_proof/main_results.txt).
#
# Usage: tools/r05_ctl_unet.sh <deadline-HH:MM-UTC> [outdir]
# The chip MUST be free before the driver's end-of-round bench: the train
# process is timeout-bounded to the deadline and killed by pid, never by
# pattern.
set -u
DEADLINE_HHMM=${1:-04:55}
OUT=${2:-/root/repo/runs/r05_ctl}
R04=/root/repo/runs/r04_proof
mkdir -p "$OUT"
DEADLINE=$(date -u -d "$DEADLINE_HHMM" +%s)
now=$(date +%s)
# if the deadline time already passed today, it means tomorrow — guard
[ "$DEADLINE" -le "$now" ] && DEADLINE=$(( DEADLINE + 86400 ))
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "[r05ctl] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/ctl.log"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
epochs_done() { grep -c "^\[epoch:" "$1" 2>/dev/null || echo 0; }

# continue the r04 results file in place (the resume machinery appends)
for f in ctl_unet_results.txt; do
  [ -f "$OUT/$f" ] || cp "$R04/$f" "$OUT/$f" 2>/dev/null || true
done
cp -r "$R04/ctl_unet_ckpt" "$OUT/" 2>/dev/null || true

COMMON="'--synthetic', '--synthetic-hard', '--synthetic-n', '876',
        '--synthetic-val-n', '52', '--synthetic-size', '480',
        '--eval-size', '565', '--val-batch-size', '4',
        '--base-c', '32', '--batch-size', '8', '--amp',
        '--steps-per-dispatch', '10', '--wire-uint8', '--print-freq', '50'"
CTL="'--model', 'unet', '--epochs', '200', '--lr', '0.02',
     '--save-every', '10', '--save-dir', '$OUT/ctl_unet_ckpt',
     '--results-file', '$OUT/ctl_unet_results.txt'"

# one resume loop: each invocation continues from the latest checkpoint;
# a mid-run kill just becomes another resume demonstration
while true; do
  n=$(epochs_done "$OUT/ctl_unet_results.txt")
  l=$(left)
  if [ "$n" -ge 200 ] || [ "$l" -lt 900 ]; then
    log "stop: epochs=$n left=${l}s"
    break
  fi
  to=$(( l - 300 )); [ "$to" -gt 9000 ] && to=9000
  log "resume from $n epochs (timeout ${to}s)"
  timeout "$to" python -u -c "
from egm_unet_tpu.cli.train import main
main([$COMMON, $CTL, '--resume', '$OUT/ctl_unet_ckpt'])
" >> "$OUT/ctl_unet_log.txt" 2>&1 &
  echo $! > /tmp/r05_ctl_train.pid
  wait $!
  log "invocation rc=$?; epochs now $(epochs_done "$OUT/ctl_unet_results.txt")"
done

# curve artifacts
python tools/train_curves.py "$OUT/ctl_unet_results.txt" 2>> "$OUT/ctl.log" || true
log "DONE epochs=$(epochs_done "$OUT/ctl_unet_results.txt")"
touch "$OUT/DONE"
