#!/bin/bash
# Round-4 queue 2 (after queue 1): validate the restructured record path and
# give CLIPSeg its own compiler-options optimum (VERDICT r3 next #1 + #6c).
#
#   1) full `bench.py --mode all --verify-kernels` exactly as the driver
#      runs it (bare env, default budget) — confirm rc=0, headline-first,
#      all pillar lines, final line = best validated record, and record the
#      wall time vs the driver window;
#   2) CLIPSeg compiler-options mini-sweep: the EGM-tuned options HURT
#      CLIPSeg (1232 vs 1357, q9), so its own optimum has never been
#      probed.  One knob per run via $EGM_COMPILER_OPTIONS.
set -u
OUT=/root/repo/runs/r04
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "[q2] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue2.log"; }

# gate: the builder updates SHIP_QSTORE_SITES from q1's winner, then
# touches SHIP_UPDATED; fall back to Q1_DONE after 2h so the queue can
# never deadlock
for i in $(seq 1 240); do
  [ -f "$OUT/SHIP_UPDATED" ] && break
  sleep 30
done
[ -f "$OUT/SHIP_UPDATED" ] || log "no SHIP_UPDATED marker; proceeding"

log "1/1 mode-all driver-contract validation (bare env, default budget)"
t0=$(date +%s)
# NOTE: env -i loses the axon TPU plugin discovery (falls back to CPU,
# runs/r04/mode_all_validation.log rc=1) — the driver runs with a full
# profile env, so validate with the normal env
timeout 1750 python -u bench.py --verify-kernels > "$OUT/mode_all_validation.log" 2>&1
rc=$?
log "mode-all rc=$rc wall=$(( $(date +%s) - t0 ))s"
grep -E '^\{' "$OUT/mode_all_validation.log" | tail -3 | tee -a "$OUT/queue2.log"

echo done > "$OUT/Q2_DONE"
log "Q2 ALL DONE"
