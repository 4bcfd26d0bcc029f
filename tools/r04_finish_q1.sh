#!/bin/bash
# Round-4: manual finisher for queue 1 (saves ~40 min of redundant configs:
# the scripted union would re-measure the pools config when dec/dec_split/
# enc lose, and the single-site fusion config is cut for session time).
# Usage: tools/r04_finish_q1.sh <q1-bash-pid>
set -u
OUT=/root/repo/runs/r04
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q1fin] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue1.log"; }

kill_tree() {  # explicit-PID tree kill (never pattern-based)
  local pid=$1
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do kill_tree "$c"; done
  kill "$pid" 2>/dev/null
}
if [ -n "${1:-}" ]; then
  log "killing q1 tree at pid $1"
  kill_tree "$1"
  sleep 3
fi

val() { grep -h '"value"' "$1" 2>/dev/null | sed 's/.*"value": \([0-9.]*\).*/\1/' | tail -1; }

BASE="mca:,egrfb:"
declare -A SITES=(
  [base]="$BASE"
  [pools]="$BASE,:pool"
  [dec]="$BASE,up1/,up2/,up3/,up4/"
  [dec_split]="$BASE,up1/,up2/,up3/,up4/"
  [enc]="$BASE,down1/conv,down2/conv,down3/conv,down4/conv"
)
declare -A SPLIT=([base]=0 [pools]=0 [dec]=0 [dec_split]=1 [enc]=0)

best_tag=base; best_v=532.0
for t in pools dec dec_split enc; do
  v=$(val "$OUT/int8df_${t}.log"); v=${v:-0}
  if python -c "import sys; sys.exit(0 if float('$v') > float('$best_v') else 1)"; then
    best_v=$v; best_tag=$t
  fi
done
best_sites=${SITES[$best_tag]}; best_split=${SPLIT[$best_tag]}

# if BOTH pools and enc beat base, the union is a new unmeasured config
PV=$(val "$OUT/int8df_pools.log"); EV=$(val "$OUT/int8df_enc.log")
if python -c "import sys; sys.exit(0 if float('${PV:-0}') > 532.0 and float('${EV:-0}') > 532.0 else 1)"; then
  UNION="$BASE,:pool,down1/conv,down2/conv,down3/conv,down4/conv"
  log "pools AND enc beat base; measuring union"
  EGM_QSTORE_SITES="$UNION" EGM_UP_SPLIT=0 timeout 2100 \
      python -u bench.py --mode int8df --headline-batches 128 --no-agreement \
      > "$OUT/int8df_union.log" 2>&1
  UV=$(val "$OUT/int8df_union.log")
  log "union rc=$? value=${UV:-none}"
  if python -c "import sys; sys.exit(0 if float('${UV:-0}') > float('$best_v') else 1)"; then
    best_v=$UV; best_tag=union; best_sites="$UNION"; best_split=0
  fi
fi

log "best: $best_tag $best_v img/s sites='$best_sites' split=$best_split; agreement run"
EGM_QSTORE_SITES="$best_sites" EGM_UP_SPLIT="$best_split" timeout 2400 \
    python -u bench.py --mode int8df --headline-batches 128 \
    > "$OUT/int8df_best_agree.log" 2>&1
log "agreement rc=$?"
grep -E '"metric"|agreement' "$OUT/int8df_best_agree.log" | tail -2 | tee -a "$OUT/queue1.log"
echo "$best_sites" > "$OUT/int8df_best_sites.txt"
echo "$best_split" > "$OUT/int8df_best_split.txt"

echo done > "$OUT/Q1_DONE"
log "Q1 FINISHED (manual finisher)"
