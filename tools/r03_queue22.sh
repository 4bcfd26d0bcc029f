#!/bin/bash
# Round-3 queue 22: int8df greedy site additions (justified: the q21
# selective wave beat the 519.2 bf16 headline — barrier sites 531.6 img/s).
# Waits for Q21_DONE, picks the better of {barrier-sites, barrier+pools} as
# the base, then measures one-site-group additions on top.
set -u
OUT=/root/repo/runs/r03_master
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q22] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue22.log"; }

for i in $(seq 1 240); do
  [ -f "$OUT/Q21_DONE" ] && break
  sleep 60
done
[ -f "$OUT/Q21_DONE" ] || { log "q21 never finished; aborting"; exit 1; }

val() { grep -h '"value"' "$1" 2>/dev/null | sed 's/.*"value": \([0-9.]*\).*/\1/' | tail -1; }
BS=$(val "$OUT/int8df_barrier_sites_q21.log"); BS=${BS:-0}
BPP=$(val "$OUT/int8df_barrier_plus_pools_q21.log"); BPP=${BPP:-0}
if python -c "import sys; sys.exit(0 if float('$BPP') >= float('$BS') else 1)"; then
  BASE="mca:,egrfb:,:pool"; BASEV=$BPP
else
  BASE="mca:,egrfb:"; BASEV=$BS
fi
log "base=$BASE ($BASEV img/s)"

run_int8df() {  # run_int8df <tag> <sites>
  log "int8df sites=$2"
  EGM_QSTORE_SITES="$2" timeout 1500 python -u bench.py --mode int8df \
      --headline-batches 128 --no-agreement > "$OUT/int8df_$1_q22.log" 2>&1
  log "rc=$?"
  grep -E '"metric"' "$OUT/int8df_$1_q22.log" | tail -1 | tee -a "$OUT/queue22.log"
}

run_int8df w_fusion "$BASE,fusion:out"
run_int8df w_encconv "$BASE,conv1:out,conv2:out"

# agreement stat at the overall best config
best_tag=""; best_v=$BASEV; best_sites=$BASE
for t in w_fusion w_encconv; do
  v=$(val "$OUT/int8df_${t}_q22.log"); v=${v:-0}
  if python -c "import sys; sys.exit(0 if float('$v') > float('$best_v') else 1)"; then
    best_v=$v; best_tag=$t
    case $t in
      w_fusion) best_sites="$BASE,fusion:out";;
      w_encconv) best_sites="$BASE,conv1:out,conv2:out";;
    esac
  fi
done
log "best int8df config: sites=$best_sites ($best_v img/s); agreement run"
EGM_QSTORE_SITES="$best_sites" timeout 1800 python -u bench.py --mode int8df \
    --headline-batches 128 > "$OUT/int8df_best_agree_q22.log" 2>&1
log "rc=$?"
grep -E '"metric"|agreement' "$OUT/int8df_best_agree_q22.log" | tail -2 | tee -a "$OUT/queue22.log"
echo "$best_sites" > "$OUT/int8df_best_sites.txt"

echo done > "$OUT/Q22_DONE"
log "Q22 ALL DONE"
