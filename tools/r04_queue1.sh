#!/bin/bash
# Round-4 queue 1: finish the int8df campaign (VERDICT r3 "Next round" #2+#6).
#
# q21 measured the selective wave's base config (mca:,egrfb: -> 531.6 img/s,
# --no-agreement) but the session died before barrier_plus_pools, the greedy
# additions (q22) and the mask-agreement stat.  This queue re-runs the whole
# campaign with PATH-ANCHORED selectors (ADVICE r3: 'conv1:out' also matched
# the decoder Up blocks; 'down1/conv' etc. cannot):
#
#   base       mca:,egrfb:                      (q21: 531.6)
#   +pools     base + :pool                     (the lost q21 measurement)
#   +dec       base + up1/..up4/                (decoder ConvBNReLU outputs)
#   +dec+split base + decoder sites + EGM_UP_SPLIT=1 (no concat tensor stored:
#              the two partial convs read int8 operands directly)
#   +enc       base + down{1..4}/conv           (encoder conv outs, anchored)
#   +fusion    base + fusion:out                (EGRFB FusionConv output)
#   union      base + every addition that beat base
#   agreement  full bench (mask agreement vs bf16) at the overall best
set -u
OUT=/root/repo/runs/r04
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
log() { echo "[q1] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/queue1.log"; }

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

val() { grep -h '"value"' "$1" 2>/dev/null | sed 's/.*"value": \([0-9.]*\).*/\1/' | tail -1; }

run_cfg() {  # run_cfg <tag> <sites> [SPLIT]
  local tag=$1 sites=$2 split=${3:-0}
  log "int8df tag=$tag sites='$sites' split=$split"
  EGM_QSTORE_SITES="$sites" EGM_UP_SPLIT="$split" timeout 2100 \
      python -u bench.py --mode int8df --headline-batches 128 --no-agreement \
      > "$OUT/int8df_${tag}.log" 2>&1
  log "tag=$tag rc=$? value=$(val "$OUT/int8df_${tag}.log")"
}

wait_healthy || exit 1

BASE="mca:,egrfb:"
DEC="up1/,up2/,up3/,up4/"
ENC="down1/conv,down2/conv,down3/conv,down4/conv"

run_cfg pools     "$BASE,:pool"
run_cfg dec       "$BASE,$DEC"
run_cfg dec_split "$BASE,$DEC" 1
run_cfg enc       "$BASE,$ENC"
run_cfg fusion    "$BASE,fusion:out"

BV=$(val "$OUT/int8df_base.log"); BV=${BV:-532.0}
log "base=$BV; composing union of winners"
UNION="$BASE"; SPLIT=0
beats() { python -c "import sys; sys.exit(0 if float('${1:-0}') > float('$BV') else 1)"; }
beats "$(val "$OUT/int8df_pools.log")"  && UNION="$UNION,:pool"
DV=$(val "$OUT/int8df_dec.log"); DSV=$(val "$OUT/int8df_dec_split.log")
if beats "$DSV" && python -c "import sys; sys.exit(0 if float('${DSV:-0}') >= float('${DV:-0}') else 1)"; then
  UNION="$UNION,$DEC"; SPLIT=1
elif beats "$DV"; then
  UNION="$UNION,$DEC"
fi
beats "$(val "$OUT/int8df_enc.log")"    && UNION="$UNION,$ENC"
beats "$(val "$OUT/int8df_fusion.log")" && UNION="$UNION,fusion:out"

if [ "$UNION" != "$BASE" ]; then
  run_cfg union "$UNION" "$SPLIT"
fi

# overall best config -> full bench with the mask-agreement stat
best_tag=base; best_v=$BV; best_sites="$BASE"; best_split=0
for t in pools dec dec_split enc fusion union; do
  v=$(val "$OUT/int8df_${t}.log"); v=${v:-0}
  if python -c "import sys; sys.exit(0 if float('$v') > float('$best_v') else 1)"; then
    best_v=$v; best_tag=$t
    case $t in
      pools)     best_sites="$BASE,:pool"; best_split=0;;
      dec)       best_sites="$BASE,$DEC"; best_split=0;;
      dec_split) best_sites="$BASE,$DEC"; best_split=1;;
      enc)       best_sites="$BASE,$ENC"; best_split=0;;
      fusion)    best_sites="$BASE,fusion:out"; best_split=0;;
      union)     best_sites="$UNION"; best_split=$SPLIT;;
    esac
  fi
done
log "best: $best_tag $best_v img/s sites='$best_sites' split=$best_split; agreement run"
EGM_QSTORE_SITES="$best_sites" EGM_UP_SPLIT="$best_split" timeout 2400 \
    python -u bench.py --mode int8df --headline-batches 128 \
    > "$OUT/int8df_best_agree.log" 2>&1
log "agreement rc=$?"
grep -E '"metric"|agreement' "$OUT/int8df_best_agree.log" | tail -2 | tee -a "$OUT/queue1.log"
echo "$best_sites" > "$OUT/int8df_best_sites.txt"
echo "$best_split" > "$OUT/int8df_best_split.txt"

echo done > "$OUT/Q1_DONE"
log "Q1 ALL DONE"
