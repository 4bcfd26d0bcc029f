#!/bin/bash
# Round-3 XLA-flags probe for the EGM inference headline.
#
# PERF.md's round-2 conclusion was "deeper fusion is the only way past the
# op-by-op roofline floor (646 img/s), and Mosaic is not the tool".  XLA
# itself has one user-visible knob that directly widens fusion depth on
# TPU: the scoped-VMEM budget the fusion cost model is allowed to assume
# (--xla_tpu_scoped_vmem_limit_kib).  This script measures the headline
# bench under several settings, one process per setting (XLA_FLAGS must be
# fixed before backend init).  Unknown-flag configs fail fast with a
# nonzero rc and are recorded as such — the probe is expected to be partly
# exploratory on this toolchain (remote axon compiler may ignore or reject
# client flags).
set -u
OUT=${1:-/root/repo/runs/r03_master/xla_flags}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p "$OUT"
log() { echo "[flags] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/probe.log"; }

declare -A CONFIGS=(
  [control]=""
  [vmem64m]="--xla_tpu_scoped_vmem_limit_kib=65536"
  [vmem96m]="--xla_tpu_scoped_vmem_limit_kib=98304"
  [vmem32m]="--xla_tpu_scoped_vmem_limit_kib=32768"
  [no_lhs]="--xla_tpu_enable_latency_hiding_scheduler=false"
  [flash_vmem]="--xla_tpu_scoped_vmem_limit_kib=65536 --xla_tpu_enable_latency_hiding_scheduler=false"
)
# deterministic order: control first so the session has a same-day anchor
for name in control vmem64m vmem96m vmem32m no_lhs flash_vmem; do
  flags="${CONFIGS[$name]}"
  log "config $name: XLA_FLAGS='$flags'"
  XLA_FLAGS="$flags" timeout 2400 python -u bench.py --mode inference \
      --batches 128 > "$OUT/$name.log" 2>&1
  rc=$?
  line=$(grep -h '"metric"' "$OUT/$name.log" | tail -1)
  log "config $name rc=$rc ${line:-<no JSON>}"
done
log "flags probe done"
