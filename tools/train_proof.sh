#!/bin/bash
# Round-3 on-chip training proof (VERDICT r2 "Next round" #2):
# drive cli/train.py through the reference recipe shape end to end on the
# TPU with the procedural TP-like synthetic dataset (the real TP-Dataset is
# Baidu-pan gated, ref: dataset/readme.txt), committing the reference-format
# results-txt artifacts + per-epoch dice curves.
#
#  run 1: the reference recipe — bs 8, 480^2 crops, 200 epochs, SGD
#         lr 0.02 warmup-poly (ref: train.py:115-118,135-164), bf16 compute,
#         876 train / 52 val images mirroring the TP-928 split.
#  run 2: the large-batch TPU recipe — bs 64 + stage remat, lr linearly
#         scaled 0.02 * (64/8) = 0.16 (Goyal et al. linear scaling rule),
#         same data and epoch budget, to show the curves track.
#
# Usage: tools/train_proof.sh [epochs] [outdir]
set -u
EPOCHS=${1:-200}
OUT=${2:-/root/repo/runs/r03_train_proof}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p "$OUT"

echo "[train_proof] run 1: reference recipe bs8 480px ${EPOCHS}ep"
timeout 15000 python -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '8',
      '--epochs', '$EPOCHS', '--lr', '0.02', '--amp',
      '--steps-per-dispatch', '10', '--wire-uint8',
      '--print-freq', '50',
      '--save-dir', '$OUT/bs8_ckpt',
      '--results-file', '$OUT/bs8_results.txt'])
" > "$OUT/bs8_log.txt" 2>&1
echo "[train_proof] run 1 rc=$?"

echo "[train_proof] run 2: large-batch bs64+remat lr0.16 ${EPOCHS}ep"
timeout 15000 python -c "
from egm_unet_tpu.cli.train import main
main(['--synthetic', '--synthetic-n', '876', '--synthetic-val-n', '52',
      '--synthetic-size', '480', '--eval-size', '565', '--val-batch-size', '4',
      '--model', 'egm_unet', '--base-c', '32', '--batch-size', '64',
      '--epochs', '$EPOCHS', '--lr', '0.16', '--amp', '--remat',
      '--steps-per-dispatch', '10', '--wire-uint8',
      '--print-freq', '10',
      '--save-dir', '$OUT/bs64_ckpt',
      '--results-file', '$OUT/bs64_results.txt'])
" > "$OUT/bs64_log.txt" 2>&1
echo "[train_proof] run 2 rc=$?"
echo "[train_proof] done" > "$OUT/DONE"
