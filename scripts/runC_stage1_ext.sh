#!/bin/bash
# Run C-lite: extend the gate-passing run-B stage-1 checkpoint (epoch 200,
# n_samples 64) by EPOCHS_EXT epochs at n_samples 128 + full-res supervision,
# then re-run the stage-1 volume eval — measures whether sample-count-driven
# geometry sharpness moves the 27.60 dB stage-1 eval (the error-decomposition
# diagnostic attributes 63.5% of remaining MSE to the silhouette band).
# Usage: setsid bash scripts/runC_stage1_ext.sh [target_epoch=220]
set -e
cd "$(dirname "$0")/.."
TARGET=${1:-220}
EXP=tubeman_e2eC
LIVE=results/tubeman_e2eB/live

mkdir -p data/trained_model/deform/$EXP data/record/deform/$EXP
cp $LIVE/stage1_latest.npz data/trained_model/deform/$EXP/latest.npz
cp $LIVE/stage1_scalars.jsonl data/record/deform/$EXP/scalars.jsonl

python train.py -c configs/synthetic/tubeman.yaml exp_name $EXP resume True \
  train.epoch $TARGET train.scheduler.decay_epochs $TARGET \
  n_samples 128 ratio 1.0 eval_ep 999 save_ep 5
python run.py -t evaluate -c configs/synthetic/tubeman.yaml exp_name $EXP
mkdir -p results/$EXP
cp -r data/result/deform/$EXP/metrics.npy results/$EXP/ 2>/dev/null || true
python - <<'EOF'
import numpy as np, json, os
m = np.load('data/result/deform/tubeman_e2eC/metrics.npy', allow_pickle=True).item()
out = {k: float(np.mean(v)) for k, v in m.items() if k != 'frames'}
json.dump(out, open('results/tubeman_e2eC/eval1_summary.json', 'w'), indent=2)
print('[runC] stage-1 eval:', out)
EOF
