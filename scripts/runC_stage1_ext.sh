#!/bin/bash
# Run C-lite: extend the gate-passing run-B stage-1 checkpoint (epoch 200,
# n_samples 64) by EPOCHS_EXT epochs at n_samples 128 + full-res supervision,
# then re-run the stage-1 volume eval — measures whether sample-count-driven
# geometry sharpness moves the 27.60 dB stage-1 eval (the error-decomposition
# diagnostic attributes 63.5% of remaining MSE to the silhouette band).
#
# Usage: setsid bash scripts/runC_stage1_ext.sh [target_epoch=220]
# (setsid + the exec below make the python driver the process-group leader,
# so register_training_group accepts it and bench.py/__graft_entry__ can
# preempt the run instead of deadlocking the single-client axon tunnel.)
set -e
cd "$(dirname "$0")/.."
TARGET=${1:-220} EXP=tubeman_e2eC LIVE=results/tubeman_e2eB/live

mkdir -p data/trained_model/deform/$EXP data/record/deform/$EXP
cp $LIVE/stage1_latest.npz data/trained_model/deform/$EXP/latest.npz
cp $LIVE/stage1_scalars.jsonl data/record/deform/$EXP/scalars.jsonl

export RUNC_TARGET=$TARGET RUNC_EXP=$EXP
exec python - <<'EOF'
import json
import os
import subprocess
import sys

sys.path.insert(0, '.')
from relightableavatar_tpu.utils.preempt import register_training_group
register_training_group()

target, exp = os.environ['RUNC_TARGET'], os.environ['RUNC_EXP']
cfg = 'configs/synthetic/tubeman.yaml'
subprocess.run([sys.executable, 'train.py', '-c', cfg, 'exp_name', exp,
                'resume', 'True', 'train.epoch', target,
                'train.scheduler.decay_epochs', target, 'n_samples', '128',
                'ratio', '1.0', 'eval_ep', '999', 'save_ep', '5'],
               check=True)
subprocess.run([sys.executable, 'run.py', '-t', 'evaluate', '-c', cfg,
                'exp_name', exp], check=True)

import numpy as np
m = np.load(f'data/result/deform/{exp}/metrics.npy', allow_pickle=True).item()
out = {k: float(np.mean(v)) for k, v in m.items() if k != 'frames'}
os.makedirs(f'results/{exp}', exist_ok=True)
json.dump(out, open(f'results/{exp}/eval1_summary.json', 'w'), indent=2)
print('[runC] stage-1 eval:', out)
EOF
