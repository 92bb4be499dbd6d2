#!/bin/bash
# Run G: stage-2 relight re-train on the ep-320 geometry WITH the new
# traced-surface silhouette BCE (silh_loss_weight 0.01; QUALITY_DIAGNOSIS.md
# unlock #2, VERDICT r4 item 1b).  Clones run F's stage-1 artifacts into a
# fresh experiment so run F's stage-2 checkpoint/eval stay untouched, then
# drives the standard two-stage harness with only stage 2 active.
#
# Usage: setsid bash scripts/runG_silh.sh
set -e
cd "$(dirname "$0")/.."
SRC=tubeman_e2eC EXP=tubeman_e2eG

mkdir -p data/trained_model/deform/$EXP data/record/deform/$EXP \
         data/animation/deform/$EXP data/result/deform/$EXP
cp data/trained_model/deform/$SRC/latest.npz data/trained_model/deform/$EXP/
cp data/record/deform/$SRC/scalars.jsonl data/record/deform/$EXP/ 2>/dev/null || true
cp data/animation/deform/$SRC/can_mesh.npz data/animation/deform/$EXP/
cp data/result/deform/$SRC/metrics.npy data/result/deform/$EXP/ 2>/dev/null || true

exec python scripts/train_e2e.py --exp $EXP --skip-stage1 --skip-eval1 \
    --skip-mesh --fresh-stage2 --epochs1 320 --epochs2 40 --n-samples 128 \
    --ratio 1.0 --extra silh_loss_weight 0.01
