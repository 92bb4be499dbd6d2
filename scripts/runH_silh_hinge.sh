#!/bin/bash
# Run H: stage-2 relight re-train on the ep-320 geometry with the HINGED
# silhouette loss at the closest-approach point (silh_mode hinge, the
# default).  Run G measured the BCE form at -5.2 dB (constant outward
# pressure on correctly-hit rays + gradient at the punched-through far
# point); the hinge has a deadband — zero loss/gradient for correctly
# classified rays beyond the margin — and acts at the closest-approach
# point, so only misclassified silhouette rays feel it.
#
# Usage: setsid bash scripts/runH_silh_hinge.sh
set -e
cd "$(dirname "$0")/.."
SRC=tubeman_e2eC EXP=tubeman_e2eH

mkdir -p data/trained_model/deform/$EXP data/record/deform/$EXP \
         data/animation/deform/$EXP data/result/deform/$EXP
cp data/trained_model/deform/$SRC/latest.npz data/trained_model/deform/$EXP/
cp data/record/deform/$SRC/scalars.jsonl data/record/deform/$EXP/ 2>/dev/null || true
cp data/animation/deform/$SRC/can_mesh.npz data/animation/deform/$EXP/
cp data/result/deform/$SRC/metrics.npy data/result/deform/$EXP/ 2>/dev/null || true

exec python scripts/train_e2e.py --exp $EXP --skip-stage1 --skip-eval1 \
    --skip-mesh --fresh-stage2 --epochs1 320 --epochs2 40 --n-samples 128 \
    --ratio 1.0 --extra silh_loss_weight 0.01 silh_mode hinge
