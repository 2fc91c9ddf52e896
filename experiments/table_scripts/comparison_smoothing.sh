#!/bin/bash
# Reference: table_scripts/comparison_smoothing.sh (TOL=1e-4, ALPHA=1e-3)
set -e
cd "$(dirname "$0")/.."
export TOL=1e-4
export ALPHA=1e-3
python comparisons.py --label noef_smoothing_all --sig06 --direct --cg --tolerance $TOL --tau $ALPHA "$@"
python comparisons.py --label noef_smoothing_pointcloud --pointcloud --nested --sig06 --direct --cg --tolerance $TOL --tau $ALPHA "$@"
