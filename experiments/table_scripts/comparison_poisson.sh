#!/bin/bash
# Reference: table_scripts/comparison_poisson.sh (TOL=1e-4, ETA=1e-6)
set -e
cd "$(dirname "$0")/.."
export TOL=1e-4
export ETA=1e-6
python comparisons.py --label noef_poisson_all --poisson --sig06 --direct --cg --tolerance $TOL --tau $ETA "$@"
python comparisons.py --label noef_poisson_pointcloud --poisson --pointcloud --nested --sig06 --direct --cg --tolerance $TOL --tau $ETA "$@"
