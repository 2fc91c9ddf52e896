#!/bin/bash
# Reference: table_scripts/ablations_weighting.sh
set -e
cd "$(dirname "$0")/.."
export TOL=1e-4
export TAU=1e-3
python comparisons.py --label ablation_weighting_baseline --nosig21 --tau $TAU --tolerance $TOL "$@"
python comparisons.py --label ablation_weighting_uniform --nosig21 --tau $TAU --tolerance $TOL --no_names --weighting uniform "$@"
python comparisons.py --label ablation_weighting_invdist --nosig21 --tau $TAU --tolerance $TOL --no_names --weighting invdist "$@"
python comparisons.py --label ablation_weighting_nested --nosig21 --tau $TAU --tolerance $TOL --no_names --nested "$@"
