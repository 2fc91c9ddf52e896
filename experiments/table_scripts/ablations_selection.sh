#!/bin/bash
# Reference: table_scripts/ablations_selection.sh
set -e
cd "$(dirname "$0")/.."
export TOL=1e-4
export TAU=1e-3
python comparisons.py --label ablation_selection_baseline --nosig21 --tau $TAU --tolerance $TOL "$@"
python comparisons.py --label ablation_selection_2closest --nosig21 --tau $TAU --tolerance $TOL --ablation --ablation_n 2 "$@"
python comparisons.py --label ablation_selection_3closest --nosig21 --tau $TAU --tolerance $TOL --ablation --ablation_n 3 "$@"
python comparisons.py --label ablation_selection_3random --nosig21 --tau $TAU --tolerance $TOL --ablation --ablation_n 3 --ablation_random "$@"
python comparisons.py --label ablation_selection_4closest --nosig21 --tau $TAU --tolerance $TOL --ablation --ablation_n 4 "$@"
python comparisons.py --label ablation_selection_alltri --nested --nosig21 --tau $TAU --tolerance $TOL --all_triangles "$@"
