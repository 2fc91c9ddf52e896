#!/bin/bash
# Reference: table_scripts/ablations_sampling.sh
set -e
cd "$(dirname "$0")/.."
export TOL=1e-4
python comparisons.py --label ablation_sampling_baseline --nosig21 --tolerance $TOL "$@"
python comparisons.py --label ablation_sampling_random --nosig21 --tolerance $TOL --no_names --sampling random "$@"
python comparisons.py --label ablation_sampling_pds --nosig21 --tolerance $TOL --no_names --sampling poissondisk "$@"
python comparisons.py --label ablation_sampling_mis --nosig21 --tolerance $TOL --no_names --sampling mis "$@"
python comparisons.py --label ablation_sampling_fps --nosig21 --tolerance $TOL --no_names --sampling fps "$@"
