#!/bin/bash
# Reference: table_scripts/convergence_plots.sh (TOL=1e-12 — needs f64; small meshes)
set -e
cd "$(dirname "$0")/.."
export TOL=1e-10
export ALPHA=1e-3
python comparisons.py --label convergence_smoothing --sig06 --tolerance $TOL --tau $ALPHA "$@"
