#!/bin/bash
# Reference: table_scripts/convergence_plots.sh — iterate to TOL=1e-12.
# The tight tolerance needs the end-to-end f64 solve path (--f64): the
# f32 smoother/residual floor is ~1e-6 relative.
set -e
cd "$(dirname "$0")/.."
export TOL=1e-12
export ALPHA=1e-3
python comparisons.py --label convergence_smoothing --sig06 --f64 --tolerance $TOL --tau $ALPHA "$@"
