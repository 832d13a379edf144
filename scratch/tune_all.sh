#!/bin/bash
# Tuning matrix for the packed sweep (run: nohup bash scratch/tune_all.sh
# > /tmp/tune_all.log 2>&1 &). Each case is a fresh process (the filter
# precision is read at import).
cd "$(dirname "$0")/.."
run() { echo "=== $*"; env "$@" python -u scratch/tune_case.py; }

run CASE_BACKEND=hybrid
run CASE_BINV=4 PL_FEM_FILTER_PRECISION=highest
run CASE_BINV=2 PL_FEM_FILTER_PRECISION=highest
run CASE_BINV=1 PL_FEM_FILTER_PRECISION=highest
run CASE_BINV=2 PL_FEM_FILTER_PRECISION=high
run CASE_BINV=2 CASE_DEGREE=200 PL_FEM_FILTER_PRECISION=high
run CASE_BINV=2 CASE_DEGREE=200 PL_FEM_FILTER_PRECISION=highest
echo ALLDONE
