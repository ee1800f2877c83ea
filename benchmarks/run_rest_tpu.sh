#!/bin/bash
# Remaining campaign stages (kernel_bench + sweep_ncol already done),
# plus the merge re-run of new kernel entries and the geometry tune.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_campaign}
mkdir -p "$LOG" benchmarks/results

run() {
  name=$1; tmo=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -3 "$LOG/$name.log"
  echo "== $name rc=$rc =="
}

run sweep_block 5400 python benchmarks/sweep_lanczos.py --block \
  --csv benchmarks/results/file_BL.csv
run sweep_vector 5400 python benchmarks/sweep_lanczos.py --vector \
  --csv benchmarks/results/file_VL.csv
run suitesparse 4000 python benchmarks/suitesparse_scale.py --dist
run kb_merge 4000 python benchmarks/kernel_bench.py \
  --only sqrtm_newton,spmm_stencil_bf16,copy_bw,spmm_windowed,spmm_bsr \
  --json benchmarks/results/kernels.json --merge
run tune_windowed 2400 python benchmarks/tune_windowed.py \
  --json benchmarks/results/tune_windowed.json
run convergence 2000 python benchmarks/convergence.py
run plots 1200 python benchmarks/plots.py

echo "rest-campaign done; logs in $LOG"
