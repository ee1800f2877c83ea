#!/bin/bash
# Full TPU measurement campaign: refreshes every published artifact in
# benchmarks/results/ on the real chip.  Each stage is independently
# timed out and logged; a failure does not stop later stages.
# Usage: bash benchmarks/run_all_tpu.sh [logdir]
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

# 1. per-kernel microbenches -> kernels.json (ALL entries, incl. the
#    copy-bandwidth roofline, windowed/BSR SpMM and both sqrtm backends)
run kernel_bench 4000 python benchmarks/kernel_bench.py \
  --json benchmarks/results/kernels.json --merge

# 2. whole-algorithm N_COL sweep 2..18 + single-vector baseline ->
#    per-vector speedup panel data (lanczos_plots.m:141-150 parity)
run sweep_ncol 9000 python benchmarks/sweep_lanczos.py --sweep-ncol \
  --csv benchmarks/results/file_BL_ncol.csv

# 2b. same sweep over the ASSEMBLED windowed-ELL operator (p in {8,16}) —
#     the reference's matrix-amortization regime
run sweep_ncol_win 5000 python benchmarks/sweep_lanczos.py --sweep-ncol \
  --operator windowed --csv benchmarks/results/file_BL_ncol_windowed.csv

# 3. problem-size sweeps (block p=4 and single-vector), escalating-m2
#    protocol: no 1e-09 noise sentinels
run sweep_block 6000 python benchmarks/sweep_lanczos.py --block \
  --factor 1.6 --csv benchmarks/results/file_BL.csv
run sweep_vector 6000 python benchmarks/sweep_lanczos.py --vector \
  --csv benchmarks/results/file_VL.csv

# 4. north-star configs 4-5: 10.5M-row assembled matrix end-to-end
#    (native planner; periodic-reorth block Lanczos; dist path on 1 dev)
run suitesparse 4000 python benchmarks/suitesparse_scale.py --dist

# 5. convergence-vs-m parity curve (lanczos_plots.m:168-169)
if [ -f benchmarks/convergence.py ]; then
  run convergence 2000 python benchmarks/convergence.py
fi

# 6. re-render every plot panel from the fresh artifacts
run plots 1200 python benchmarks/plots.py

echo "campaign done; logs in $LOG"
